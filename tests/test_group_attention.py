"""Unit tests for the lane-packed group-attention helpers.

`_group_items`/`_block_diag_bias`/`_group_attention` (added with the
round-7 kernel work, ops/fused_qformer_layer.py) are exercised end-to-end
by the fused-engine parity suites; these tests pin the trace-time helper
CONTRACTS directly so a future refactor can't silently change the packing
rules the kernels assume.
"""

import jax.numpy as jnp
import numpy as np

from unirec_tpu.ops.fused_qformer_layer import (
    _block_diag_bias,
    _group_items,
)

NEG = -1e9


def test_group_items_is_largest_divisor_within_lane_cap():
    for items in [1, 2, 3, 4, 5, 7, 8, 12, 16, 20, 60, 64, 128]:
        for kpi in [1, 3, 6, 8, 14, 32, 129, 200]:
            p = _group_items(items, kpi)
            # contract: p divides items, p >= 1
            assert p >= 1 and items % p == 0, (items, kpi, p)
            # contract: packed keys fit the 128-lane target unless even a
            # single item overflows it (then p == 1)
            assert p * kpi <= 128 or p == 1, (items, kpi, p)
            # contract: p is the LARGEST such divisor
            larger = [
                c
                for c in range(p + 1, items + 1)
                if items % c == 0 and c * kpi <= 128
            ]
            assert not larger, (items, kpi, p, larger)


def test_group_items_custom_target():
    assert _group_items(16, 8, target=64) == 8
    assert _group_items(16, 8, target=32) == 4
    assert _group_items(16, 8, target=8) == 1


def test_block_diag_bias_matches_naive():
    for n_q, n_kv, p in [(8, 6, 2), (32, 14, 4), (1, 1, 3)]:
        g_rows, g_keys = p * n_q, p * n_kv
        bias = np.asarray(_block_diag_bias(g_rows, g_keys, n_q, n_kv, NEG))
        assert bias.shape == (g_rows, g_keys)
        for r in range(g_rows):
            for c in range(g_keys):
                same_item = (r // n_q) == (c // n_kv)
                assert bias[r, c] == (0.0 if same_item else NEG), (
                    n_q, n_kv, p, r, c,
                )
        assert bias.dtype == np.float32


def test_block_diag_bias_is_additive_mask_semantics():
    # 0 on the diagonal blocks, NEG elsewhere — adding to scores then
    # softmaxing must zero cross-item attention exactly
    bias = _block_diag_bias(4, 4, 2, 2, NEG)
    s = jnp.zeros((4, 4)) + bias
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = np.asarray(p)
    np.testing.assert_allclose(p[0, 2:], 0.0, atol=1e-30)
    np.testing.assert_allclose(p[3, :2], 0.0, atol=1e-30)
    np.testing.assert_allclose(p[0, :2], 0.5, atol=1e-6)
