"""Packed item attention (interpret mode) == XLA attention, exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from unirec_tpu.ops.attention import attention, make_additive_mask
from unirec_tpu.ops.packed_attention import packed_item_attention


@pytest.mark.parametrize("b,h,k,f,hd", [
    (6, 4, 32, 32, 64),   # self-attn shape (padded to P=4, 6 -> 8)
    (4, 2, 32, 14, 64),   # cross-attn: 14 fields
    (5, 2, 2, 14, 32),    # K=2 joint config -> 64 items per tile
])
def test_matches_xla(b, h, k, f, hd):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, k, hd).astype(np.float32))
    kk = jnp.asarray(rng.randn(b, h, f, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, f, hd).astype(np.float32))
    mask = (rng.rand(b, f) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    bias = make_additive_mask(jnp.asarray(mask))
    ref = attention(q, kk, v, bias)
    out = packed_item_attention(q, kk, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_no_bias_matches():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(4, 2, 32, 64).astype(np.float32))
    ref = attention(q, q, q)
    out = packed_item_attention(q, q, q, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_no_cross_item_leakage():
    """Changing item j's keys must not affect item i's output."""
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(4, 2, 32, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 2, 32, 64).astype(np.float32))
    o1 = packed_item_attention(q, k, k, interpret=True)
    k2 = k.at[1].set(1e3)
    o2 = packed_item_attention(q, k2, k2, interpret=True)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1[2]), np.asarray(o2[2]), atol=1e-5)
    assert np.abs(np.asarray(o1[1]) - np.asarray(o2[1])).max() > 1e-3


def test_all_masked_item_matches_xla():
    """An item with ZERO valid keys must attend uniformly over its OWN
    masked keys (the per-item XLA behavior), not leak onto other items
    packed in the same tile — and its output must not depend on batch
    composition."""
    rng = np.random.RandomState(3)
    b, h, k, f, hd = 4, 2, 32, 14, 64
    q = jnp.asarray(rng.randn(b, h, k, hd).astype(np.float32))
    kk = jnp.asarray(rng.randn(b, h, f, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, f, hd).astype(np.float32))
    mask = np.ones((b, f), np.float32)
    mask[1] = 0.0  # item 1: no valid fields
    bias = make_additive_mask(jnp.asarray(mask))
    ref = attention(q, kk, v, bias)
    out = packed_item_attention(q, kk, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # batch-composition independence: perturbing item 0's values must not
    # move item 1's output
    v2 = v.at[0].set(v[0] + 100.0)
    out2 = packed_item_attention(q, kk, v2, bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(out2[1]), atol=1e-5
    )


def test_invalid_query_count():
    q = jnp.zeros((2, 2, 33, 64))
    with pytest.raises(ValueError, match="divide 128"):
        packed_item_attention(q, q, q, interpret=True)
