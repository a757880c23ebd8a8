"""Int8 catalog quantization + quantized retrieval correctness."""

import jax.numpy as jnp
import numpy as np

from unirec_tpu.ops.quantization import (
    dequantize_rows,
    quantize_rows,
    quantized_top_k,
    retrieve_top_k_int8,
)
from unirec_tpu.ops.ranking import top_k_items


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(50, 64).astype(np.float32))
    q, scales = quantize_rows(x)
    assert q.dtype == jnp.int8 and scales.shape == (50,)
    deq = dequantize_rows(q, scales)
    xn = np.asarray(x) / np.linalg.norm(x, axis=1, keepdims=True)
    err = np.abs(np.asarray(deq) - xn).max()
    assert err < 1.0 / 127.0  # one quantization step


def test_quantized_ranking_matches_fp32():
    rng = np.random.RandomState(1)
    users = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    catalog = jnp.asarray(rng.randn(400, 64).astype(np.float32))
    s_ref, i_ref = top_k_items(users, catalog, k=10)
    q, scales = quantize_rows(catalog)
    s_q, i_q = quantized_top_k(users, q, scales, k=10)
    # top-1 must agree; top-10 sets nearly identical
    np.testing.assert_array_equal(np.asarray(i_q[:, 0]), np.asarray(i_ref[:, 0]))
    overlap = np.mean(
        [
            len(set(np.asarray(i_q[u]).tolist())
                & set(np.asarray(i_ref[u]).tolist())) / 10.0
            for u in range(8)
        ]
    )
    assert overlap >= 0.9
    np.testing.assert_allclose(
        np.asarray(s_q), np.asarray(s_ref), atol=2e-2
    )


def test_pallas_int8_retrieval_interpret():
    rng = np.random.RandomState(2)
    users = jnp.asarray(rng.randn(10, 32).astype(np.float32))
    catalog = jnp.asarray(rng.randn(300, 32).astype(np.float32))
    q, scales = quantize_rows(catalog)
    s_ref, i_ref = quantized_top_k(users, q, scales, k=7)
    s_pl, i_pl = retrieve_top_k_int8(
        users, q, scales, k=7, block_u=8, block_n=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), atol=1e-5)
