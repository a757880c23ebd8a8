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


def test_int8_linear_kernel_matches_xla_dot():
    """ops/int8_matmul.int8_linear (the fused Pallas W8A8 projection that
    replaces the pathological XLA int8 dot in serving — BASELINE.md round 3)
    computes the same quantized matmul as the reference XLA formulation."""
    import jax
    import jax.numpy as jnp

    from unirec_tpu.ops.int8_matmul import int8_linear, supports_int8_linear

    assert supports_int8_linear(512, 1024, 512, min_rows=0)
    assert not supports_int8_linear(500, 1024, 512, min_rows=0)
    assert not supports_int8_linear(8192, 1024, 512)  # below _MIN_ROWS
    assert supports_int8_linear(16384, 1024, 512)
    assert not supports_int8_linear(512, 1000, 512, min_rows=0)

    rng = np.random.RandomState(0)
    m, k, n = 512, 256, 512
    x = jnp.asarray(rng.randn(m, k).astype(np.float32) * 3.0)
    w = rng.randn(k, n).astype(np.float32) * 0.05
    col = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-8)
    ks = (col / 127.0).astype(np.float32)
    kq = np.clip(np.round(w / ks), -127, 127).astype(np.int8)

    got = int8_linear(x, jnp.asarray(kq), jnp.asarray(ks),
                      out_dtype=jnp.float32, interpret=True)

    x32 = np.asarray(x, np.float64)
    absmax = np.maximum(np.abs(x32).max(axis=-1, keepdims=True), 1e-6)
    rs = absmax / 127.0
    xq = np.clip(np.round(x32 / rs), -127, 127).astype(np.int32)
    want = (xq @ kq.astype(np.int32)) * rs * ks
    # quantization-bucket ties can flip one int8 level between the kernel's
    # multiply-by-reciprocal and the oracle's divide; bound by one level
    level = rs * ks  # per (row, col) magnitude of one int8 step
    err = np.abs(np.asarray(got, np.float64) - want)
    assert (err <= 130 * level + 1e-6).all()
    c = np.corrcoef(np.asarray(got).ravel(), want.ravel())[0, 1]
    assert c > 0.9999


def test_int8_ste_forward_and_gradient():
    """ops/int8_ste.int8_linear_ste: forward equals the inference int8
    formula exactly; backward is the straight-through gradient through the
    dequantized weight (dx = g @ (kq*ks)^T), with no weight tangent."""
    import jax
    import jax.numpy as jnp

    from unirec_tpu.ops.int8_ste import _fwd_math, int8_linear_ste

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    w = rng.randn(8, 6).astype(np.float32) * 0.1
    col = np.maximum(np.abs(w).max(axis=0), 1e-8)
    ks = jnp.asarray((col / 127.0).astype(np.float32))
    kq = jnp.asarray(
        np.clip(np.round(w / (col / 127.0)), -127, 127).astype(np.int8))

    y = int8_linear_ste(x, kq, ks)
    np.testing.assert_array_equal(np.asarray(y),
                                  np.asarray(_fwd_math(x, kq, ks)))

    g = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    dx = jax.grad(lambda x: (int8_linear_ste(x, kq, ks) * g).sum())(x)
    w_eff = np.asarray(kq, np.float32) * np.asarray(ks)[None, :]
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(g) @ w_eff.T, atol=1e-6)
