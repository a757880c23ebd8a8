"""Fused int8 Qwen3 serving blocks (ops/fused_qwen3_int8.py): kernel-level
numerics vs the XLA int8 reference math, and model-level dispatch parity.
Kernels run interpret-mode on CPU (conftest pins the CPU backend)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from unirec_tpu.configs import Qwen3Config
from unirec_tpu.models.qwen3 import Qwen3Model, quantize_qwen3_weights
from unirec_tpu.ops.fused_qwen3_int8 import (
    qkv_int8,
    supports_fused_qwen3,
    swiglu_mlp_int8,
)

D, INTER = 128, 256
ROWS = 512


def _quant_cols(w):
    w = np.asarray(w, np.float32)
    cmax = np.maximum(np.abs(w).max(axis=0), 1e-8)
    scale = cmax / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale.astype(np.float32))


def _ref_int8_linear(x, kq, ks):
    x32 = np.asarray(x, np.float32)
    absmax = np.maximum(np.abs(x32).max(axis=-1, keepdims=True), 1e-6)
    rs = absmax / 127.0
    xq = np.round(x32 * (127.0 / absmax)).astype(np.int32)
    acc = xq @ np.asarray(kq, np.int32)
    return acc.astype(np.float32) * rs * np.asarray(ks, np.float32)[None, :]


def test_qkv_kernel_matches_reference_math():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(ROWS, D).astype(np.float32) * 0.3)
    w = rng.randn(D, 3 * D).astype(np.float32) * 0.05
    wq, ws = _quant_cols(w)
    got = np.asarray(qkv_int8(x, wq, ws, interpret=True), np.float32)
    want = _ref_int8_linear(x, wq, ws)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)
    # and close to the unquantized matmul (int8 quality sanity)
    exact = np.asarray(x, np.float32) @ w
    cos = (got * exact).sum() / (
        np.linalg.norm(got) * np.linalg.norm(exact)
    )
    assert cos > 0.999


def test_mlp_kernel_matches_reference_math():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(ROWS, D).astype(np.float32) * 0.3)
    wg = rng.randn(D, INTER).astype(np.float32) * 0.05
    wu = rng.randn(D, INTER).astype(np.float32) * 0.05
    wd = rng.randn(INTER, D).astype(np.float32) * 0.05
    wgq, sg = _quant_cols(wg)
    wuq, su = _quant_cols(wu)
    wdq, sd = _quant_cols(wd)
    got = np.asarray(
        swiglu_mlp_int8(
            x, jnp.concatenate([wgq, wuq], axis=1),
            jnp.concatenate([sg, su]), wdq, sd, interpret=True,
        ),
        np.float32,
    )
    gu = _ref_int8_linear(x, np.concatenate([wgq, wuq], axis=1),
                          np.concatenate([sg, su]))
    g, u = gu[:, :INTER], gu[:, INTER:]
    h = g / (1.0 + np.exp(-g)) * u
    want = _ref_int8_linear(h, wdq, sd)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_supports_guard():
    assert supports_fused_qwen3(512, 128, 256)
    assert not supports_fused_qwen3(500, 128, 256)   # ragged rows
    assert not supports_fused_qwen3(512, 96, 256)    # unaligned hidden
    assert not supports_fused_qwen3(512, 128, 200)   # unaligned inter


def _aligned_cfg(**kw):
    return Qwen3Config(
        vocab_size=512, hidden_size=D, intermediate_size=INTER,
        num_hidden_layers=2, num_attention_heads=1, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=64, flash_attention=False,
        **kw,
    )


def test_model_fused_dispatch_matches_xla_int8_path():
    """fused_int8_inference=True must reproduce the XLA int8 path (same
    quant math, one kernel) on a lane-aligned config; rows 8*64=512."""
    cfg = _aligned_cfg()
    model = Qwen3Model(cfg)
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (8, 64)), jnp.int32)
    mask = jnp.ones((8, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    qw = quantize_qwen3_weights(params)

    base = Qwen3Model(cfg)
    fused = Qwen3Model(_aligned_cfg(fused_int8_inference=True))
    out_xla = base.apply(
        {"params": params["params"], "qweights": qw}, ids, mask,
        deterministic=True,
    )
    out_fused = fused.apply(
        {"params": params["params"], "qweights": qw}, ids, mask,
        deterministic=True,
    )
    # The two paths quantize with different rounding forms (the kernel's
    # reciprocal-multiply vs the XLA path's divide) — ~0.1% of elements
    # land one quantization level apart, so compare as same-quality
    # approximations rather than bit-exact.
    a = np.asarray(out_fused, np.float32).reshape(-1, D)
    b = np.asarray(out_xla, np.float32).reshape(-1, D)
    np.testing.assert_allclose(a, b, atol=2e-2)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.99999, cos.min()


def test_model_fused_falls_back_without_qweights():
    """Without the qweights collection the fused flag must be inert."""
    cfg = _aligned_cfg(fused_int8_inference=True)
    model = Qwen3Model(cfg)
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (8, 64)), jnp.int32)
    mask = jnp.ones((8, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    ref = Qwen3Model(dataclasses.replace(cfg, fused_int8_inference=False))
    a = model.apply(params, ids, mask, deterministic=True)
    b = ref.apply(params, ids, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_model_fused_falls_back_on_ragged_rows():
    """Rows not divisible by the 512-row tile take the XLA path (decode
    shapes, tiny eval batches)."""
    cfg = _aligned_cfg(fused_int8_inference=True)
    model = Qwen3Model(cfg)
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 17)), jnp.int32)
    mask = jnp.ones((2, 17), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    qw = quantize_qwen3_weights(params)
    out = model.apply(
        {"params": params["params"], "qweights": qw}, ids, mask,
        deterministic=True,
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()
