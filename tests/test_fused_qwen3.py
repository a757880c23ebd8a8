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


def _lora_cfg():
    from unirec_tpu.configs import LoRAConfig

    return LoRAConfig(r=4, alpha=8, dropout=0.0)


def test_fused_training_matches_per_projection_ste_forward():
    """fused_int8_training (one wide q|k|v / gate|up STE matmul) must
    reproduce the per-projection int8 STE path with LoRA present — same
    quant math, shared row-quant pass."""
    from unirec_tpu.models.qwen3 import Qwen3Model

    cfg = _aligned_cfg(fused_int8_training=True)
    ref_cfg = _aligned_cfg()
    lora = _lora_cfg()
    model = Qwen3Model(cfg, lora=lora)
    ref = Qwen3Model(ref_cfg, lora=lora)
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (8, 64)), jnp.int32)
    mask = jnp.ones((8, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    # non-zero lora_b so the overlay actually contributes
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: (
            jnp.asarray(
                rng.randn(*x.shape).astype(np.float32) * 0.02
            ) if "lora_b" in "/".join(str(k) for k in p) else x
        ),
        params,
    )
    qw = quantize_qwen3_weights(params)
    a = model.apply({"params": params, "qweights": qw}, ids, mask,
                    deterministic=True)
    b = ref.apply({"params": params, "qweights": qw}, ids, mask,
                  deterministic=True)
    a = np.asarray(a, np.float32).reshape(-1, D)
    b = np.asarray(b, np.float32).reshape(-1, D)
    np.testing.assert_allclose(a, b, atol=2e-2)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.9999, cos.min()


def test_fused_training_grads_match_per_projection_ste():
    """LoRA gradients through the fused STE path must match the
    per-projection STE path (same STE semantics: dx through the
    dequantized weights, no base dW)."""
    from unirec_tpu.models.qwen3 import Qwen3Model

    cfg = _aligned_cfg(fused_int8_training=True)
    lora = _lora_cfg()
    model = Qwen3Model(cfg, lora=lora)
    ref = Qwen3Model(_aligned_cfg(), lora=lora)
    rng = np.random.RandomState(6)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (8, 64)), jnp.int32)
    mask = jnp.ones((8, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: (
            jnp.asarray(
                rng.randn(*x.shape).astype(np.float32) * 0.02
            ) if "lora_b" in "/".join(str(k) for k in p) else x
        ),
        params,
    )
    qw = quantize_qwen3_weights(params)

    def loss(m):
        def f(p):
            out = m.apply({"params": p, "qweights": qw}, ids, mask,
                          deterministic=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    ga = jax.grad(loss(model))(params)
    gb = jax.grad(loss(ref))(params)

    checked = 0
    flat_a = jax.tree_util.tree_flatten_with_path(ga)[0]
    flat_b = {tuple(str(k) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(gb)[0]}
    for path, va in flat_a:
        key = tuple(str(k) for k in path)
        joined = "/".join(key)
        if "lora_a" not in joined and "lora_b" not in joined:
            continue
        vb = flat_b[key]
        na = np.asarray(va, np.float32).ravel()
        nb = np.asarray(vb, np.float32).ravel()
        denom = np.linalg.norm(na) * np.linalg.norm(nb)
        if denom < 1e-12:
            continue
        cos = float((na * nb).sum() / denom)
        assert cos > 0.999, (joined, cos)
        checked += 1
    assert checked >= 8  # lora grads on q/k/v/o/gate/up/down across layers


def test_fused_ste_xla_impl_matches_pallas_impl():
    """FUSED_STE_IMPL='xla' (one wide XLA int8 dot) must match the pallas
    kernel impl bit-for-bit — same reciprocal-multiply quant form."""
    from unirec_tpu.ops import fused_qwen3_int8 as mod

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(ROWS, D).astype(np.float32) * 0.3)
    w = rng.randn(D, 3 * D).astype(np.float32) * 0.05
    wq, ws = _quant_cols(w)
    old = mod.FUSED_STE_IMPL
    try:
        mod.FUSED_STE_IMPL = "pallas"
        a = np.asarray(mod.int8_linear_fused_ste(x, wq, ws), np.float32)
        ga = jax.grad(lambda xx: jnp.sum(
            mod.int8_linear_fused_ste(xx, wq, ws) ** 2))(x)
        mod.FUSED_STE_IMPL = "xla"
        b = np.asarray(mod.int8_linear_fused_ste(x, wq, ws), np.float32)
        gb = jax.grad(lambda xx: jnp.sum(
            mod.int8_linear_fused_ste(xx, wq, ws) ** 2))(x)
    finally:
        mod.FUSED_STE_IMPL = old
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               atol=1e-4, rtol=1e-5)


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
