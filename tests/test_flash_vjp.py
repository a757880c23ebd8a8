"""Trainable flash cross-attention: forward AND gradient parity vs XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirec_tpu.ops.attention import attention, make_additive_mask
from unirec_tpu.ops.flash_vjp import flash_cross_attention_vjp

B, H, LQ, LKV, HD = 2, 3, 16, 384, 32


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, LQ, HD).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, LKV, HD).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, LKV, HD).astype(np.float32))
    mask = (rng.rand(B, LKV) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0
    bias = make_additive_mask(jnp.asarray(mask))
    return q, k, v, bias


def test_forward_matches_xla(data):
    q, k, v, bias = data
    ref = attention(q, k, v, bias)
    out = flash_cross_attention_vjp(q, k, v, bias, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_gradients_match_xla(data):
    q, k, v, bias = data
    rng = np.random.RandomState(1)
    ct = jnp.asarray(rng.randn(B, H, LQ, HD).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v, bias) * ct)

    def loss_flash(q, k, v):
        return jnp.sum(flash_cross_attention_vjp(q, k, v, bias, 128, True) * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_masked_keys_get_zero_grad(data):
    q, k, v, bias = data
    mask_np = (np.asarray(bias[:, 0, 0, :]) == 0.0)  # True = valid

    def loss(k, v):
        return jnp.sum(flash_cross_attention_vjp(q, k, v, bias, 128, True))

    dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
    invalid = ~mask_np  # [B, LKV]
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(dk)[b, :, invalid[b], :], 0.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(dv)[b, :, invalid[b], :], 0.0, atol=1e-6)


def test_fully_masked_row_matches_xla_and_stays_finite():
    """All keys masked: softmax over uniform -1e9 logits is UNIFORM (average
    of v) in the reference/XLA semantics — the flash path must match it, and
    gradients must stay finite."""
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 1, 8, HD).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 128, HD).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1, 128, HD).astype(np.float32))
    bias = make_additive_mask(jnp.zeros((1, 128)))  # everything masked

    out = flash_cross_attention_vjp(q, k, v, bias, 128, True)
    ref = attention(q, k, v, bias)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)

    def loss(q, k, v):
        return jnp.sum(flash_cross_attention_vjp(q, k, v, bias, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v, bias) ** 2)

    g_fl = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fl, g_ref):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=1e-3)


def test_odd_shapes_and_no_bias():
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 2, 5, HD).astype(np.float32))   # Lq=5 -> pad 8
    k = jnp.asarray(rng.randn(1, 2, 200, HD).astype(np.float32))  # pad 256
    v = jnp.asarray(rng.randn(1, 2, 200, HD).astype(np.float32))
    ref = attention(q, k, v, None)
    out = flash_cross_attention_vjp(q, k, v, None, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
    g_ref = jax.grad(lambda a: jnp.sum(attention(a, k, v, None) ** 2))(q)
    g_fl = jax.grad(
        lambda a: jnp.sum(flash_cross_attention_vjp(a, k, v, None, 128, True) ** 2)
    )(q)
    np.testing.assert_allclose(np.asarray(g_fl), np.asarray(g_ref),
                               atol=5e-5, rtol=1e-3)


def test_user_qformer_flash_training_matches_xla():
    """UserQFormerConfig.flash_training routes every cross-attention layer
    through the trainable flash kernel; loss and grads must match the XLA
    path at the model level (dropout 0 so both paths are deterministic)."""
    import dataclasses

    from unirec_tpu.configs import UserQFormerConfig
    from unirec_tpu.models.user_qformer import UserQFormer

    rng = np.random.RandomState(4)
    base = UserQFormerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_query_tokens=8, input_embedding_dim=32,
        num_item_tokens_to_predict=4, dropout=0.0,
    )
    seq = jnp.asarray(rng.randn(3, 150, 32).astype(np.float32))
    mask = jnp.asarray((rng.rand(3, 150) > 0.2).astype(np.float32))
    model_x = UserQFormer(base)
    model_f = UserQFormer(dataclasses.replace(base, flash_training=True))
    params = model_x.init(jax.random.PRNGKey(0), seq, mask)

    def loss(model):
        def f(p):
            return jnp.sum(model.apply(p, seq, mask) ** 2)
        return f

    lx, gx = jax.value_and_grad(loss(model_x))(params)
    lf, gf = jax.value_and_grad(loss(model_f))(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=2e-3)


def test_flash_training_with_dropout_falls_back():
    """With attention-prob dropout active the flash kernel must NOT engage
    (its probs are deterministic); the model should still train (finite
    grads) via the XLA path."""
    import dataclasses

    from unirec_tpu.configs import UserQFormerConfig
    from unirec_tpu.models.user_qformer import UserQFormer

    rng = np.random.RandomState(5)
    cfg = UserQFormerConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, num_query_tokens=8, input_embedding_dim=32,
        num_item_tokens_to_predict=4, dropout=0.3, flash_training=True,
    )
    seq = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    mask = jnp.ones((2, 64), jnp.float32)
    model = UserQFormer(cfg)
    params = model.init(jax.random.PRNGKey(0), seq, mask)

    def f(p):
        out = model.apply(
            p, seq, mask, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_proj_vjp_grads_match_xla():
    """Projection-fused variant: grads wrt q, the SHARED memory, and the
    k/v projection weights must match the XLA computation."""
    from unirec_tpu.ops.flash_vjp import flash_cross_attention_proj_vjp
    from unirec_tpu.ops.attention import split_heads

    rng = np.random.RandomState(6)
    b, h, lq, lkv, d = 2, 4, 8, 256, 64
    # merged-head interface: q is [B, Lq, D]
    q = jnp.asarray(rng.randn(b, lq, d).astype(np.float32))
    mem = jnp.asarray(rng.randn(b, lkv, d).astype(np.float32))
    wk = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bk = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    wv = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bv = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    mask = (rng.rand(b, lkv) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    bias = make_additive_mask(jnp.asarray(mask))

    def ref(q, mem, wk, bk, wv, bv):
        qh = split_heads(q, h)
        k = split_heads(mem @ wk + bk, h)
        v = split_heads(mem @ wv + bv, h)
        from unirec_tpu.ops.attention import merge_heads

        return jnp.sum(merge_heads(attention(qh, k, v, bias)) ** 2)

    def fl(q, mem, wk, bk, wv, bv):
        return jnp.sum(
            flash_cross_attention_proj_vjp(
                q, mem, wk, bk, wv, bv, bias, h, 128, True
            ) ** 2
        )

    args = (q, mem, wk, bk, wv, bv)
    np.testing.assert_allclose(float(fl(*args)), float(ref(*args)), rtol=1e-5)
    g_ref = jax.grad(ref, argnums=tuple(range(6)))(*args)
    g_fl = jax.grad(fl, argnums=tuple(range(6)))(*args)
    for a, r, name in zip(g_fl, g_ref, ["q", "mem", "wk", "bk", "wv", "bv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=1e-4, rtol=2e-3,
            err_msg=f"d{name}",
        )


def test_fully_masked_row_with_kv_padding_matches_xla():
    """lkv NOT a block multiple + a fully-masked row: the padded phantom
    keys must get exactly zero weight (they'd share the uniform -1e9 mass
    otherwise — code-review r3 finding)."""
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(2, 2, 8, HD).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 200, HD).astype(np.float32))  # pads to 256
    v = jnp.asarray(rng.randn(2, 2, 200, HD).astype(np.float32))
    mask = np.ones((2, 200), np.float32)
    mask[1, :] = 0.0  # second batch row: everything masked
    bias = make_additive_mask(jnp.asarray(mask))
    out = flash_cross_attention_vjp(q, k, v, bias, 128, True)
    ref = attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
    g_fl = jax.grad(
        lambda a, b2, c: jnp.sum(
            flash_cross_attention_vjp(a, b2, c, bias, 128, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda a, b2, c: jnp.sum(attention(a, b2, c, bias) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(g_fl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-5,
                                   rtol=1e-3)

def test_pick_block_always_8_aligned():
    """Mosaic requires 8-sublane-aligned second-minor block sizes; _pick_block
    must never return a non-multiple-of-8 divisor (ADVICE r1: Lkv=150 used to
    return block 150)."""
    from unirec_tpu.ops.flash_vjp import _pick_block

    for lkv in [8, 64, 128, 150, 152, 200, 255, 256, 300, 1000, 6400]:
        for want in [128, 150, 256, 512]:
            blk = _pick_block(lkv, want)
            assert blk % 8 == 0, (lkv, want, blk)
            assert blk >= 8
    # no-pad divisors still preferred when 8-aligned
    assert _pick_block(256, 256) == 256
    assert _pick_block(6400, 256) == 256
    # non-aligned lkv falls back to a single ceil8 block, not `want`
    assert _pick_block(150, 512) == 152


def test_merged_head_non_aligned_lkv_matches_xla():
    """Merged-head path with Lkv=150 (not a multiple of 8): forward + grads
    must still match XLA through the pad-block fallback."""
    from unirec_tpu.ops.flash_vjp import flash_cross_attention_proj_vjp
    from unirec_tpu.ops.attention import split_heads, merge_heads

    rng = np.random.RandomState(11)
    b, h, lq, lkv, d = 2, 4, 8, 150, 64
    q = jnp.asarray(rng.randn(b, lq, d).astype(np.float32))
    mem = jnp.asarray(rng.randn(b, lkv, d).astype(np.float32))
    wk = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bk = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    wv = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bv = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    mask = (rng.rand(b, lkv) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    bias = make_additive_mask(jnp.asarray(mask))

    def ref(q, mem, wk, bk, wv, bv):
        qh = split_heads(q, h)
        k = split_heads(mem @ wk + bk, h)
        v = split_heads(mem @ wv + bv, h)
        return jnp.sum(merge_heads(attention(qh, k, v, bias)) ** 2)

    def fl(q, mem, wk, bk, wv, bv):
        return jnp.sum(
            flash_cross_attention_proj_vjp(
                q, mem, wk, bk, wv, bv, bias, h, 256, True
            ) ** 2
        )

    args = (q, mem, wk, bk, wv, bv)
    np.testing.assert_allclose(float(fl(*args)), float(ref(*args)), rtol=1e-5)
    g_ref = jax.grad(ref, argnums=tuple(range(6)))(*args)
    g_fl = jax.grad(fl, argnums=tuple(range(6)))(*args)
    for a, r, name in zip(g_fl, g_ref, ["q", "mem", "wk", "bk", "wv", "bv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=1e-4, rtol=2e-3,
            err_msg=f"d{name}",
        )
