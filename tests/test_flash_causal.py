"""Trainable flash CAUSAL self-attention (GQA): parity vs the XLA path.

The XLA reference here is the exact attention math from
models/qwen3.py:204-214 (causal + padding additive -1e9 bias, fp32
softmax, GQA via kv-head repeat) — itself parity-tested against HF
transformers in tests/test_qwen3.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirec_tpu.ops.flash_causal_vjp import flash_causal_self_attention

B, L, HQ, HKV, HD = 2, 40, 4, 2, 16


def xla_causal(q3, k3, v3, pad_mask, hq, hkv):
    """[B, L, Hq*hd] merged-head inputs -> merged-head context, XLA math."""
    b, l, dq = q3.shape
    hd = dq // hq
    q = q3.reshape(b, l, hq, hd).transpose(0, 2, 1, 3)
    k = k3.reshape(b, l, hkv, hd)
    v = v3.reshape(b, l, hkv, hd)
    k = jnp.repeat(k, hq // hkv, axis=2).transpose(0, 2, 1, 3)
    v = jnp.repeat(v, hq // hkv, axis=2).transpose(0, 2, 1, 3)
    causal = jnp.tril(jnp.ones((l, l), jnp.float32))[None, None]
    allowed = causal * pad_mask.astype(jnp.float32)[:, None, None, :]
    bias = (1.0 - allowed) * -1e9
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / (hd ** 0.5)
    p = jax.nn.softmax(s + bias, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                     preferred_element_type=jnp.float32)
    return ctx.transpose(0, 2, 1, 3).reshape(b, l, hq * hd)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, HQ * HD).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, HKV * HD).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, HKV * HD).astype(np.float32))
    mask = (rng.rand(B, L) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0  # row 0 only attends col 0 under causal
    return q, k, v, jnp.asarray(mask)


def _flash(q, k, v, mask, **kw):
    return flash_causal_self_attention(q, k, v, mask, HQ, HKV,
                                       interpret=True, **kw)


def test_forward_matches_xla(data):
    q, k, v, mask = data
    ref = xla_causal(q, k, v, mask, HQ, HKV)
    out = _flash(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_forward_blocked_matches_xla(data):
    """Multiple q/kv blocks: the block-skip (ki <= qi) and the dynamic
    finish (diagonal block) must still produce the full softmax."""
    q, k, v, mask = data
    ref = xla_causal(q, k, v, mask, HQ, HKV)
    out = _flash(q, k, v, mask, block=8)  # 5 blocks of 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_gradients_match_xla(data):
    q, k, v, mask = data
    rng = np.random.RandomState(1)
    ct = jnp.asarray(rng.randn(B, L, HQ * HD).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(xla_causal(q, k, v, mask, HQ, HKV) * ct)

    def loss_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, mask, block=8) * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_gqa_groups_share_kv_grads(data):
    """dk/dv accumulate over every q head in the GQA group: zeroing one
    group's q-head slice of the cotangent must still leave the shared kv
    head with gradient from its sibling."""
    q, k, v, mask = data

    def loss(k_, head):
        out = _flash(q, k_, v, mask)
        sl = out[:, :, head * HD : (head + 1) * HD]
        return jnp.sum(sl ** 2)

    # heads 0 and 1 share kv head 0
    dk0 = jax.grad(loss)(k, 0)
    dk1 = jax.grad(loss)(k, 1)
    # both must produce nonzero grads on kv head 0's columns
    assert float(jnp.abs(dk0[:, :, :HD]).sum()) > 0
    assert float(jnp.abs(dk1[:, :, :HD]).sum()) > 0
    # and ZERO on kv head 1's columns (those heads never read it)
    np.testing.assert_allclose(np.asarray(dk0[:, :, HD:]), 0.0)
    np.testing.assert_allclose(np.asarray(dk1[:, :, HD:]), 0.0)


def test_pad_rows_and_future_keys_get_zero_grad(data):
    q, k, v, mask = data

    def loss(v_):
        # cotangent only on row 0: causally it sees col 0 alone
        out = _flash(q, k, v_, mask)
        return jnp.sum(out[:, 0, :])

    dv = np.asarray(jax.grad(loss)(v))
    np.testing.assert_allclose(dv[:, 1:, :], 0.0)
    assert np.abs(dv[:, 0, :]).sum() > 0


def test_no_mask_and_odd_length():
    """pad_mask=None and a length that needs kernel padding."""
    rng = np.random.RandomState(2)
    l = 13
    q = jnp.asarray(rng.randn(1, l, HQ * HD).astype(np.float32))
    k = jnp.asarray(rng.randn(1, l, HKV * HD).astype(np.float32))
    v = jnp.asarray(rng.randn(1, l, HKV * HD).astype(np.float32))
    ones = jnp.ones((1, l), jnp.float32)
    ref = xla_causal(q, k, v, ones, HQ, HKV)
    out = flash_causal_self_attention(q, k, v, None, HQ, HKV,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_qwen3_model_training_path_matches_xla():
    """Qwen3Model with flash_vjp_attention: the non-deterministic forward
    routes self-attention through the custom-VJP kernel and must match the
    XLA additive-bias path (forward AND grads) bit-close in fp32."""
    from unirec_tpu.configs import LoRAConfig, tiny_qwen3_config
    from unirec_tpu.models.qwen3 import Qwen3Model

    cfg_kw = dict(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64,
    )
    cfg_x = tiny_qwen3_config(**cfg_kw, flash_attention=False)
    cfg_f = tiny_qwen3_config(**cfg_kw, flash_attention=False,
                              flash_vjp_attention=True)
    lora = LoRAConfig(r=2, dropout=0.0)
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 128, (2, 24)))
    mask = jnp.ones((2, 24), jnp.float32).at[0, 20:].set(0.0)

    mx = Qwen3Model(cfg_x, lora=lora)
    mf = Qwen3Model(cfg_f, lora=lora)
    params = mx.init(jax.random.PRNGKey(0), ids, mask)

    def loss(m, p):
        h = m.apply(p, ids, mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(h ** 2), h

    (lx, hx), gx = jax.value_and_grad(lambda p: loss(mx, p), has_aux=True)(
        params
    )
    (lf, hf), gf = jax.value_and_grad(lambda p: loss(mf, p), has_aux=True)(
        params
    )
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hx), atol=2e-5,
                               rtol=1e-4)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    for (px, ax), (pf, af) in zip(flat_x, flat_f):
        assert px == pf
        # recompute-based backward: ~1e-3 relative noise accumulates
        # through two layers (same order as the bf16 cast the trainers use)
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ax), atol=5e-4, rtol=3e-3,
            err_msg=jax.tree_util.keystr(px),
        )
