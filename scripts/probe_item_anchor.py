"""Probe: where does the item-stage anchor forward lose its 2x vs the engine?

Times the Q-Former encoder query path (production config) on the real chip
in four variants built from the SAME fused param tree:

  xla     : pure-jnp blocks (flattering XLA baseline: QKV pre-concatenated)
  fused   : full fused engine (attention + FFN kernels)
  attn    : fused attention blocks + jnp FFN   -> value of attention fusion
  ffn     : jnp attention + fused FFN kernel   -> value of FFN fusion

Decides whether a *trainable* fused attention block (custom VJP) is worth
building for the item trainer (BASELINE.md round-5 item dissection: the
anchor runs 6.6k items/s XLA vs 13.3k engine, known +40% step headroom).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from unirec_tpu.configs import ItemQFormerConfig
from unirec_tpu.inference.fused_qformer import (
    fused_qformer_forward,
    prepare_fused_params,
)
from unirec_tpu.models.item_qformer import ItemQFormer
from unirec_tpu.ops.fused_qformer_layer import (
    NEG_INF,
    fused_cross_attention_block,
    fused_ffn_block,
    fused_self_attention_block,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
cfg = ItemQFormerConfig()
qcfg = cfg.qformer()
K, F, D = cfg.num_query_tokens, cfg.num_fields, cfg.hidden_size
heads, eps = qcfg.num_attention_heads, qcfg.layer_norm_eps

rng = np.random.RandomState(0)
fields = jnp.asarray(rng.randn(B, F, cfg.field_embedding_dim), jnp.bfloat16)
mask = jnp.ones((B, F), jnp.float32)
key_bias = (1.0 - mask) * NEG_INF

model = ItemQFormer(cfg, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), fields[:2], mask[:2])
fused = prepare_fused_params(params, cfg, jnp.bfloat16)


def ln(x32, g, b):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) + b.astype(
        jnp.float32
    )


def jnp_self_block(x, lp):
    b, k, d = x.shape
    hd = d // heads
    qkv = (x @ lp.wqkv + lp.bqkv.astype(x.dtype)).reshape(
        b, k, 3, heads, hd
    )
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    kk = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                   preferred_element_type=jnp.float32) / (hd ** 0.5)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    c = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(
        b, k, d
    )
    out = c @ lp.self_wo + lp.self_bo.astype(x.dtype)
    return ln(out.astype(jnp.float32) + x.astype(jnp.float32),
              lp.self_ln_g, lp.self_ln_b).astype(x.dtype)


def jnp_cross_block(x, mem, lp):
    b, k, d = x.shape
    f = mem.shape[1]
    hd = d // heads
    q = (x @ lp.wq + lp.bq.astype(x.dtype)).reshape(
        b, k, heads, hd
    ).transpose(0, 2, 1, 3)
    kv = (mem @ lp.wkv + lp.bkv.astype(x.dtype)).reshape(
        b, f, 2, heads, hd
    )
    kk = kv[:, :, 0].transpose(0, 2, 1, 3)
    v = kv[:, :, 1].transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                   preferred_element_type=jnp.float32) / (hd ** 0.5)
    s = s + key_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    c = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(
        b, k, d
    )
    out = c @ lp.cross_wo + lp.cross_bo.astype(x.dtype)
    return ln(out.astype(jnp.float32) + x.astype(jnp.float32),
              lp.cross_ln_g, lp.cross_ln_b).astype(x.dtype)


def jnp_ffn(x, lp):
    h = x @ lp.w1 + lp.b1.astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)
    h = h @ lp.w2 + lp.b2.astype(x.dtype)
    return ln(h.astype(jnp.float32) + x.astype(jnp.float32),
              lp.ffn_ln_g, lp.ffn_ln_b).astype(x.dtype)


def embed(fused, fe):
    mem = fe.astype(jnp.bfloat16)
    if fused.field_id_embeddings is not None:
        mem = mem + fused.field_id_embeddings[None, :, :]
    h = jnp.broadcast_to(
        fused.query_embeddings, (fe.shape[0], K, D)
    ).astype(jnp.float32)
    h = ln(h, fused.emb_ln_g, fused.emb_ln_b).astype(jnp.bfloat16)
    return h, mem


def make_fwd(attn_mode, ffn_mode):
    def fwd(fused, fe):
        h, mem = embed(fused, fe)
        for lp in fused.layers:
            if attn_mode == "fused":
                h = fused_self_attention_block(
                    h, lp.wqkv, lp.bqkv, lp.self_wo, lp.self_bo,
                    lp.self_ln_g, lp.self_ln_b,
                    num_heads=heads, n_q=K, ln_eps=eps,
                )
            else:
                h = jnp_self_block(h, lp)
            if lp.has_cross:
                if attn_mode == "fused":
                    h = fused_cross_attention_block(
                        h, mem, key_bias, lp.wq, lp.bq, lp.wkv, lp.bkv,
                        lp.cross_wo, lp.cross_bo, lp.cross_ln_g,
                        lp.cross_ln_b,
                        num_heads=heads, n_q=K, n_kv=F, ln_eps=eps,
                    )
                else:
                    h = jnp_cross_block(h, mem, lp)
            if ffn_mode == "fused":
                h = fused_ffn_block(
                    h, lp.w1, lp.b1, lp.w2, lp.b2, lp.ffn_ln_g, lp.ffn_ln_b,
                    ln_eps=eps,
                )
            else:
                h = jnp_ffn(h, lp)
        return jnp.sum(jnp.abs(h.astype(jnp.float32)))

    return fwd


def engine_fwd(fused, fe):
    return jnp.sum(
        jnp.abs(fused_qformer_forward(fused, cfg, fe, mask).astype(jnp.float32))
    )


variants = {
    "xla": make_fwd("xla", "xla"),
    "attn": make_fwd("fused", "xla"),
    "ffn": make_fwd("xla", "fused"),
    "fused": make_fwd("fused", "fused"),
    "engine": engine_fwd,
}

ref = None
for name, fn in variants.items():
    jf = jax.jit(fn)
    t0 = time.time()
    val = float(jf(fused, fields))
    print(f"{name}: compile+first {time.time()-t0:.1f}s val={val:.1f}",
          flush=True)
    if ref is None:
        ref = val
    else:
        assert abs(val - ref) / abs(ref) < 2e-2, (name, val, ref)
    n = 10
    t0 = time.time()
    for _ in range(n):
        v = jf(fused, fields)
    _ = float(v)
    dt = (time.time() - t0) / n * 1000
    print(f"RESULT {name}: {dt:.1f} ms  ({B / dt * 1000:.0f} items/s)",
          flush=True)
