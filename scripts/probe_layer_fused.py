"""Probe: one whole-LAYER int8 kernel vs the three per-block kernels.

Round-8 floor data says the chunked FFN kernel beats the pure-matmul
microbench at its own shapes because its 8 matmuls issue back-to-back in
one kernel (per-grid-step fixed cost ~5-6 us amortizes over more MXU
work), while the attention blocks' narrow out-projections sustain only
126 TOP/s standalone.  Hypothesis: fusing a FULL Q-Former layer
(self-attn block -> cross-attn block -> FFN block) into ONE pallas kernel
per 512-row tile chains ~8 matmuls per grid step, keeps every weight
VMEM-resident (15 MB int8 total), and cuts pallas launches 3x.

Baseline: the shipped fused_self_attention_block_q ->
fused_cross_attention_block_q -> fused_ffn_block_q sequence (the int8
engine's per-layer dispatch).  Numerics must match the sequential path
bit-for-bit (same ops, same order, same tiles).
"""

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unirec_tpu.ops.fused_qformer_int8 import (  # noqa: E402
    _mm_q,
    _row_quant,
    quantize_weight,
)
from unirec_tpu.ops.fused_qformer_layer import (  # noqa: E402
    _block_diag_bias,
    _group_attention,
    _group_items,
    _layer_norm_rows,
    _row2d,
)

NEG_INF = -1e9
D = 1024
K = 32
F = 14
HEADS = 16
INTER = 4096
TILE = 512


def _layer_kernel_q(
    x_ref, mem_ref, kbias_ref,
    wqkv_ref, sqkv_ref, bqkv_ref, wo1_ref, so1_ref, bo1_ref,
    g1_ref, b1n_ref,
    wq_ref, sq_ref, bq_ref, wkv_ref, skv_ref, bkv_ref,
    wo2_ref, so2_ref, bo2_ref, g2_ref, b2n_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, g3_ref, b3n_ref,
    o_ref,
    ctx_ref,
    *,
    num_heads: int, n_q: int, n_kv: int, sm_scale: float, ln_eps: float,
    with_cross: bool,
):
    t, d = x_ref.shape
    x = x_ref[...]

    # ---- self-attention block (identical math to _self_block_kernel_q)
    x_q, rs = _row_quant(x.astype(jnp.float32))
    qkv = (
        _mm_q(x_q, rs, wqkv_ref, sqkv_ref)
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(jnp.bfloat16)
    items = t // n_q
    p_g = _group_items(items, n_q)
    n_g = items // p_g
    g = p_g * n_q
    bias = jnp.broadcast_to(
        _block_diag_bias(g, g, n_q, n_q, NEG_INF)[None], (n_g, g, g)
    )
    _group_attention(qkv[:, :d], qkv[:, d:], d, bias, num_heads, ctx_ref,
                     sm_scale)
    c_q, crs = _row_quant(ctx_ref[...].astype(jnp.float32))
    out = _mm_q(c_q, crs, wo1_ref, so1_ref) + bo1_ref[...].astype(jnp.float32)
    h1 = _layer_norm_rows(
        out + x.astype(jnp.float32),
        g1_ref[...].astype(jnp.float32), b1n_ref[...].astype(jnp.float32),
        ln_eps,
    ).astype(x.dtype)

    # ---- cross-attention block (identical math to _cross_block_kernel_q)
    if with_cross:
        h1_q, h1rs = _row_quant(h1.astype(jnp.float32))
        q_all = (
            _mm_q(h1_q, h1rs, wq_ref, sq_ref)
            + bq_ref[...].astype(jnp.float32)
        ).astype(jnp.bfloat16)
        m_q, mrs = _row_quant(mem_ref[...].astype(jnp.float32))
        kv = (
            _mm_q(m_q, mrs, wkv_ref, skv_ref)
            + bkv_ref[...].astype(jnp.float32)
        ).astype(jnp.bfloat16)
        n_g2, g_keys = kbias_ref.shape[1], kbias_ref.shape[3]
        p_g2 = g_keys // n_kv
        g_rows = p_g2 * n_q
        bias2 = (
            _block_diag_bias(g_rows, g_keys, n_q, n_kv, 2.0 * NEG_INF)[None]
            + kbias_ref[0].astype(jnp.float32)
        )
        _group_attention(q_all, kv, d, bias2, num_heads, ctx_ref, sm_scale)
        c2_q, c2rs = _row_quant(ctx_ref[...].astype(jnp.float32))
        out2 = (
            _mm_q(c2_q, c2rs, wo2_ref, so2_ref)
            + bo2_ref[...].astype(jnp.float32)
        )
        h2 = _layer_norm_rows(
            out2 + h1.astype(jnp.float32),
            g2_ref[...].astype(jnp.float32), b2n_ref[...].astype(jnp.float32),
            ln_eps,
        ).astype(x.dtype)
    else:
        h2 = h1

    # ---- FFN block (identical math to _ffn_kernel_q at num_chunks == 1)
    h2_q, h2rs = _row_quant(h2.astype(jnp.float32))
    hmid = (
        _mm_q(h2_q, h2rs, w1_ref, s1_ref) + b1_ref[...].astype(jnp.float32)
    )
    hmid = jax.nn.gelu(hmid, approximate=True)
    hq, hrs = _row_quant(hmid)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = _layer_norm_rows(
        acc2.astype(jnp.float32) * hrs * s2_ref[...].astype(jnp.float32)
        + b2_ref[...].astype(jnp.float32)
        + h2.astype(jnp.float32),
        g3_ref[...].astype(jnp.float32), b3n_ref[...].astype(jnp.float32),
        ln_eps,
    )
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "n_q", "n_kv", "ln_eps", "with_cross",
                     "interpret"),
)
def fused_layer_q(
    x, mem, key_bias,
    wqkv_q, sqkv, bqkv, wo1_q, so1, bo1, g1, b1n,
    wq_q, sq, bq, wkv_q, skv, bkv, wo2_q, so2, bo2, g2, b2n,
    w1_q, s1, b1, w2_q, s2, b2, g3, b3n,
    *, num_heads: int, n_q: int, n_kv: int, ln_eps: float = 1e-12,
    with_cross: bool = True, interpret: bool = False,
):
    b, k, d = x.shape
    f, dm = mem.shape[1], mem.shape[2]
    tile = TILE
    p_items = tile // n_q
    pad_b = (-b) % p_items
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        mem = jnp.pad(mem, ((0, pad_b), (0, 0), (0, 0)))
        key_bias = jnp.pad(
            key_bias, ((0, pad_b), (0, 0)), constant_values=NEG_INF
        )
    bp = x.shape[0]
    n_tiles = bp // p_items
    xf = x.reshape(bp * k, d)
    memf = mem.reshape(bp * f, dm)
    p_g = _group_items(p_items, n_kv)
    n_g = p_items // p_g
    kbias = key_bias.reshape(n_tiles, n_g, 1, p_g * f)

    kernel = functools.partial(
        _layer_kernel_q,
        num_heads=num_heads, n_q=n_q, n_kv=n_kv,
        sm_scale=1.0 / (d // num_heads) ** 0.5, ln_eps=ln_eps,
        with_cross=with_cross,
    )
    const = lambda i: (0, 0)  # noqa: E731
    inter = w1_q.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p_items * f, dm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_g, 1, p_g * f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, inter), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, memf, kbias,
      wqkv_q, _row2d(sqkv), _row2d(bqkv), wo1_q, _row2d(so1), _row2d(bo1),
      _row2d(g1), _row2d(b1n),
      wq_q, _row2d(sq), _row2d(bq), wkv_q, _row2d(skv), _row2d(bkv),
      wo2_q, _row2d(so2), _row2d(bo2), _row2d(g2), _row2d(b2n),
      w1_q, _row2d(s1), _row2d(b1), w2_q, _row2d(s2), _row2d(b2),
      _row2d(g3), _row2d(b3n))
    return out[: bp * k].reshape(bp, k, d)[:b]


def bench(fn, fargs, steps, label):
    t0 = time.time()
    float(fn(*fargs))
    print(f"  {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(steps - 1):
        fn(*fargs)
    s = float(fn(*fargs))
    dt = (time.time() - t0) / steps * 1000
    print(f"  {label}: {dt:.2f} ms  (sum {s:.3e})", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    from unirec_tpu.ops.fused_qformer_int8 import (
        fused_cross_attention_block_q,
        fused_ffn_block_q,
        fused_self_attention_block_q,
    )

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 24))

    def mk(*shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.05

    b = args.batch
    x = mk(b, K, D).astype(jnp.bfloat16)
    mem = mk(b, F, D).astype(jnp.bfloat16)
    key_bias = jnp.zeros((b, F), jnp.float32)
    qw = jax.jit(quantize_weight)
    wqkv_q, sqkv = qw(mk(D, 3 * D)); bqkv = mk(3 * D)
    wo1_q, so1 = qw(mk(D, D)); bo1 = mk(D)
    wq_q, sq = qw(mk(D, D)); bq = mk(D)
    wkv_q, skv = qw(mk(D, 2 * D)); bkv = mk(2 * D)
    wo2_q, so2 = qw(mk(D, D)); bo2 = mk(D)
    w1_q, s1 = qw(mk(D, INTER)); b1 = mk(INTER)
    w2_q, s2 = qw(mk(INTER, D)); b2 = mk(D)
    ones = jnp.ones((D,), jnp.float32)
    zeros = jnp.zeros((D,), jnp.float32)

    layer_args = (
        x, mem, key_bias,
        wqkv_q, sqkv, bqkv, wo1_q, so1, bo1, ones, zeros,
        wq_q, sq, bq, wkv_q, skv, bkv, wo2_q, so2, bo2, ones, zeros,
        w1_q, s1, b1, w2_q, s2, b2, ones, zeros,
    )

    def sequential(xx, mm, kb, *w):
        (wqkv_q, sqkv, bqkv, wo1_q, so1, bo1, g1, b1n,
         wq_q, sq, bq, wkv_q, skv, bkv, wo2_q, so2, bo2, g2, b2n,
         w1_q, s1, b1, w2_q, s2, b2, g3, b3n) = w
        h1 = fused_self_attention_block_q(
            xx, wqkv_q, sqkv, bqkv, wo1_q, so1, bo1, g1, b1n,
            num_heads=HEADS, n_q=K)
        h2 = fused_cross_attention_block_q(
            h1, mm, kb, wq_q, sq, bq, wkv_q, skv, bkv, wo2_q, so2, bo2,
            g2, b2n, num_heads=HEADS, n_q=K, n_kv=F)
        return fused_ffn_block_q(h2, w1_q, s1, b1, w2_q, s2, b2, g3, b3n)

    # numerics: same math, same tiles, same order -> must match closely
    a = sequential(*layer_args)
    bm = fused_layer_q(*layer_args, num_heads=HEADS, n_q=K, n_kv=F,
                       with_cross=True)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - bm.astype(jnp.float32))))
    print(f"layer-fused vs sequential max|err|: {err:.2e}", flush=True)
    assert err < 1e-2
    del a, bm

    seq = jax.jit(lambda *aa: sequential(*aa).astype(jnp.float32).sum())
    fus = jax.jit(lambda *aa: fused_layer_q(
        *aa, num_heads=HEADS, n_q=K, n_kv=F, with_cross=True)
        .astype(jnp.float32).sum())
    fus_nc = jax.jit(lambda *aa: fused_layer_q(
        *aa, num_heads=HEADS, n_q=K, n_kv=F, with_cross=False)
        .astype(jnp.float32).sum())

    t_seq = bench(seq, layer_args, args.steps, "sequential 3 kernels")
    t_fus = bench(fus, layer_args, args.steps, "layer-fused (w/ cross)")
    t_nc = bench(fus_nc, layer_args, args.steps, "layer-fused (no cross)")
    print(f"-> layer-fused/sequential: {t_fus/t_seq:.3f}x "
          f"(no-cross {t_nc:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
