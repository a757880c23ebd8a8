"""Probe: can interleaving two half-tiles overlap VPU and MXU phases?

The round-6 block profile puts the int8 self block at 7.5 ms vs ~4.9 ms of
pure matmul time at the MEASURED Mosaic int8 rate (~231-250 TOP/s, NOT the
394 datasheet — bench_mosaic_matmul.py).  The remaining ~2.6 ms is the
quant / dequant / softmax VPU work, which in the current kernel sits on the
critical path: within one grid step the dataflow is strictly serial
(quant -> MXU qkv -> VPU attention -> quant -> MXU out -> VPU LN), so the
MXU idles during every VPU phase.  This probe processes TWO half-tiles per
grid step with the phases manually interleaved (half B's matmuls are
independent of half A's VPU work), giving Mosaic's static scheduler the
freedom to overlap them.  If the interleaved variant approaches the
matmul-only floor, it graduates into ops/fused_qformer_int8.py.

VERDICT (measured, BASELINE.md round 7): it does NOT graduate — serial
8.34 ms vs interleaved 8.86 ms on the same grant, numerics exactly equal.
Mosaic's scheduler does not exploit the phase freedom, and the half-size
matmul steps lose more than the overlap could gain.

Round-8 re-test at ``--tile 1024`` (512-row halves — the KNOWN-GOOD
matmul shape, removing the 256-row pathology that confounded the run
above): serial 6.86 ms vs interleaved 6.86 ms, numerics exactly equal —
EXACTLY neutral.  With the shape excuse gone, the negative is clean:
giving Mosaic phase-shifted independent work does not change the
schedule.  See probe_attn_structures.py for the full round-8 conclusion
(the block already sits at ~90% of its same-grant pure-matmul floor).
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

from unirec_tpu.ops.fused_qformer_int8 import (  # noqa: E402
    _mm_q,
    _row_quant,
    quantize_weight,
)
from unirec_tpu.ops.fused_qformer_layer import (  # noqa: E402
    NEG_INF,
    _block_diag_bias,
    _group_attention,
    _group_items,
    _layer_norm_rows,
    _row2d,
)

D = 1024
K = 32
HEADS = 16


def _half(x_ref, wqkv_ref, sqkv_ref, bqkv_ref, lo, hi):
    x = x_ref[lo:hi]
    x_q, rs = _row_quant(x.astype(jnp.float32))
    qkv = (
        _mm_q(x_q, rs, wqkv_ref, sqkv_ref)
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(jnp.bfloat16)
    return x, qkv


def _self_interleaved_kernel(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    gamma_ref, beta_ref, o_ref, ctx_ref,
    *, num_heads, n_q, sm_scale, ln_eps,
):
    t, d = x_ref.shape
    h = t // 2
    items = h // n_q
    p_g = _group_items(items, n_q)
    n_g = items // p_g
    g = p_g * n_q
    bias = jnp.broadcast_to(
        _block_diag_bias(g, g, n_q, n_q, NEG_INF)[None], (n_g, g, g)
    )
    gamma = gamma_ref[...].astype(jnp.float32)
    beta = beta_ref[...].astype(jnp.float32)

    # phase-shifted halves: half B's matmuls are independent of half A's
    # VPU work, so the scheduler can overlap them
    xa, qkv_a = _half(x_ref, wqkv_ref, sqkv_ref, bqkv_ref, 0, h)
    xb, qkv_b = _half(x_ref, wqkv_ref, sqkv_ref, bqkv_ref, h, t)

    _group_attention(
        qkv_a[:, :d], qkv_a[:, d:], d, bias, num_heads, ctx_ref.at[:h],
        sm_scale,
    )
    ca_q, car = _row_quant(ctx_ref[:h].astype(jnp.float32))
    out_a = _mm_q(ca_q, car, wo_ref, so_ref) + bo_ref[...].astype(jnp.float32)

    _group_attention(
        qkv_b[:, :d], qkv_b[:, d:], d, bias, num_heads, ctx_ref.at[h:],
        sm_scale,
    )
    y_a = _layer_norm_rows(out_a + xa.astype(jnp.float32), gamma, beta, ln_eps)
    o_ref[:h] = y_a.astype(o_ref.dtype)

    cb_q, cbr = _row_quant(ctx_ref[h:].astype(jnp.float32))
    out_b = _mm_q(cb_q, cbr, wo_ref, so_ref) + bo_ref[...].astype(jnp.float32)
    y_b = _layer_norm_rows(out_b + xb.astype(jnp.float32), gamma, beta, ln_eps)
    o_ref[h:] = y_b.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile",))
def self_interleaved(x, wqkv_q, sqkv, bqkv, wo_q, so, bo, g, be, *, tile=512):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    rows = b * k
    xf = x.reshape(rows, d)
    n_tiles = rows // tile
    kernel = functools.partial(
        _self_interleaved_kernel,
        num_heads=HEADS, n_q=K,
        sm_scale=1.0 / (d // HEADS) ** 0.5, ln_eps=1e-12,
    )
    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(xf, wqkv_q, _row2d(sqkv), _row2d(bqkv), wo_q, _row2d(so), _row2d(bo),
      _row2d(g), _row2d(be))
    return out.reshape(b, k, d)


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
    p.add_argument("--tile", type=int, default=512,
                   help="rows per grid step; halves are tile/2 — at 1024 "
                        "the halves stay on the known-good 512-row matmul "
                        "shape (the 512 default's 256-row halves hit the "
                        "Mosaic pathology, BASELINE.md round 7)")
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 8))

    def mk(*shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.05

    b = args.batch
    x = mk(b, K, D).astype(jnp.bfloat16)
    wqkv = mk(D, 3 * D)
    bqkv = mk(3 * D)
    wo = mk(D, D)
    bo = mk(D)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    qw = jax.jit(quantize_weight)
    wqkv_q, sqkv = qw(wqkv)
    wo_q, so = qw(wo)

    from unirec_tpu.ops.fused_qformer_int8 import (
        fused_self_attention_block_q,
    )

    fargs = (x, wqkv_q, sqkv, bqkv, wo_q, so, bo, g, be)

    tile = args.tile
    wrap = jax.jit(lambda *a: self_interleaved(*a, tile=tile).astype(
        jnp.float32).sum())
    base = jax.jit(lambda xx, *w: fused_self_attention_block_q(
        xx, *w, num_heads=HEADS, n_q=K).astype(jnp.float32).sum())

    print("baseline (current library kernel, tile 512):", flush=True)
    bench(base, fargs, args.steps, "self int8 serial")
    print(f"interleaved (2x{tile//2} halves per {tile}-row step):",
          flush=True)
    bench(wrap, fargs, args.steps, "self int8 interleaved")

    # numerics: identical math, different op order — must match exactly
    diff = jax.jit(lambda *a: jnp.max(jnp.abs(
        self_interleaved(*a).astype(jnp.float32)
        - fused_self_attention_block_q(
            a[0], *a[1:], num_heads=HEADS, n_q=K
        ).astype(jnp.float32)
    )))
    print(f"  max |interleaved - serial| = {float(diff(*fargs)):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
