"""Probe the two candidate structures for the int8 attention blocks' MXU gap.

The round-7 block profile (scripts/profile_int8_blocks.py) measured the int8
self block at 36% MXU efficiency vs the FFN's 56%; the attributed cause is
the strictly serial quant -> MXU -> softmax -> quant -> MXU dataflow inside
each grid step.  VERDICT r3 names two untried structures:

1. head-batched score matmuls — issue ALL heads' score matmuls back-to-back
   into a VMEM scratch, then ONE softmax pass, then all ctx matmuls: the MXU
   phases become long contiguous runs and the VPU phase is one big op
   instead of 16 small ones (``--variant grouped``);
2. cross-grid-step pipelining — only pays if Mosaic can overlap independent
   MXU and VPU chains at all, so ``--variant coissue`` measures that
   directly: a kernel holding one big int8 matmul, the same matmul plus an
   INDEPENDENT exp/max VPU chain on scratch, and the VPU chain alone.
   time(matmul+vpu) ~= max(...)  => co-issue happens, pipelining can win;
   time(matmul+vpu) ~= sum(...)  => strictly serial, pipelining is dead
   (matching the round-7 interleave negative).

All timings: scalar-reduced jit, arrays as jit arguments, same chip grant.

MEASURED (round 8, BASELINE.md):

* ``--variant coissue``: matmul-only 2.09 ms / vpu-only 2.11 / together
  2.07-2.23 across reps 1-4 — reads as ~100% overlap, BUT the probe is
  CONFOUNDED: each grid step writes a [512, 3072] int32 tile and the
  scalar reduction re-reads it (~380 MB HBM round trip per call), so all
  three variants sit on the same DMA floor and the compute hides under
  it.  Treat as "not disproven", not proof.
* ``--variant grouped``: 6.90 vs 6.98 ms serial — 0.99x, NO win.  Phase
  grouping changes nothing: Mosaic already schedules the serial per-head
  loop as well as the grouped one (numerics bit-identical).
* the companion probe_interleave.py at --tile 1024 (512-row halves, the
  non-pathological matmul shape): 6.86 vs 6.86 ms — exactly neutral.

Conclusion: both VERDICT-r3 structures are measured negative.  The block
is not scheduler-starved; it sits at ~90% of its own SAME-GRANT pure-
matmul floor (profile_int8_blocks.py --floor), and the residual "MXU
efficiency" gap is the Mosaic/XLA int8 matmul rate itself (~176-250
TOP/s sustained vs the 394 TOPS datasheet — uniform across Pallas tile
sizes AND plain XLA, BASELINE.md round 4).
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

D = 1024
K = 32
F = 14
HEADS = 16
T = 512  # rows/tile (the production self-block tile)


def bench(fn, fargs, steps, label):
    t0 = time.time()
    float(fn(*fargs))
    print(f"  {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(steps - 1):
        fn(*fargs)
    s = float(fn(*fargs))
    dt = (time.time() - t0) / steps * 1000
    print(f"  {label}: {dt:.3f} ms  (sum {s:.3e})", flush=True)
    return dt


# --------------------------------------------------------------------------
# co-issue probe: big int8 matmul vs the same + an independent VPU chain
# --------------------------------------------------------------------------

def _mm_kernel(x_ref, w_ref, o_ref, *, vpu_reps: int, mxu: bool):
    acc = None
    if mxu:
        acc = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    if vpu_reps:
        # independent VPU chain shaped like a softmax pass over the
        # attention groups: exp/max/sum on a [512, 512] fp32 tile
        v = x_ref[:, :512].astype(jnp.float32)
        for _ in range(vpu_reps):
            m = jnp.max(v, axis=-1, keepdims=True)
            v = jnp.exp(v - m)
            v = v * (1.0 / (jnp.sum(v, axis=-1, keepdims=True) + 1.0))
        if acc is None:
            o_ref[...] = jnp.broadcast_to(
                v.astype(jnp.int32)[:, :1], o_ref.shape
            )
            return
        acc = acc + v.astype(jnp.int32)[:, :1]
    o_ref[...] = acc


def coissue_probe(steps: int, batch_rows: int):
    n_tiles = batch_rows // T
    x = jax.random.randint(
        jax.random.PRNGKey(0), (batch_rows, D), -127, 127, jnp.int8
    )
    w = jax.random.randint(
        jax.random.PRNGKey(1), (D, 3 * D), -127, 127, jnp.int8
    )

    def run(vpu_reps, mxu):
        kernel = functools.partial(_mm_kernel, vpu_reps=vpu_reps, mxu=mxu)
        f = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((T, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, 3 * D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, 3 * D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch_rows, 3 * D), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )
        return jax.jit(lambda xx, ww: f(xx, ww).sum(dtype=jnp.int32))

    t_m = bench(run(0, True), (x, w), steps, "matmul only")
    for reps in (1, 2, 4):
        t_v = bench(run(reps, False), (x, w), steps, f"vpu x{reps} only")
        t_mv = bench(run(reps, True), (x, w), steps, f"matmul + vpu x{reps}")
        overlap = (t_m + t_v - t_mv) / min(t_m, t_v) if min(t_m, t_v) else 0
        print(f"  -> reps={reps}: sum {t_m+t_v:.3f} vs together {t_mv:.3f} "
              f"=> {overlap*100:.0f}% of the smaller chain overlapped",
              flush=True)


# --------------------------------------------------------------------------
# grouped-phase self block: all score matmuls -> one softmax -> all ctx
# --------------------------------------------------------------------------

NEG_INF = -1e9


def _self_block_kernel_grouped(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    gamma_ref, beta_ref, o_ref, ctx_ref, s_ref,
    *, num_heads: int, n_q: int, sm_scale: float, ln_eps: float,
):
    from unirec_tpu.ops.fused_qformer_int8 import _mm_q, _row_quant
    from unirec_tpu.ops.fused_qformer_layer import (
        _block_diag_bias,
        _group_items,
        _layer_norm_rows,
    )

    t, d = x_ref.shape
    hd = d // num_heads
    x = x_ref[...]
    x_q, rs = _row_quant(x.astype(jnp.float32))
    qkv = (
        _mm_q(x_q, rs, wqkv_ref, sqkv_ref)
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(jnp.bfloat16)

    items = t // n_q
    p_g = _group_items(items, n_q)
    n_g = items // p_g
    g = p_g * n_q
    bias = _block_diag_bias(g, g, n_q, n_q, NEG_INF)[None]  # [1, g, g]

    q_all, kv = qkv[:, :d], qkv[:, d:]
    # phase 1: ALL heads' score matmuls back-to-back into the scratch
    for h in range(num_heads):
        q = q_all[:, h * hd: (h + 1) * hd].reshape(n_g, -1, hd) * sm_scale
        k = kv[:, h * hd: (h + 1) * hd].reshape(n_g, -1, hd)
        s_ref[h] = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    # phase 2: ONE softmax pass over [H, n_g, g, g]
    s = s_ref[...] + bias[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    s_ref[...] = e
    # phase 3: ALL ctx matmuls back-to-back
    for h in range(num_heads):
        v = kv[:, d + h * hd: d + (h + 1) * hd].reshape(n_g, -1, hd)
        c = jax.lax.dot_general(
            s_ref[h].astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        c = c * inv[h]
        ctx_ref[:, h * hd: (h + 1) * hd] = c.reshape(t, hd).astype(
            ctx_ref.dtype
        )

    c_q, crs = _row_quant(ctx_ref[...].astype(jnp.float32))
    out = _mm_q(c_q, crs, wo_ref, so_ref) + bo_ref[...].astype(jnp.float32)
    y = _layer_norm_rows(
        out + x.astype(jnp.float32),
        gamma_ref[...].astype(jnp.float32),
        beta_ref[...].astype(jnp.float32),
        ln_eps,
    )
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "n_q", "ln_eps", "interpret")
)
def fused_self_attention_block_q_grouped(
    x, wqkv_q, sqkv, bqkv, wo_q, so, bo, ln_gamma, ln_beta,
    *, num_heads: int, n_q: int, ln_eps: float = 1e-12,
    interpret: bool = False,
):
    from unirec_tpu.ops.fused_qformer_layer import _group_items, _row2d

    b, k, d = x.shape
    tile = T
    rows = b * k
    pad_rows = (-rows) % tile
    xf = x.reshape(rows, d)
    if pad_rows:
        xf = jnp.pad(xf, ((0, pad_rows), (0, 0)))
    n_tiles = xf.shape[0] // tile
    items = tile // n_q
    p_g = _group_items(items, n_q)
    n_g = items // p_g
    g = p_g * n_q

    kernel = functools.partial(
        _self_block_kernel_grouped,
        num_heads=num_heads, n_q=n_q,
        sm_scale=1.0 / (d // num_heads) ** 0.5, ln_eps=ln_eps,
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
        scratch_shapes=[
            pltpu.VMEM((tile, d), jnp.bfloat16),
            pltpu.VMEM((HEADS, n_g, g, g), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, wqkv_q, _row2d(sqkv), _row2d(bqkv), wo_q, _row2d(so), _row2d(bo),
      _row2d(ln_gamma), _row2d(ln_beta))
    return out[:rows].reshape(b, k, d)


def grouped_probe(steps: int, batch: int):
    import numpy as np

    from unirec_tpu.ops.fused_qformer_int8 import (
        fused_self_attention_block_q,
        quantize_weight,
    )

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 16))

    def mk(*shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.05

    x = mk(batch, K, D).astype(jnp.bfloat16)
    wqkv = mk(D, 3 * D)
    bqkv = mk(3 * D)
    wo = mk(D, D)
    bo = mk(D)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    qw = jax.jit(quantize_weight)
    wqkv_q, sqkv = qw(wqkv)
    wo_q, so = qw(wo)

    base = jax.jit(lambda xx, *w: fused_self_attention_block_q(
        xx, *w, num_heads=HEADS, n_q=K).astype(jnp.float32).sum())
    grouped = jax.jit(lambda xx, *w: fused_self_attention_block_q_grouped(
        xx, *w, num_heads=HEADS, n_q=K).astype(jnp.float32).sum())

    args = (x, wqkv_q, sqkv, bqkv, wo_q, so, bo, g, be)
    # numerics check first (same math, different phase order)
    a = fused_self_attention_block_q(
        x, *args[1:], num_heads=HEADS, n_q=K)
    bm = fused_self_attention_block_q_grouped(
        x, *args[1:], num_heads=HEADS, n_q=K)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - bm.astype(jnp.float32))))
    print(f"  grouped vs baseline max abs err: {err:.2e}", flush=True)
    assert err < 0.1, "grouped variant diverged"
    del a, bm

    t_b = bench(base, args, steps, "self int8 baseline (serial per head)")
    t_g = bench(grouped, args, steps, "self int8 grouped phases")
    print(f"  -> grouped/baseline: {t_g/t_b:.3f}x", flush=True)
    return np.nan


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="coissue",
                   choices=["coissue", "grouped"])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=4096)
    args = p.parse_args()

    # warm the remote Mosaic compile backend (first pallas compile of a
    # process pays tunnel/AOT init regardless of kernel size)
    def _warm(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    t0 = time.time()
    float(pl.pallas_call(
        _warm,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.zeros((8, 128), jnp.float32)).sum())
    print(f"mosaic warmup: {time.time()-t0:.1f}s", flush=True)

    if args.variant == "coissue":
        coissue_probe(args.steps, args.batch * K // 8)
    else:
        grouped_probe(args.steps, args.batch)


if __name__ == "__main__":
    main()
