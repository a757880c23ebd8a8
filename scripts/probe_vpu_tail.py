"""Ablate the int8 self block's VPU tail: where does the last 19% live?

Round-8 floor data: the int8 self block runs at 81% of its same-grant
pure-matmul floor; the ~1.3 ms/block residual is quant + softmax + LN
VPU work that the scheduler probes showed cannot be overlapped further.
This probe measures each piece by ablation (same kernel, one phase
changed), so any future diet targets the right phase:

  baseline     — shipped kernel
  no-ln        — residual add only, LayerNorm skipped (NOT correct math;
                 timing ablation only)
  softmax-bf16 — exp/max/sum computed in bf16 (half the VPU bytes);
                 numerics reported vs baseline — if the delta is inside
                 the int8 quality budget AND the win is real, this can
                 graduate
  no-ctx-quant — out-projection fed bf16 ctx through a bf16 matmul
                 (removes the second _row_quant pass AND halves that
                 matmul's rate; isolates quant cost net of MXU change)
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
    _group_items,
    _layer_norm_rows,
    _row2d,
)

NEG_INF = -1e9
D = 1024
K = 32
HEADS = 16
TILE = 512


def _group_attention_v(q_all, kv, v_off, bias, num_heads, out_ref, sm_scale,
                       softmax_dtype):
    t, d = q_all.shape
    hd = d // num_heads
    n_g = bias.shape[0]
    for h in range(num_heads):
        q = q_all[:, h * hd: (h + 1) * hd].reshape(n_g, -1, hd) * sm_scale
        k = kv[:, h * hd: (h + 1) * hd].reshape(n_g, -1, hd)
        v = kv[:, v_off + h * hd: v_off + (h + 1) * hd].reshape(n_g, -1, hd)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + bias
        s = s.astype(softmax_dtype)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        c = jax.lax.dot_general(
            e.astype(q_all.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        c = c * (1.0 / jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True))
        out_ref[:, h * hd: (h + 1) * hd] = c.reshape(t, hd).astype(
            out_ref.dtype
        )


def _kernel(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    wo_b_ref, gamma_ref, beta_ref, o_ref, ctx_ref,
    *, num_heads, n_q, sm_scale, ln_eps, variant,
):
    t, d = x_ref.shape
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
    bias = jnp.broadcast_to(
        _block_diag_bias(g, g, n_q, n_q, NEG_INF)[None], (n_g, g, g)
    )
    sm_dtype = jnp.bfloat16 if variant == "softmax-bf16" else jnp.float32
    _group_attention_v(qkv[:, :d], qkv[:, d:], d, bias, num_heads, ctx_ref,
                       sm_scale, sm_dtype)

    if variant == "no-ctx-quant":
        out = jax.lax.dot_general(
            ctx_ref[...], wo_b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[...].astype(jnp.float32)
    else:
        c_q, crs = _row_quant(ctx_ref[...].astype(jnp.float32))
        out = (_mm_q(c_q, crs, wo_ref, so_ref)
               + bo_ref[...].astype(jnp.float32))

    res = out + x.astype(jnp.float32)
    if variant == "no-ln":
        y = res
    else:
        y = _layer_norm_rows(
            res, gamma_ref[...].astype(jnp.float32),
            beta_ref[...].astype(jnp.float32), ln_eps,
        )
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "n_q", "variant")
)
def self_block_variant(
    x, wqkv_q, sqkv, bqkv, wo_q, so, bo, wo_b, g, be,
    *, num_heads, n_q, variant,
):
    b, k, d = x.shape
    rows = b * k
    xf = x.reshape(rows, d)
    n_tiles = rows // TILE
    kernel = functools.partial(
        _kernel, num_heads=num_heads, n_q=n_q,
        sm_scale=1.0 / (d // num_heads) ** 0.5, ln_eps=1e-12,
        variant=variant,
    )
    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((TILE, d), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
    )(xf, wqkv_q, _row2d(sqkv), _row2d(bqkv), wo_q, _row2d(so), _row2d(bo),
      wo_b, _row2d(g), _row2d(be))
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
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 8))

    def mk(*shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.05

    x = mk(args.batch, K, D).astype(jnp.bfloat16)
    wqkv = mk(D, 3 * D)
    bqkv = mk(3 * D)
    wo = mk(D, D)
    bo = mk(D)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    qw = jax.jit(quantize_weight)
    wqkv_q, sqkv = qw(wqkv)
    wo_q, so = qw(wo)
    wo_b = wo.astype(jnp.bfloat16)

    fargs = (x, wqkv_q, sqkv, bqkv, wo_q, so, bo, wo_b, g, be)

    base_out = self_block_variant(*fargs, num_heads=HEADS, n_q=K,
                                  variant="baseline")
    times = {}
    for variant in ("baseline", "no-ln", "softmax-bf16", "no-ctx-quant"):
        out = self_block_variant(*fargs, num_heads=HEADS, n_q=K,
                                 variant=variant)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - base_out.astype(jnp.float32))))
        print(f"  {variant}: max|err| vs baseline {err:.2e}", flush=True)
        del out
        fn = jax.jit(lambda *a, _v=variant: self_block_variant(
            *a, num_heads=HEADS, n_q=K, variant=_v)
            .astype(jnp.float32).sum())
        times[variant] = bench(fn, fargs, args.steps, f"self int8 {variant}")

    base = times["baseline"]
    for v, t in times.items():
        print(f"  {v}: {t:.2f} ms ({base - t:+.2f} vs baseline)", flush=True)


if __name__ == "__main__":
    main()
