"""Attention-block tile sweep: bf16 blocks at 512 rows, int8 self at 1024.

Round-8 follow-ups from the floor profile:
* the bf16 self/cross blocks still run the original 256-row tiles — the
  shape class the Mosaic matmul bench flagged as pathological for int8
  ([256,1024]x[1024,1024] at 36.7 TOP/s vs 142+ at 512).  bf16 never got
  the 512-row re-try the int8 blocks did in round 7.
* the int8 self block never tried 1024-row tiles (its 512 move was
  bounded by the old 48 MB scoped limit, now scaled).

One process, every variant numerics-checked against its
default-tile baseline before timing.
"""

import argparse
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

D = 1024
K = 32
F = 14
HEADS = 16


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


def check(a, b, label, tol=1e-2):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"  {label}: max|err| {err:.2e}", flush=True)
    assert err < tol, label


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    from unirec_tpu.ops.fused_qformer_int8 import (
        fused_self_attention_block_q,
        quantize_weight,
    )
    from unirec_tpu.ops.fused_qformer_layer import (
        fused_cross_attention_block,
        fused_self_attention_block,
    )

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 24))

    def mk(*shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.05

    b = args.batch
    x = mk(b, K, D).astype(jnp.bfloat16)
    mem = mk(b, F, D).astype(jnp.bfloat16)
    key_bias = jnp.zeros((b, F), jnp.float32)
    wqkv = mk(D, 3 * D)
    bqkv = mk(3 * D)
    wo = mk(D, D)
    bo = mk(D)
    wq = mk(D, D)
    bq = mk(D)
    wkv = mk(D, 2 * D)
    bkv = mk(2 * D)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)

    wqkv_b, wo_b = wqkv.astype(jnp.bfloat16), wo.astype(jnp.bfloat16)
    wq_b, wkv_b = wq.astype(jnp.bfloat16), wkv.astype(jnp.bfloat16)

    print("bf16 self block:", flush=True)
    sargs = (x, wqkv_b, bqkv, wo_b, bo, g, be)
    base = fused_self_attention_block(
        *sargs, num_heads=HEADS, n_q=K)
    for tile in (256, 512, 1024):
        out = fused_self_attention_block(
            *sargs, num_heads=HEADS, n_q=K, tile_rows=tile)
        check(out, base, f"self bf16 tile {tile}")
        del out
        fn = jax.jit(lambda xx, *w, _t=tile: fused_self_attention_block(
            xx, *w, num_heads=HEADS, n_q=K, tile_rows=_t)
            .astype(jnp.float32).sum())
        bench(fn, sargs, args.steps, f"self bf16 tile {tile}")

    print("bf16 cross block:", flush=True)
    cargs = (x, mem, key_bias, wq_b, bq, wkv_b, bkv, wo_b, bo, g, be)
    base = fused_cross_attention_block(
        *cargs, num_heads=HEADS, n_q=K, n_kv=F)
    for tile in (256, 512):
        out = fused_cross_attention_block(
            *cargs, num_heads=HEADS, n_q=K, n_kv=F, tile_rows=tile)
        check(out, base, f"cross bf16 tile {tile}")
        del out
        fn = jax.jit(lambda xx, mm, kb, *w, _t=tile:
                     fused_cross_attention_block(
                         xx, mm, kb, *w, num_heads=HEADS, n_q=K, n_kv=F,
                         tile_rows=_t).astype(jnp.float32).sum())
        bench(fn, cargs, args.steps, f"cross bf16 tile {tile}")

    print("int8 self block:", flush=True)
    qw = jax.jit(quantize_weight)
    wqkv_q, sqkv = qw(wqkv)
    wo_q, so = qw(wo)
    qargs = (x, wqkv_q, sqkv, bqkv, wo_q, so, bo, g, be)
    base = fused_self_attention_block_q(*qargs, num_heads=HEADS, n_q=K)
    for tile in (512, 1024):
        out = fused_self_attention_block_q(
            *qargs, num_heads=HEADS, n_q=K, tile_rows=tile)
        check(out, base, f"self int8 tile {tile}")
        del out
        fn = jax.jit(lambda xx, *w, _t=tile: fused_self_attention_block_q(
            xx, *w, num_heads=HEADS, n_q=K, tile_rows=_t)
            .astype(jnp.float32).sum())
        bench(fn, qargs, args.steps, f"self int8 tile {tile}")


if __name__ == "__main__":
    main()
