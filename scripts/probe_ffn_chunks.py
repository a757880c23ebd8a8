"""FFN tile/chunk sweep: is the int8 FFN block paying for weight re-DMA?

The round-8 same-grant floor profile (profile_int8_blocks.py --floor)
showed the FFN block at 8.82 ms with grid (256 tiles x 4 chunks) = 1024
steps, each step re-fetching a [1024, 1024] W1 chunk + [1024, 1024] W2
chunk (2 MB): ~2 GB of weight DMA per block at the production shape,
~2.4 ms of HBM time if unhidden.  At production I=4096 the ENTIRE W1+W2
are 8 MB int8 — with ``chunk=4096`` they ride a constant index_map and go
VMEM-resident, eliminating the re-DMA and 4x of the grid steps.

(The round-4 chunk sweep that crowned 1024 — "512: 10.17, 2048: 10.74" —
ran 256-row tiles under the old 16 MB scoped-VMEM limit, where a 2048
chunk thrashes; this sweep re-asks the question at tile 512+ with the
limit sized to the actual footprint.)

Every config is checked numerically against the chunk-1024 baseline
before timing.  One process, one chip grant, warmup amortized.
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
INTER = 4096


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
    p.add_argument(
        "--configs",
        default="512:1024,512:2048,512:4096,1024:2048,1024:4096",
        help="comma list of tile:chunk pairs (512:1024 is the baseline)",
    )
    p.add_argument("--bf16", action="store_true",
                   help="probe the bf16 fused_ffn_block instead (its "
                        "baseline is tile 256, chunk 1024)")
    args = p.parse_args()

    from unirec_tpu.ops.fused_qformer_int8 import (
        fused_ffn_block_q,
        quantize_weight,
    )
    from unirec_tpu.ops.fused_qformer_layer import fused_ffn_block

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 8))

    def mk(*shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.05

    x = mk(args.batch, K, D).astype(jnp.bfloat16)
    w1 = mk(D, INTER)
    b1 = mk(INTER)
    w2 = mk(INTER, D)
    b2 = mk(D)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    qw = jax.jit(quantize_weight)
    w1_q, s1 = qw(w1)
    w2_q, s2 = qw(w2)
    fargs = (x, w1_q, s1, b1, w2_q, s2, b2, g, be)

    if args.bf16:
        w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
        bargs = (x, w1b, b1, w2b, b2, g, be)
        block = fused_ffn_block
        ref = block(*bargs, tile_rows=256, chunk=1024)
        base_cfg = "256:1024"
        fargs = bargs
    else:
        block = fused_ffn_block_q
        ref = block(*fargs, tile_rows=512, chunk=1024)
        base_cfg = "512:1024"

    results = {}
    configs = args.configs
    if args.bf16 and configs.startswith("512:1024,"):
        configs = "256:1024,256:4096,512:1024,512:4096"
    for cfg in configs.split(","):
        tile, chunk = (int(v) for v in cfg.split(":"))
        out = block(*fargs, tile_rows=tile, chunk=chunk)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        # chunk boundaries change h-requant scales slightly (int8) or fp32
        # accumulation order (bf16); must stay small
        print(f"  tile {tile} chunk {chunk}: max|err| vs baseline {err:.2e}",
              flush=True)
        del out
        fn = jax.jit(lambda xx, *w, _t=tile, _c=chunk: block(
            xx, *w, tile_rows=_t, chunk=_c).astype(jnp.float32).sum())
        results[cfg] = bench(
            fn, fargs, args.steps,
            f"ffn {'bf16' if args.bf16 else 'int8'} tile {tile} chunk {chunk}")

    base = results.get(base_cfg)
    if base:
        for cfg, dt in sorted(results.items(), key=lambda kv: kv[1]):
            print(f"  {cfg}: {dt:.2f} ms  ({base/dt:.2f}x of baseline)",
                  flush=True)


if __name__ == "__main__":
    main()
