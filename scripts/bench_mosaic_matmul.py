"""Pure-matmul ceiling THROUGH MOSAIC at the int8 engine's exact shapes.

The round-6 FLOP audit retracted the standalone-XLA "measured ceiling"
(standalone ops pay HBM round-trips the fused engine never does) and left
the datasheet MXU rate (394 int8 TOPS / 197 bf16 TFLOP/s on v5e) as the
only roofline — but nothing verified that a *Mosaic* kernel can reach the
datasheet either.  This bench isolates exactly that: a Pallas kernel whose
body is ONE dot_general per grid step (weights VMEM-resident, activations
streamed [tile, 1024] per step — 256 KB int8, negligible vs the matmul),
accumulated into a VMEM scratch and written once at the end.  No quant, no
softmax, no LayerNorm: whatever rate this sustains is the true in-kernel
MXU ceiling that the fused blocks should be compared against.

Shapes mirror the engine blocks (D=1024): QKV [256,1024]x[1024,3072],
out-proj [256,1024]x[1024,1024], FFN chunk [512,1024]x[1024,1024].

Output: ms + TOP/s (int8) / TFLOP/s (bf16) per shape -> BASELINE.md.
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


def make_mm(tile, k_dim, n_dim, n_tiles, in_dtype, acc_dtype):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # scoped-VMEM need: resident weight + acc scratch + out + double-buffered
    # x stream; the 16 MB default overflows at the wide FFN floor shapes
    itemsize = jnp.dtype(in_dtype).itemsize
    vmem_bytes = (k_dim * n_dim * itemsize          # weight
                  + 2 * tile * n_dim * 4            # acc + out
                  + 2 * tile * k_dim * itemsize     # x double-buffer
                  + 4 * 1024 * 1024)                # slack
    vmem_limit = min(100 * 1024 * 1024,
                     max(16 * 1024 * 1024, vmem_bytes))

    def kernel(x_ref, w_ref, o_ref, acc_ref, *, n_tiles):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

        @pl.when(i == n_tiles - 1)
        def _done():
            o_ref[...] = acc_ref[...]

    @jax.jit
    def run(x, w):
        out = pl.pallas_call(
            functools.partial(kernel, n_tiles=n_tiles),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, k_dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_dim, n_dim), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, n_dim), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tile, n_dim), acc_dtype),
            scratch_shapes=[pltpu.VMEM((tile, n_dim), acc_dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
        )(x, w)
        return out.astype(jnp.float32).sum()

    return run


def bench(fn, fargs, steps, label, gop):
    t0 = time.time()
    float(fn(*fargs))
    print(f"  {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(steps - 1):
        fn(*fargs)
    float(fn(*fargs))
    dt = (time.time() - t0) / steps * 1000
    print(f"  {label}: {dt:.3f} ms -> {gop/dt:.1f} TOP/s", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--rows", type=int, default=131072)
    p.add_argument("--only", default="qkv,out,ffn")
    p.add_argument("--dtypes", default="int8,bf16")
    args = p.parse_args()
    only = set(args.only.split(","))
    dtypes = set(args.dtypes.split(","))

    key = jax.random.PRNGKey(0)
    shapes = {
        "qkv": (256, 1024, 3072),
        "out": (256, 1024, 1024),
        "ffn": (512, 1024, 1024),
    }
    for name, (tile, k_dim, n_dim) in shapes.items():
        if name not in only:
            continue
        n_tiles = args.rows // tile
        gop = args.rows * k_dim * n_dim * 2 / 1e9
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        xf = jax.random.normal(kx, (args.rows, k_dim), jnp.float32)
        wf = jax.random.normal(kw, (k_dim, n_dim), jnp.float32)
        if "int8" in dtypes:
            x8 = jnp.clip(jnp.round(xf * 30), -127, 127).astype(jnp.int8)
            w8 = jnp.clip(jnp.round(wf * 30), -127, 127).astype(jnp.int8)
            fn = make_mm(tile, k_dim, n_dim, n_tiles, jnp.int8, jnp.int32)
            bench(fn, (x8, w8), args.steps,
                  f"{name} int8 [{tile}x{k_dim}]x[{k_dim}x{n_dim}]", gop)
        if "bf16" in dtypes:
            xb = xf.astype(jnp.bfloat16)
            wb = wf.astype(jnp.bfloat16)
            fn = make_mm(tile, k_dim, n_dim, n_tiles, jnp.bfloat16,
                         jnp.float32)
            bench(fn, (xb, wb), args.steps,
                  f"{name} bf16 [{tile}x{k_dim}]x[{k_dim}x{n_dim}]", gop)


if __name__ == "__main__":
    main()
