"""Microbenchmark: the pure int8 matmul rate through this Pallas/Mosaic
stack, by OUTPUT dtype.

BASELINE.md round 4 pinned the int8 engine at ~100% of a measured ~176
TOP/s ceiling — but that ceiling wrote fp32 outputs to HBM (4 B/element).
This isolates whether the output write traffic is part of the wall: fp32
vs bf16 vs int8 outputs at the same [131072,1024]x[1024,1024] problem,
plus the XLA dot_general control.  If bf16/int8 outputs measure
materially higher, the fused engine (ops/fused_qformer_int8.py) has
headline headroom by keeping intermediates narrow; if not, the 176 TOP/s
wall stands regardless of HBM traffic (MXU issue rate through this
stack).

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/bench_int8_matmul.py
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, K, N = 131072, 1024, 1024
TILE = 512
OPS = 2 * M * K * N


def _kernel(x_ref, w_ref, o_ref, *, out_dtype):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if out_dtype == jnp.int32:
        o_ref[...] = acc
    else:
        # scale-cast, as the fused engine's dequant epilogue does
        o_ref[...] = (acc.astype(jnp.float32) * 0.01).astype(out_dtype)


def pallas_matmul(x, w, out_dtype):
    kern = functools.partial(_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(x, w)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out[0, :8].astype(jnp.float32)))  # sync through the tunnel
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0, :8].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    return OPS / dt / 1e12


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)

    for dtype, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16"),
                        (jnp.int8, "int8"), (jnp.int32, "int32")):
        fn = jax.jit(lambda a, b, d=dtype: pallas_matmul(a, b, d))
        rate = timeit(fn, x, w)
        print(f"pallas int8 matmul tile={TILE} out={name}: "
              f"{rate:.1f} TOP/s", flush=True)

    xla = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.bfloat16))
    print(f"xla dot_general out=bf16: {timeit(xla, x, w):.1f} TOP/s",
          flush=True)

    bx = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    bw = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    xla_bf = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16))
    print(f"xla bf16 matmul control out=bf16: {timeit(xla_bf, bx, bw):.1f} "
          f"TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
