"""Microbench the fused int8 Qwen3 serving kernels vs the XLA int8 path.

The round-8 HTTP serving run with `fused_int8_inference` measured 17.9
users/s (0.9 s device time per batch-16 forward) vs the round-6 XLA-path
115.8 — a ~6x regression hiding behind a green quality gate.  This probe
times each fused kernel standalone at the exact serving shape
(rows = 16 x 512 = 8192, Qwen3-0.6B dims) against the XLA int8 dots it
replaced, all in one process/grant, to find which kernel is pathological
and by how much.

Shapes: qkv [8192,1024]x[1024,4096(q2048+k1024+v1024)],
mlp gate/up [8192,1024]x[1024,6144], down [8192,3072]x[3072,1024].
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
QSIZE = 2048
KVSIZE = 1024
INTER = 3072


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=8192)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from unirec_tpu.ops.fused_qformer_int8 import quantize_weight
    from unirec_tpu.ops.fused_qwen3_int8 import qkv_int8, swiglu_mlp_int8
    from unirec_tpu.ops.int8_ste import int8_linear_ste

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

    rows = args.rows
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 16))

    def mk(*shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.05

    x = mk(rows, D).astype(jnp.bfloat16)
    h3 = mk(rows, INTER).astype(jnp.bfloat16)
    qw = jax.jit(quantize_weight)
    wq, sq = qw(mk(D, QSIZE))
    wk, sk = qw(mk(D, KVSIZE))
    wv, sv = qw(mk(D, KVSIZE))
    wg, sg = qw(mk(D, INTER))
    wu, su = qw(mk(D, INTER))
    wd, sd = qw(mk(INTER, D))

    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    sqkv = jnp.concatenate([sq.reshape(-1), sk.reshape(-1), sv.reshape(-1)])
    wgu = jnp.concatenate([wg, wu], axis=1)
    sgu = jnp.concatenate([sg.reshape(-1), su.reshape(-1)])

    print(f"rows={rows}", flush=True)
    print("qkv projection:", flush=True)
    fused_qkv = jax.jit(lambda xx, ww, ss: qkv_int8(xx, ww, ss)
                        .astype(jnp.float32).sum())
    xla_qkv = jax.jit(lambda xx, w1, s1, w2, s2, w3, s3: (
        int8_linear_ste(xx, w1, s1.reshape(-1)).astype(jnp.float32).sum()
        + int8_linear_ste(xx, w2, s2.reshape(-1)).astype(jnp.float32).sum()
        + int8_linear_ste(xx, w3, s3.reshape(-1)).astype(jnp.float32).sum()
    ))
    bench(fused_qkv, (x, wqkv, sqkv), args.steps, "fused qkv_int8")
    bench(xla_qkv, (x, wq, sq, wk, sk, wv, sv), args.steps,
          "xla int8 q+k+v")

    print("swiglu mlp:", flush=True)
    fused_mlp = jax.jit(lambda xx, w1, s1, w2, s2: swiglu_mlp_int8(
        xx, w1, s1, w2, s2).astype(jnp.float32).sum())

    def _xla_mlp(xx, w1, s1, w2, s2, w3, s3):
        g = int8_linear_ste(xx, w1, s1.reshape(-1))
        u = int8_linear_ste(xx, w2, s2.reshape(-1))
        h = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
        return int8_linear_ste(h, w3, s3.reshape(-1)).astype(
            jnp.float32).sum()

    xla_mlp = jax.jit(_xla_mlp)
    bench(fused_mlp, (x, wgu, sgu, wd, sd), args.steps, "fused swiglu_mlp_int8")
    bench(xla_mlp, (x, wg, sg, wu, su, wd, sd), args.steps,
          "xla int8 gate/up/down")

    print("down-proj alone (the [8192,3072]x[3072,1024] shape):", flush=True)
    xla_down = jax.jit(lambda hh, ww, ss: int8_linear_ste(
        hh, ww, ss.reshape(-1)).astype(jnp.float32).sum())
    bench(xla_down, (h3, wd, sd), args.steps, "xla int8 down")


if __name__ == "__main__":
    main()
