"""Per-block profile of the int8 item-token engine at production shapes.

The round-6 FLOP audit (BASELINE.md) showed the int8 engine at 53% of the
394 TOPS datasheet and retracted the old "measured ceiling" closure; the
remaining gap was attributed — without measurement — to quant/dequant VPU
work and the attention cores.  This script makes that attribution a
measurement: it times each fused Pallas block (self / cross / FFN, int8 and
bf16) standalone at the engine's exact shapes (batch 4096, D=1024, K=32,
F=14, heads=16, FFN 4096), multiplies by the per-engine block counts
(12 self + 6 cross + 12 FFN), and compares the sum against the measured
whole-engine time and against each block's MXU-ideal time.

All inputs are created ON DEVICE (jax.random) and every timed function
reduces to a scalar inside jit — the axon host<->device tunnel runs at
~7 MB/s and a single [B, K, D] transfer would dominate the measurement.

Usage: python scripts/profile_int8_blocks.py [--batch 4096] [--steps 20]
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
MEM = 1024  # cross-attention memory width (production field_embedding_dim)
HEADS = 16
INTER = 4096
N_SELF = 12
N_CROSS = 6
N_FFN = 12

# v5e datasheet rates
BF16_TFLOPS = 197.0
INT8_TOPS = 394.0


def bench(fn, fargs, steps, label):
    # arrays ride as jit ARGUMENTS — closure capture would bake them into
    # the HLO shipped through the remote-compile tunnel (HTTP 413)
    t0 = time.time()
    float(fn(*fargs))  # warmup/compile
    print(f"  {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(steps - 1):
        fn(*fargs)
    s = float(fn(*fargs))  # one scalar sync at the end
    dt = (time.time() - t0) / steps * 1000
    print(f"  {label}: {dt:.2f} ms  (sum {s:.3e})", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--skip-bf16", action="store_true")
    p.add_argument("--only", default="self,cross,ffn",
                   help="comma list of blocks to time")
    p.add_argument("--self-tile", type=int, default=None,
                   help="override the int8 self block tile rows")
    p.add_argument("--ffn-tile", type=int, default=None,
                   help="override the int8 FFN block tile rows")
    p.add_argument("--ffn-chunk", type=int, default=None,
                   help="override the int8 FFN intermediate chunk")
    p.add_argument("--floor", action="store_true",
                   help="also measure the SAME-GRANT pure-Mosaic int8 "
                        "matmul rate at each block's shapes and report "
                        "block time vs its own matmul floor (the datasheet "
                        "394 TOPS is not reachable through this stack — "
                        "BASELINE.md round 4/8)")
    args = p.parse_args()
    only = set(args.only.split(","))

    from unirec_tpu.ops.fused_qformer_int8 import (
        fused_cross_attention_block_q,
        fused_ffn_block_q,
        fused_self_attention_block_q,
        quantize_weight,
    )
    from unirec_tpu.ops.fused_qformer_layer import (
        fused_cross_attention_block,
        fused_ffn_block,
        fused_self_attention_block,
    )

    # warm the remote Mosaic compile backend with a trivial kernel: the
    # FIRST pallas compile of a process pays ~400s of tunnel/AOT init
    # (measured, bench_mosaic_matmul round 6) regardless of kernel size
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

    b = args.batch
    rows = b * K
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 32))

    def mk(*shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.05

    x = mk(b, K, D).astype(jnp.bfloat16)
    mem = mk(b, F, MEM).astype(jnp.bfloat16)
    key_bias = jnp.zeros((b, F), jnp.float32)

    wqkv = mk(D, 3 * D)
    bqkv = mk(3 * D)
    wo = mk(D, D)
    bo = mk(D)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    wq = mk(D, D)
    bq = mk(D)
    wkv = mk(MEM, 2 * D)
    bkv = mk(2 * D)
    w1 = mk(D, INTER)
    b1 = mk(INTER)
    w2 = mk(INTER, D)
    b2 = mk(D)

    qw = jax.jit(quantize_weight)
    wqkv_q, sqkv = qw(wqkv)
    wo_q, so = qw(wo)
    wq_q, sq = qw(wq)
    wkv_q, skv = qw(wkv)
    w1_q, s1 = qw(w1)
    w2_q, s2 = qw(w2)

    # analytic per-block matmul GFLOP (x2 for MAC) at this batch
    gf_self = rows * D * (3 * D + D) * 2 / 1e9          # QKV + out
    gf_self_attn = rows * K * (D + D) * 2 / 1e9          # scores + AV
    gf_cross = (rows * D * (D + D) + b * F * MEM * 2 * D) * 2 / 1e9
    gf_cross_attn = rows * F * (D + D) * 2 / 1e9
    gf_ffn = rows * D * INTER * 2 * 2 / 1e9

    print(f"batch={b} rows={rows}  (per-block GFLOP: self {gf_self:.1f}"
          f"+attn {gf_self_attn:.2f}, cross {gf_cross:.1f}"
          f"+attn {gf_cross_attn:.2f}, ffn {gf_ffn:.1f})", flush=True)

    results = {}

    rates = {}
    rates_b = {}
    if args.floor:
        # same-grant pure-matmul rate through Mosaic at the blocks' own
        # matmul shapes (512-row tiles, weights VMEM-resident): the honest
        # floor each block should be compared against
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import bench_mosaic_matmul as bmm

        n_tiles = rows // 512
        for name, n_dim in [("wide", 3 * D), ("narrow", D), ("kv", 2 * D)]:
            gop = rows * D * n_dim * 2 / 1e9
            kx, kw = jax.random.split(jax.random.fold_in(key, 7 + n_dim))
            x8 = jax.random.randint(kx, (rows, D), -127, 127, jnp.int8)
            w8 = jax.random.randint(kw, (D, n_dim), -127, 127, jnp.int8)
            fn = bmm.make_mm(512, D, n_dim, n_tiles, jnp.int8, jnp.int32)
            dt = bench(fn, (x8, w8), args.steps,
                       f"floor int8 [512x{D}]x[{D}x{n_dim}]")
            rates[name] = gop / dt  # TOP/s
        print(f"  same-grant Mosaic int8 rates: "
              f"wide {rates['wide']:.0f} / kv {rates['kv']:.0f} / "
              f"narrow {rates['narrow']:.0f} TOP/s", flush=True)
        if not args.skip_bf16:
            # bf16 floors for the DEFAULT engine (VERDICT r4 #3) — the FFN
            # gets its two real shapes (up [D,I], down [I,D]) instead of the
            # int8 convention of pricing both at the narrow rate
            for name, k_dim, n_dim in [
                ("wide", D, 3 * D), ("narrow", D, D), ("kv", D, 2 * D),
                ("up", D, INTER), ("down", INTER, D),
            ]:
                gop = rows * k_dim * n_dim * 2 / 1e9
                kx, kw = jax.random.split(
                    jax.random.fold_in(key, 131 + k_dim + n_dim))
                xb = jax.random.normal(kx, (rows, k_dim), jnp.bfloat16)
                wb = jax.random.normal(kw, (k_dim, n_dim), jnp.bfloat16)
                fn = bmm.make_mm(512, k_dim, n_dim, n_tiles, jnp.bfloat16,
                                 jnp.float32)
                dt = bench(fn, (xb, wb), args.steps,
                           f"floor bf16 [512x{k_dim}]x[{k_dim}x{n_dim}]")
                rates_b[name] = gop / dt  # TFLOP/s
            print("  same-grant Mosaic bf16 rates: "
                  + " / ".join(f"{k} {v:.0f}" for k, v in rates_b.items())
                  + " TFLOP/s", flush=True)

    self_q = jax.jit(lambda xx, *w: fused_self_attention_block_q(
        xx, *w, num_heads=HEADS, n_q=K,
        tile_rows=args.self_tile).astype(jnp.float32).sum())
    cross_q = jax.jit(lambda xx, mm, kb, *w: fused_cross_attention_block_q(
        xx, mm, kb, *w,
        num_heads=HEADS, n_q=K, n_kv=F).astype(jnp.float32).sum())
    ffn_q = jax.jit(lambda xx, *w: fused_ffn_block_q(
        xx, *w, tile_rows=args.ffn_tile,
        chunk=args.ffn_chunk).astype(jnp.float32).sum())

    print("int8 blocks:", flush=True)
    if "self" in only:
        results["self_q"] = bench(
            self_q, (x, wqkv_q, sqkv, bqkv, wo_q, so, bo, g, be),
            args.steps, f"self int8 (tile {args.self_tile or 512})")
    if "cross" in only:
        results["cross_q"] = bench(
            cross_q, (x, mem, key_bias, wq_q, sq, bq, wkv_q, skv, bkv,
                      wo_q, so, bo, g, be),
            args.steps, "cross int8 (tile 512)")
    if "ffn" in only:
        results["ffn_q"] = bench(
            ffn_q, (x, w1_q, s1, b1, w2_q, s2, b2, g, be),
            args.steps,
            f"ffn int8 (tile {args.ffn_tile or 512}, "
            f"chunk {args.ffn_chunk or 'auto'})")

    if not args.skip_bf16:
        wqkv_b, wo_b = wqkv.astype(jnp.bfloat16), wo.astype(jnp.bfloat16)
        wq_b, wkv_b = wq.astype(jnp.bfloat16), wkv.astype(jnp.bfloat16)
        w1_b, w2_b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
        self_b = jax.jit(lambda xx, *w: fused_self_attention_block(
            xx, *w, num_heads=HEADS, n_q=K).astype(jnp.float32).sum())
        cross_b = jax.jit(lambda xx, mm, kb, *w: fused_cross_attention_block(
            xx, mm, kb, *w,
            num_heads=HEADS, n_q=K, n_kv=F).astype(jnp.float32).sum())
        ffn_b = jax.jit(lambda xx, *w: fused_ffn_block(
            xx, *w).astype(jnp.float32).sum())
        print("bf16 blocks:", flush=True)
        results["self_b"] = bench(
            self_b, (x, wqkv_b, bqkv, wo_b, bo, g, be),
            args.steps, "self bf16")
        results["cross_b"] = bench(
            cross_b, (x, mem, key_bias, wq_b, bq, wkv_b, bkv, wo_b, bo,
                      g, be),
            args.steps, "cross bf16")
        results["ffn_b"] = bench(
            ffn_b, (x, w1_b, b1, w2_b, b2, g, be),
            args.steps, "ffn bf16")

    if not {"self_q", "cross_q", "ffn_q"} <= set(results):
        return
    print("\n--- attribution (int8) ---")
    stack = (N_SELF * results["self_q"] + N_CROSS * results["cross_q"]
             + N_FFN * results["ffn_q"])
    for name, t, n, gf, gfa in [
        ("self", results["self_q"], N_SELF, gf_self, gf_self_attn),
        ("cross", results["cross_q"], N_CROSS, gf_cross, gf_cross_attn),
        ("ffn", results["ffn_q"], N_FFN, gf_ffn, 0.0),
    ]:
        # attention cores stay bf16 in the int8 kernels
        ideal = gf / INT8_TOPS + gfa / BF16_TFLOPS  # ms
        floor_note = ""
        if rates:
            attn_ms = gfa / BF16_TFLOPS
            if name == "self":
                floor = (rows * D * 3 * D * 2 / 1e9 / rates["wide"]
                         + rows * D * D * 2 / 1e9 / rates["narrow"])
            elif name == "cross":
                # kv-projection term uses the ACTUAL memory width, not D
                # (ADVICE r4: the two only coincide at the production config)
                floor = (rows * D * D * 2 * 2 / 1e9 / rates["narrow"]
                         + b * F * MEM * 2 * D * 2 / 1e9 / rates["kv"])
            else:
                floor = gf / rates["narrow"]
            floor += attn_ms
            floor_note = (f" | same-grant floor {floor:.2f} ms -> "
                          f"{floor/t*100:.0f}% of floor")
        print(f"  {name}: {t:.2f} ms x{n} = {t*n:.1f} ms/stack"
              f" | MXU-ideal {ideal:.2f} ms -> {ideal/t*100:.0f}% eff"
              f" | gap {t-ideal:.2f} ms/block{floor_note}")
    print(f"  stack sum: {stack:.1f} ms "
          f"(engine measured ~213 ms at batch 4096; "
          f"residual = embeddings LN + first-layer bcast savings + launch)")
    if not args.skip_bf16:
        stack_b = (N_SELF * results["self_b"] + N_CROSS * results["cross_b"]
                   + N_FFN * results["ffn_b"])
        print(f"  bf16 stack sum: {stack_b:.1f} ms (engine ~307 ms)")
        for name in ["self", "cross", "ffn"]:
            q, bb = results[f"{name}_q"], results[f"{name}_b"]
            print(f"  {name}: int8/bf16 speedup {bb/q:.2f}x")
        if rates_b:
            print("\n--- bf16 floors (VERDICT r4 #3) ---")
            floors_b = {
                "self": (rows * D * 3 * D * 2 / 1e9 / rates_b["wide"]
                         + rows * D * D * 2 / 1e9 / rates_b["narrow"]
                         + gf_self_attn / BF16_TFLOPS),
                "cross": (rows * D * D * 2 * 2 / 1e9 / rates_b["narrow"]
                          + b * F * MEM * 2 * D * 2 / 1e9 / rates_b["kv"]
                          + gf_cross_attn / BF16_TFLOPS),
                "ffn": (rows * D * INTER * 2 / 1e9 / rates_b["up"]
                        + rows * INTER * D * 2 / 1e9 / rates_b["down"]),
            }
            for name in ["self", "cross", "ffn"]:
                t = results[f"{name}_b"]
                fl = floors_b[name]
                print(f"  {name} bf16: {t:.2f} ms | same-grant floor "
                      f"{fl:.2f} ms -> {fl/t*100:.0f}% of floor")


if __name__ == "__main__":
    main()
