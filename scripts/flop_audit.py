"""FLOP accounting audit for the fused Q-Former engine (VERDICT r2 weak #2).

Round 2 claimed 9.7 GFLOP/item and an int8 "measured ceiling" of 176 TOP/s,
but 19,275.7 items/s x 9.7 = 187 TOP/s > 176 — the books didn't balance.
This script restates everything from one consistent basis:

1. --analytic (default): layer-by-layer matmul FLOP table derived from the
   production ItemQFormerConfig, matching exactly the ops
   ``inference/fused_qformer.fused_qformer_forward`` executes (self QKV/O +
   attention, cross Q/KV/O + attention on cross_attention_freq layers,
   2-matmul FFN).  Finding: the 9.7 figure was the self+FFN subtotal —
   it OMITTED the 6 cross-attention blocks (~1.17 GFLOP/item).
2. --xla-check: cross-checks the analytic count against XLA's own
   cost_analysis() of the non-fused model at the same config (runs on CPU).
3. --measure (TPU): times each constituent matmul STANDALONE at the
   engine's exact shapes (XLA bf16, XLA int8-dot) and compares the sum of
   standalone times against the fused engine's measured per-batch time.
   This tests the round-4 inference: the "pure matmul rate through this
   stack" microbench is NOT an upper bound for a fused engine — standalone
   ops pay HBM roundtrips between every matmul that the fused kernels keep
   in VMEM.

Usage:
  python scripts/flop_audit.py                  # analytic table
  JAX_PLATFORMS=cpu python scripts/flop_audit.py --xla-check
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/flop_audit.py --measure
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def analytic_table(batch=4096):
    from unirec_tpu.configs import ItemQFormerConfig

    cfg = ItemQFormerConfig()
    qc = cfg.qformer()
    K, H, F = cfg.num_query_tokens, cfg.hidden_size, cfg.num_fields
    I, L = cfg.intermediate_size, cfg.num_hidden_layers
    E = qc.encoder_width
    freq = qc.cross_attention_freq
    n_cross = len([i for i in range(L) if i % freq == 0])

    rows = []  # (name, per-layer GFLOP, layer count)
    self_qkv = 2 * K * H * 3 * H
    self_o = 2 * K * H * H
    self_attn = 2 * 2 * K * K * H  # scores + attn@V
    rows.append(("self QKV proj [K,H]x[H,3H]", self_qkv, L))
    rows.append(("self out proj [K,H]x[H,H]", self_o, L))
    rows.append(("self attn scores+AV", self_attn, L))
    cross_q = 2 * K * H * H
    cross_kv = 2 * F * E * 2 * H
    cross_o = 2 * K * H * H
    cross_attn = 2 * 2 * K * F * H
    rows.append(("cross Q proj [K,H]x[H,H]", cross_q, n_cross))
    rows.append((f"cross KV proj [F,{E}]x[{E},2H]", cross_kv, n_cross))
    rows.append(("cross out proj [K,H]x[H,H]", cross_o, n_cross))
    rows.append(("cross attn scores+AV", cross_attn, n_cross))
    ffn = 2 * K * H * I + 2 * K * I * H
    rows.append(("FFN [K,H]x[H,I]x[I,H]", ffn, L))

    total = sum(per * n for _, per, n in rows)
    print(f"Production ItemQFormer: K={K} H={H} F={F} I={I} L={L} "
          f"cross_freq={freq} (n_cross={n_cross})")
    print(f"{'component':42s} {'GFLOP/layer':>12s} {'layers':>7s} "
          f"{'GFLOP/item':>11s}")
    for name, per, n in rows:
        print(f"{name:42s} {per/1e9:12.4f} {n:7d} {per*n/1e9:11.4f}")
    print(f"{'TOTAL':42s} {'':12s} {'':7s} {total/1e9:11.4f}")
    subtotal_self_ffn = sum(
        per * n for (name, per, n) in rows
        if name.startswith("self") or name.startswith("FFN"))
    print(f"  (self+FFN subtotal = {subtotal_self_ffn/1e9:.4f} GFLOP/item "
          "— the round-2 '9.7' figure: cross-attention was omitted)")
    print(f"  per batch of {batch}: {total*batch/1e12:.2f} TFLOP")
    return total


def xla_check(batch=256):
    """XLA cost_analysis of the real (non-fused) model at the same config.

    XLA counts matmul FLOPs as 2*M*N*K like the analytic table; elementwise
    ops (LayerNorm, softmax, gelu) add a small non-matmul remainder, so
    expect cost_analysis ~= analytic + a few %.
    """
    import jax
    import jax.numpy as jnp

    from unirec_tpu.configs import ItemQFormerConfig
    from unirec_tpu.models.item_qformer import ItemQFormer

    cfg = ItemQFormerConfig(fast_attention=True)
    model = ItemQFormer(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    fields = jax.random.normal(rng, (batch, 14, 1024), jnp.float32)
    mask = jnp.ones((batch, 14))
    params = model.init(rng, fields[:2], mask[:2])

    def fwd(p, f, m):
        return model.apply(p, f, m)["query_outputs"].sum()

    compiled = jax.jit(fwd).lower(params, fields, mask).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca["flops"])
    analytic = analytic_table(batch)
    print(f"\nXLA cost_analysis: {flops/batch/1e9:.4f} GFLOP/item "
          f"(batch {batch}; analytic matmul-only {analytic/1e9:.4f}; "
          f"ratio {flops/batch/analytic:.4f})")


def measure(batch=4096, iters=5):
    """Standalone-op timings at the engine's exact shapes, on the TPU.

    Demonstrates why a standalone-matmul microbench under-states what a
    fused engine can sustain: each standalone op writes its result to HBM
    and the next reads it back, while the fused blocks keep the chain in
    VMEM.  Sum(standalone) > fused engine time => the 'measured ceiling'
    of round 4 was an artifact of the measurement style, not a bound.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    K, H, F, I, L = 32, 1024, 14, 4096, 12
    n_cross = 6
    M = batch * K  # query rows through every projection

    rng = jax.random.PRNGKey(0)
    results = {}
    # The axon tunnel costs ~34 ms per host sync (CLAUDE.md) — a per-call
    # float() fetch would swamp a ~5 ms matmul.  Amortize: `copies`
    # independent matmuls per jit call via lax.scan (distinct inputs defeat
    # CSE; the .sum() keeps the full product live), ONE scalar sync per
    # call, several calls.
    copies = 4

    def _time(name, m, k, n, count, q):
        if q:
            xs = jax.random.randint(rng, (copies, m, k), -127, 127, jnp.int8)
            w = jax.random.randint(rng, (k, n), -127, 127, jnp.int8)
            acc_t = jnp.int32
        else:
            xs = jax.random.normal(rng, (copies, m, k), jnp.bfloat16)
            w = jax.random.normal(rng, (k, n), jnp.bfloat16)
            acc_t = jnp.float32

        @jax.jit
        def f(xs, w):
            def body(c, x):
                y = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t,
                )
                return c + y.sum(), None
            c, _ = jax.lax.scan(body, jnp.zeros((), acc_t), xs)
            return c

        float(f(xs, w))  # warmup/compile
        t0 = time.time()
        for _ in range(iters):
            float(f(xs, w))
        dt = (time.time() - t0) / iters / copies
        fl = 2 * m * k * n
        tag = "int8" if q else "bf16"
        results[tag + " " + name] = (dt, fl, count)
        print(f"{tag} {name:34s} [{m},{k}]x[{k},{n}] x{count}: "
              f"{dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} "
              f"{'TOP/s' if q else 'TFLOP/s'}")

    def bf16_mm(name, m, k, n, count):
        _time(name, m, k, n, count, q=False)

    def int8_mm(name, m, k, n, count):
        _time(name, m, k, n, count, q=True)

    print(f"standalone ops at engine shapes (batch {batch}, M={M}):")
    for mm in (bf16_mm, int8_mm):
        mm("self QKV", M, H, 3 * H, L)
        mm("self/cross out or cross Q", M, H, H, L + 2 * n_cross)
        mm("cross KV", batch * F, H, 2 * H, n_cross)
        mm("FFN up", M, H, I, L)
        mm("FFN down", M, I, H, L)

    for tag, keys in (("bf16", [k for k in results if k.startswith("bf16")]),
                      ("int8", [k for k in results if k.startswith("int8")])):
        tot_t = sum(results[k][0] * results[k][2] for k in keys)
        tot_f = sum(results[k][1] * results[k][2] for k in keys)
        print(f"{tag}: sum of standalone projection times = {tot_t*1e3:.1f} "
              f"ms/batch ({tot_f/tot_t/1e12:.1f} T/s aggregate) — compare "
              "engine per-batch time from bench.py")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--xla-check", action="store_true")
    p.add_argument("--measure", action="store_true")
    p.add_argument("--batch", type=int, default=4096)
    args = p.parse_args()
    if args.xla_check:
        xla_check()
    elif args.measure:
        measure(args.batch)
    else:
        analytic_table(args.batch)
