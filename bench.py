#!/usr/bin/env python
"""Headline benchmark: item-query-token generation throughput per TPU chip.

This is the throughput-critical path BASELINE.json names ("items/sec for
item-query-token generation"): the production Item Q-Former (hidden 1024,
12 layers, 16 heads, K=32 query tokens, F=14 fields — reference:
models/qformer_utils.py:17-28) run batched over cached field embeddings
(reference hot loop: data_processing/generate_all_item_embeddings.py:238-316).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "items/s", "vs_baseline": N}

Baseline denominator (see BASELINE.md "Measured baselines"): the reference
PyTorch pipeline at the identical config measured on this host
(single-core CPU, torch 2.x): 9.8 items/s.  The reference's own hardware
(RTX A6000) is unavailable; BASELINE.md also records an A6000 roofline
estimate (~3-5k items/s) for context.
"""

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# Persistent compilation cache: first compile through the axon remote-compile
# tunnel costs minutes; subsequent runs hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from unirec_tpu.configs import ItemQFormerConfig  # noqa: E402
from unirec_tpu.models.item_qformer import ItemQFormer  # noqa: E402

REFERENCE_ITEMS_PER_SEC = 9.8  # measured: reference torch pipeline, this host


def bench_item_token_generation(
    batch: int = 4096, iters: int = 5, repeats: int = 3,
    precision: str = "bf16",
) -> dict:
    # QFormerInference's TPU path: the fused Pallas block engine
    # (inference/fused_qformer.py) over bf16 weights — one kernel per
    # attention block + a chunked FFN kernel.  Round 2: 13.3k items/s
    # (XLA fast path was 7.1k).  FLOP basis (round-6 audit,
    # scripts/flop_audit.py): 10.88 GFLOP/item analytic -> bf16 engine
    # ~145 TFLOP/s effective = 74% of the 197 TFLOP/s datasheet peak;
    # int8 ~210 TOP/s = 53% of 394 TOPS.
    from unirec_tpu.inference.fused_qformer import (
        fused_qformer_forward,
        prepare_fused_params,
    )

    cfg = ItemQFormerConfig(fast_attention=True)
    model = ItemQFormer(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    fields = jax.random.normal(rng, (batch, 14, 1024), jnp.float32)
    mask = jnp.ones((batch, 14))
    params = model.init(rng, fields[:2], mask[:2])
    fused = prepare_fused_params(
        params, cfg, dtype=jnp.bfloat16, precision=precision
    )

    # Reduce to a scalar inside jit: measures device compute throughput.
    # (Returning the full [B, K, 1024] tensor would time the host<->device
    # tunnel of this environment, not the chip — production pipelines keep
    # query tokens on device or stream them asynchronously.)
    @jax.jit
    def fwd(fp, f, m):
        return fused_qformer_forward(fp, cfg, f, m).sum()

    # Compile-cache state BEFORE the warmup compile: grant-to-grant chip
    # variance plus cold-vs-warm compiles make single runs ambiguous
    # (BASELINE.md: r1->r3 headline spread 18.1k-20.1k across days) — the
    # JSON line is self-describing so readers can tell improvement from
    # grant luck.
    cache_entries = len(glob.glob(
        os.path.join(os.environ["JAX_COMPILATION_CACHE_DIR"], "*")
    ))
    t0 = time.time()
    float(fwd(fused, fields, mask))  # warmup / compile
    warmup_s = time.time() - t0

    # N independent repeats of `iters` synced iterations each; the median
    # repeat is the headline, min/max bound same-session noise.
    rates = []
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(iters):
            float(fwd(fused, fields, mask))  # full sync each iter
        rates.append(batch / ((time.time() - t0) / iters))
    rates.sort()
    return {
        "value": rates[len(rates) // 2],
        "min": rates[0],
        "max": rates[-1],
        "repeats": repeats,
        "iters_per_repeat": iters,
        "compile_cache_entries": cache_entries,
        "warmup_s": round(warmup_s, 1),
    }


def main() -> None:
    # Headline precision: int8 W8A8 fused kernels — 20.5k items/s vs 14.0k
    # bf16 (round 8).  Quality at the production config vs the strict fp32
    # path (scripts/measure_int8_quality.py, BASELINE.md): per-token cosine
    # 0.99948 mean / 0.99927 min (bf16 engine: 0.99995).  The library default
    # for inference remains bf16; int8 is explicit opt-in
    # (QFormerInference(precision="int8"), tokens CLI --precision int8).
    # Override: `python bench.py bf16` or BENCH_PRECISION=bf16.
    precision = (
        sys.argv[1] if len(sys.argv) > 1
        else os.environ.get("BENCH_PRECISION", "int8")
    )
    r = bench_item_token_generation(precision=precision)
    print(
        json.dumps(
            {
                "metric": "item_query_tokens_per_sec_per_chip",
                "value": round(r["value"], 1),
                "unit": "items/s",
                "precision": precision,
                "vs_baseline": round(r["value"] / REFERENCE_ITEMS_PER_SEC, 2),
                # noise/self-description fields (median of N repeats is the
                # headline; min/max bound same-session variance; cache state
                # distinguishes cold-compile runs)
                "min": round(r["min"], 1),
                "max": round(r["max"], 1),
                "repeats": r["repeats"],
                "iters_per_repeat": r["iters_per_repeat"],
                "compile_cache_entries": r["compile_cache_entries"],
                "warmup_s": r["warmup_s"],
            }
        )
    )


if __name__ == "__main__":
    main()
