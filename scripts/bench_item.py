"""Benchmark the Item Q-Former train step (production config) on TPU.

Configs: strict fp32 / bf16+fused-bf16 reference forwards (the TPU default)
/ bf16+fused-int8.  Synthetic device-resident triplets.

Usage: python scripts/bench_item.py [--batch 512] [--mode bf16|fp32|int8]
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
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--mode", default="bf16", choices=["fp32", "bf16", "int8"])
    p.add_argument("--fused-anchor", action="store_true",
                   help="trainable fused attention blocks for the anchor "
                   "(ops/fused_qformer_vjp.py; attention-prob dropout off)")
    args = p.parse_args()
    if args.fused_anchor and args.mode == "fp32":
        # the model gate would silently fall back to XLA on TPU (fp32
        # weights overflow VMEM) and the RESULT line would mislabel it
        p.error("--fused-anchor requires --mode bf16 or int8")

    from unirec_tpu.configs import (
        ItemQFormerConfig,
        MeshConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from unirec_tpu.train.item_qformer import ItemQFormerTrainer

    cfg = ItemQFormerConfig(  # production: 1024/12L/16H/K=32/F=14
        fused_training=args.fused_anchor,
    )
    trainer = ItemQFormerTrainer(
        cfg,
        TrainConfig(
            batch_size=args.batch,
            optimizer=OptimizerConfig(learning_rate=1e-4),
            mesh=MeshConfig(dp=1, tp=1),
        ),
        dtype="float32" if args.mode == "fp32" else "bfloat16",
        fused_reference_forwards=args.mode != "fp32",
        fused_precision="int8" if args.mode == "int8" else "bf16",
    )
    state = trainer.init_state()

    rng = np.random.RandomState(0)
    b, f, d = args.batch, cfg.num_fields, cfg.field_embedding_dim
    mk = lambda: (  # noqa: E731
        jnp.asarray(rng.randn(b, f, d).astype(np.float32)),
        jnp.ones((b, f), jnp.float32),
    )
    ae, am = mk()
    pe, pm = mk()
    ne, nm = mk()
    batch = {
        "anchor_emb": ae, "anchor_mask": am,
        "pos_emb": pe, "pos_mask": pm,
        "neg_emb": ne, "neg_mask": nm,
    }

    step = trainer._train_step
    t0 = time.time()
    state, m = step(state, batch)
    print(f"compile+first: {time.time()-t0:.1f}s "
          f"loss={float(m['loss']):.4f}", flush=True)
    t0 = time.time()
    for _ in range(args.steps):
        state, m = step(state, batch)
    loss = float(m["loss"])
    dt = (time.time() - t0) / args.steps
    print(
        f"RESULT item-stage batch={b} mode={args.mode} "
        f"fused_anchor={args.fused_anchor} "
        f"ms_per_step={dt*1000:.1f} samples_per_s={b/dt:.0f} "
        f"loss={loss:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
