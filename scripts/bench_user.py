"""Benchmark the User Q-Former train step at production and LONG history
lengths on the real TPU.

The compression-first design (items -> K query tokens) keeps sequence
length tiny in the reference (seq 50 -> 1,600-vector memory); this measures
the claim that long-history scaling is a config change (SURVEY §5
"Long-context"): the cross-attention memory grows to seq*K vectors and the
streaming Pallas path blocks over it.

Usage: python scripts/bench_user.py [--seq 50] [--batch 64] [--bf16]
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
    p.add_argument("--seq", type=int, default=50)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="layer-level gradient checkpointing")
    p.add_argument("--flash", action="store_true",
                   help="trainable flash cross-attention (sets dropout 0: "
                   "the kernel needs deterministic attention probs)")
    p.add_argument("--fused-self", action="store_true",
                   help="trainable fused self-attention blocks over the "
                   "query tokens (ops/fused_qformer_vjp.py; needs --bf16 "
                   "+ dropout 0, composes with --flash)")
    args = p.parse_args()
    if args.fused_self and not args.bf16:
        # the fused kernels are bf16-only (model gate: q.dtype == bf16) —
        # without --bf16 the step would silently run the XLA path while
        # the RESULT line claims fused_self=True
        p.error("--fused-self requires --bf16")

    from unirec_tpu.configs import (
        MeshConfig,
        OptimizerConfig,
        TrainConfig,
        UserQFormerConfig,
    )
    from unirec_tpu.train.user_qformer import UserQFormerTrainer

    uc = UserQFormerConfig(
        gradient_checkpointing=args.remat,
        flash_training=args.flash,
        fused_training=args.fused_self,
        dropout=0.0 if (args.flash or args.fused_self) else 0.1,
    )
    trainer = UserQFormerTrainer(
        uc,
        TrainConfig(
            batch_size=args.batch,
            optimizer=OptimizerConfig(learning_rate=5e-5),
            mesh=MeshConfig(dp=1, tp=1),
        ),
        max_seq_len=args.seq,
        dtype="bfloat16" if args.bf16 else "float32",
    )
    state = trainer.init_state()

    rng = np.random.RandomState(0)
    b, s = args.batch, args.seq
    k, d = uc.num_item_tokens_to_predict, uc.input_embedding_dim
    batch = {
        "item_tokens": jnp.asarray(
            rng.randn(b, s, k, d).astype(np.float32)),
        "timestamps": jnp.asarray(
            rng.rand(b, s).astype(np.float32) * 1e9),
        "coordinates": jnp.asarray(rng.randn(b, s, 2).astype(np.float32)),
        "seq_mask": jnp.ones((b, s), jnp.float32),
        "target_tokens": jnp.asarray(
            rng.randn(b, k, d).astype(np.float32)),
    }

    step = trainer._train_step
    t0 = time.time()
    state, m = step(state, batch)
    print(f"compile+first: {time.time()-t0:.1f}s loss={float(m['loss']):.4f}",
          flush=True)
    t0 = time.time()
    for _ in range(args.steps):
        state, m = step(state, batch)
    loss = float(m["loss"])
    dt = (time.time() - t0) / args.steps
    print(
        f"RESULT user-stage batch={b} seq={s} memory={s * k} vectors "
        f"bf16={args.bf16} remat={args.remat} flash={args.flash} "
        f"fused_self={args.fused_self} "
        f"ms_per_step={dt*1000:.1f} "
        f"samples_per_s={b/dt:.1f} loss={loss:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
