"""Benchmark the joint (Qwen3-0.6B + LoRA + Q-Former) train step on TPU.

Measures steady-state ms/step for a config matrix (BASELINE.md "joint
train-step matrix").  Synthetic device-resident batches; one scalar sync per
timed window (the axon tunnel costs ~34 ms per host sync).

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/bench_joint.py \
      --batch 16 --steps 10 [--no-remat] [--no-bf16-base] [--policy dots]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--no-remat", dest="remat", action="store_false",
                   default=True)
    p.add_argument("--policy", default="dots")
    p.add_argument("--no-bf16-base", dest="bf16_base", action="store_false",
                   default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false", default=True)
    p.add_argument("--flash-vjp", action="store_true",
                   help="trainable flash causal self-attention "
                        "(ops/flash_causal_vjp.py)")
    p.add_argument("--int8-base", action="store_true",
                   help="QLoRA-style W8A8 frozen-base training forward "
                        "(ops/int8_ste.py)")
    p.add_argument("--no-int8-fused", dest="int8_fused",
                   action="store_false", default=None,
                   help="force the per-projection XLA int8 STE path (A/B "
                        "baseline for the fused q|k|v / gate|up kernels)")
    args = p.parse_args()

    from unirec_tpu.configs import (
        ItemQFormerConfig,
        JointModelConfig,
        LoRAConfig,
        MeshConfig,
        OptimizerConfig,
        Qwen3Config,
        TrainConfig,
    )
    from unirec_tpu.train.joint import JointTrainer

    qwen = Qwen3Config(flash_vjp_attention=args.flash_vjp)
    qf = ItemQFormerConfig(num_query_tokens=2)
    jc = JointModelConfig(max_length=args.seq)
    trainer = JointTrainer(
        qwen, qf, jc, lora=LoRAConfig(),
        train_config=TrainConfig(
            batch_size=args.batch,
            optimizer=OptimizerConfig(learning_rate=1e-4, warmup_steps=20,
                                      max_grad_norm=1.0),
            mesh=MeshConfig(dp=1, tp=1),
        ),
        dtype="bfloat16" if args.bf16 else "float32",
        remat=args.remat,
        remat_policy=args.policy if (args.remat and args.policy != "none")
        else None,
        bf16_base=args.bf16_base and args.bf16,
        int8_base=args.int8_base,
        int8_fused=args.int8_fused,
    )
    t0 = time.time()
    state = trainer.init_state()
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    rng = np.random.RandomState(0)
    b, l = args.batch, args.seq
    ids = rng.randint(0, qwen.vocab_size, (b, l)).astype(np.int32)
    for i in range(b):
        pos = rng.choice(l, 20, replace=False)
        ids[i, pos] = qwen.vocab_size + np.arange(20)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, l), jnp.float32),
        "history_field_embeddings": jnp.asarray(
            rng.randn(b, jc.num_history_items, qf.num_fields,
                      qf.field_embedding_dim).astype(np.float32)),
        "history_attention_mask": jnp.ones(
            (b, jc.num_history_items, qf.num_fields), jnp.float32),
        "positive_item_embeddings": jnp.asarray(
            rng.randn(b, qwen.hidden_size).astype(np.float32)),
        "negative_item_embeddings": jnp.asarray(
            rng.randn(b, 10, qwen.hidden_size).astype(np.float32)),
        "negative_masks": jnp.ones((b, 10), jnp.float32),
    }

    step = trainer._train_step
    t0 = time.time()
    state, m = step(state, batch)
    loss0 = float(m["loss"])
    print(f"compile+first step: {time.time()-t0:.1f}s loss={loss0:.4f}",
          flush=True)

    # steady state: sync once at the end of the window
    t0 = time.time()
    for _ in range(args.steps):
        state, m = step(state, batch)
    loss = float(m["loss"])
    dt = (time.time() - t0) / args.steps
    print(
        f"RESULT batch={b} seq={l} remat={args.remat} policy={args.policy} "
        f"bf16={args.bf16} bf16_base={args.bf16_base} "
        f"flash_vjp={args.flash_vjp} int8_base={args.int8_base} "
        f"int8_fused={trainer.int8_fused} "
        f"ms_per_step={dt*1000:.1f} samples_per_s={b/dt:.1f} "
        f"loss={loss:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
