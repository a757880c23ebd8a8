"""Same-grant A/B: fused int8 training projections vs per-projection STE.

VERDICT r4 #1: at the joint training shape (batch 8 x seq 512 = 4,096 rows)
the `--int8-base` forward falls to per-projection XLA int8 dots — q/k/v each
re-quantize the same activation rows, gate/up likewise.  The fused path
(ops/fused_qwen3_int8.int8_linear_fused_ste) runs q|k|v and gate|up as ONE
wide Mosaic int8 matmul each with a shared quant pass and an STE backward.

Both configs timed in ONE process/grant (cross-grant variance is the known
confounder, BASELINE.md round 4).  Loss trajectories printed for the
numerics check (same quant math up to rounding form — expect near-equal).

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/ab_int8_fused.py \
      [--batch 8] [--steps 20]
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


def make_batch(rng, b, l, qwen, qf, jc):
    ids = rng.randint(0, qwen.vocab_size, (b, l)).astype(np.int32)
    for i in range(b):
        pos = rng.choice(l, 20, replace=False)
        ids[i, pos] = qwen.vocab_size + np.arange(20)
    return {
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


def run(int8_fused, args, batch_fn, impl="pallas"):
    from unirec_tpu.ops import fused_qwen3_int8

    fused_qwen3_int8.FUSED_STE_IMPL = impl
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

    qwen = Qwen3Config(flash_vjp_attention=True)
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
        dtype="bfloat16",
        remat=False,
        bf16_base=True,
        int8_base=True,
        int8_fused=int8_fused,
    )
    state = trainer.init_state()
    batch = batch_fn(qwen, qf, jc)
    step = trainer._train_step

    tag = f"fused={int8_fused}" + (f" impl={impl}" if int8_fused else "")
    t0 = time.time()
    state, m = step(state, batch)
    losses = [float(m["loss"])]
    print(f"[{tag}] compile+first: {time.time()-t0:.1f}s "
          f"loss={losses[0]:.6f}", flush=True)

    # warm, then timed window with ONE sync at the end
    for _ in range(3):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.time()
    for _ in range(args.steps):
        state, m = step(state, batch)
        losses.append(m["loss"])
    tail = [float(x) for x in losses[-3:]]
    dt = (time.time() - t0) / args.steps * 1000
    print(f"[{tag}] {dt:.1f} ms/step "
          f"({args.batch/dt*1000:.1f} samples/s) last losses "
          f"{' '.join(f'{x:.6f}' for x in tail)}", flush=True)
    del state, step, trainer
    return dt, tail


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    batch_fn = lambda qwen, qf, jc: make_batch(  # noqa: E731
        np.random.RandomState(0), args.batch, args.seq, qwen, qf, jc)
    print(f"backend={jax.default_backend()}", flush=True)

    base_ms, base_tail = run(False, args, batch_fn)
    fused_ms, fused_tail = run(True, args, batch_fn, impl="pallas")
    xla_ms, xla_tail = run(True, args, batch_fn, impl="xla")

    print(f"\nA/B batch={args.batch} seq={args.seq} (one grant):")
    print(f"  per-projection STE        : {base_ms:.1f} ms/step")
    print(f"  fused pallas q|k|v+gate|up: {fused_ms:.1f} ms/step "
          f"({base_ms/fused_ms:.3f}x)")
    print(f"  fused XLA wide-dot        : {xla_ms:.1f} ms/step "
          f"({base_ms/xla_ms:.3f}x)")
    for name, tail in (("pallas", fused_tail), ("xla", xla_tail)):
        drift = max(abs(a - b) for a, b in zip(base_tail, tail))
        print(f"  loss tail max |delta| vs base ({name}) = {drift:.2e}")


if __name__ == "__main__":
    main()
