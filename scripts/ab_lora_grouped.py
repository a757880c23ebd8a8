"""Same-grant A/B: grouped LoRA overlay vs per-projection (BASELINE.md r9).

The joint-step dissection attributed 23.3 ms/step (20% of the flagship
117.7 ms step) to the per-projection LoRA overlay — cost dominated by
per-projection HBM traffic (each of 7 overlays re-reads its [4096, D]
input fwd and for dW_a bwd) and 196 independent dropout masks.
`LoRAConfig.grouped` shares one dropout draw + one concatenated lora_a
matmul across q/k/v and across gate/up (4 groups/layer instead of 7
overlays).  Opt-in: training numerics change (correlated masks within a
group); param layout unchanged.

Timed in ONE process/grant: exact path with/without grouping, and
optionally `--int8-base` with/without.  Loss trajectories printed (expect
same scale, different dropout bits).

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/ab_lora_grouped.py \
      [--batch 8] [--steps 20] [--int8]
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

from ab_int8_fused import make_batch


def run(grouped, int8_base, args, batch_fn):
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
        qwen, qf, jc, lora=LoRAConfig(grouped=grouped),
        train_config=TrainConfig(
            batch_size=args.batch,
            optimizer=OptimizerConfig(learning_rate=1e-4, warmup_steps=20,
                                      max_grad_norm=1.0),
            mesh=MeshConfig(dp=1, tp=1),
        ),
        dtype="bfloat16",
        remat=args.remat,
        remat_policy="dots",
        # bf16-base + remat-dots OOMs at batch 16 (BASELINE.md round 3)
        bf16_base=not args.remat,
        int8_base=int8_base,
    )
    state = trainer.init_state()
    batch = batch_fn(trainer.qwen_config, qf, jc)
    step = trainer._train_step

    tag = f"grouped={grouped} int8_base={int8_base}"
    t0 = time.time()
    state, m = step(state, batch)
    losses = [float(m["loss"])]
    print(f"[{tag}] compile+first: {time.time()-t0:.1f}s "
          f"loss={losses[0]:.6f}", flush=True)

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
    p.add_argument("--int8", action="store_true",
                   help="also A/B under --int8-base")
    p.add_argument("--remat", action="store_true",
                   help="A/B at the CLI-default remat-dots config "
                        "(fp32 base; use --batch 16)")
    args = p.parse_args()

    batch_fn = lambda qwen, qf, jc: make_batch(  # noqa: E731
        np.random.RandomState(0), args.batch, args.seq, qwen, qf, jc)
    print(f"backend={jax.default_backend()}", flush=True)

    base_ms, base_tail = run(False, False, args, batch_fn)
    grp_ms, grp_tail = run(True, False, args, batch_fn)
    print(f"\nA/B batch={args.batch} seq={args.seq} (one grant):")
    print(f"  per-projection LoRA: {base_ms:.1f} ms/step")
    print(f"  grouped LoRA       : {grp_ms:.1f} ms/step "
          f"({base_ms/grp_ms:.3f}x)")
    print(f"  loss tails: base {' '.join(f'{x:.4f}' for x in base_tail)} | "
          f"grouped {' '.join(f'{x:.4f}' for x in grp_tail)}")

    if args.int8:
        i_ms, i_tail = run(False, True, args, batch_fn)
        ig_ms, ig_tail = run(True, True, args, batch_fn)
        print(f"  int8-base per-proj : {i_ms:.1f} ms/step")
        print(f"  int8-base grouped  : {ig_ms:.1f} ms/step "
              f"({i_ms/ig_ms:.3f}x)")
        print(f"  loss tails: int8 {' '.join(f'{x:.4f}' for x in i_tail)} | "
              f"int8+grp {' '.join(f'{x:.4f}' for x in ig_tail)}")


if __name__ == "__main__":
    main()
