"""Dissect the User Q-Former train step on the real TPU (VERDICT r4 #5).

The user stage's 125 ms/step @ batch 64 / seq 50 (512 samples/s) rests on a
round-2 claim ("bound by attention score traffic") made before flash-VJP,
fused-VJP blocks, and lane-packed attention existed.  This measures, in ONE
process/grant:

  components (default config):
    A. sequence assembly fwd (UserSequenceModel: flatten+PE+context)
    B. UserQFormer fwd (dropout on) over the [B, 1600, D] memory
    C. full fwd + MSE loss
    D. full fwd+bwd
    E. full shipped step (optimizer incl.)

  config matrix (full step each):
    base | flash cross | fused self | flash+fused

  floors: analytic GEMM GFLOP of the step (the cross K/V projections over
  the seq*K=1600-vector memory dominate: ~429 GFLOP/layer fwd at batch 64)
  vs the same-grant demonstrated bf16 rate (~165 TFLOP/s, BASELINE.md r8).

Reference: training/user_qformer_training.py:166-229.

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/dissect_user.py \
      [--batch 64] [--seq 50] [--steps 15]
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

BF16_RATE = 165.0  # TFLOP/s same-grant demonstrated (BASELINE.md round 8)


def bench(fn, args, steps, label):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    dt = (time.time() - t0) / steps * 1000
    print(f"{label}: {dt:.1f} ms", flush=True)
    return dt


def step_gflops(uc, b, seq):
    """Analytic GEMM GFLOP for ONE fwd of the user stage."""
    d = uc.hidden_size
    i = uc.intermediate_size
    q = uc.num_query_tokens
    k_mem = 32  # item tokens per history item (num_query_tokens of item QF)
    mem = seq * k_mem
    h = uc.num_attention_heads
    hd = d // h
    rows_q = b * q
    rows_m = b * mem
    per_layer = 2 * (
        rows_q * d * d * 4          # self qkv+o
        + b * h * q * q * hd * 2    # self scores+ctx
        + rows_q * d * d * 2        # cross q + o
        + rows_m * d * d * 2        # cross K/V over the memory  <-- dominant
        + b * h * q * mem * hd * 2  # cross scores+ctx
        + rows_q * d * i * 2        # FFN
    )
    head = 2 * b * (q * d) * (uc.num_item_tokens_to_predict * d)
    return (per_layer * uc.num_hidden_layers + head) / 1e9


def make_trainer(args, flash=False, fused=False, dtype="bfloat16"):
    from unirec_tpu.configs import (
        MeshConfig,
        OptimizerConfig,
        TrainConfig,
        UserQFormerConfig,
    )
    from unirec_tpu.train.user_qformer import UserQFormerTrainer

    uc = UserQFormerConfig(
        flash_training=flash,
        fused_training=fused,
        dropout=0.0 if (flash or fused) else 0.1,
    )
    return UserQFormerTrainer(
        uc,
        TrainConfig(batch_size=args.batch,
                    optimizer=OptimizerConfig(learning_rate=5e-5),
                    mesh=MeshConfig(dp=1, tp=1)),
        max_seq_len=args.seq,
        dtype=dtype,
    ), uc


def make_batch(rng, b, s, uc):
    k, d = 32, uc.input_embedding_dim
    return {
        "item_tokens": jnp.asarray(
            rng.randn(b, s, k, d).astype(np.float32) * 0.1),
        "timestamps": jnp.asarray(
            rng.randint(0, 1 << 30, (b, s)).astype(np.int32)),
        "coordinates": jnp.asarray(rng.randn(b, s, 2).astype(np.float32)),
        "seq_mask": jnp.ones((b, s), jnp.float32),
        "target_tokens": jnp.asarray(
            rng.randn(b, uc.num_item_tokens_to_predict, d).astype(np.float32)
            * 0.1),
    }


def time_full_step(trainer, batch, steps, label):
    state = trainer.init_state()
    step = trainer._train_step
    t0 = time.time()
    state, m = step(state, batch)
    float(m["loss"])
    print(f"{label} compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(steps):
        state, m = step(state, batch)
    float(m["loss"])
    dt = (time.time() - t0) / steps * 1000
    print(f"{label}: {dt:.1f} ms/step", flush=True)
    return dt, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seq", type=int, default=50)
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--skip-matrix", action="store_true")
    args = p.parse_args()

    trainer, uc = make_trainer(args)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, args.batch, args.seq, uc)

    e, state = time_full_step(trainer, batch, args.steps, "E full step (base)")
    params = state.params
    key = jax.random.key(0, impl="rbg")

    # A. sequence assembly alone
    seq_model, user_model = trainer.seq_model, trainer.user_model

    @jax.jit
    def assembly(sp, batch):
        flat, m = seq_model.apply(
            {"params": sp}, batch["item_tokens"], batch["timestamps"],
            batch["coordinates"], batch["seq_mask"])
        return flat.astype(jnp.float32).mean() + m.sum()

    a = bench(assembly, (params["sequence"], batch), args.steps,
              "A seq assembly fwd")

    # B. user qformer fwd on a precomputed memory
    flat, flat_mask = jax.jit(lambda sp, b: seq_model.apply(
        {"params": sp}, b["item_tokens"], b["timestamps"],
        b["coordinates"], b["seq_mask"]))(params["sequence"], batch)

    @jax.jit
    def qf_fwd(up, flat, mask, key):
        pred = user_model.apply({"params": up}, flat, mask,
                                deterministic=False, rngs={"dropout": key})
        return pred.astype(jnp.float32).mean()

    bm = bench(qf_fwd, (params["user"], flat, flat_mask, key), args.steps,
               "B user qformer fwd (dropout)")

    # C. full fwd + loss
    from unirec_tpu.ops.losses import mse_loss

    @jax.jit
    def full_fwd(p, batch, key):
        flat, mask = seq_model.apply(
            {"params": p["sequence"]}, batch["item_tokens"],
            batch["timestamps"], batch["coordinates"], batch["seq_mask"])
        pred = user_model.apply({"params": p["user"]}, flat, mask,
                                deterministic=False, rngs={"dropout": key})
        return mse_loss(pred, batch["target_tokens"])

    c = bench(full_fwd, (params, batch, key), args.steps, "C full fwd+loss")

    # D. fwd+bwd
    @jax.jit
    def fwd_bwd(p, batch, key):
        loss, grads = jax.value_and_grad(
            lambda pp: full_fwd.__wrapped__(pp, batch, key))(p)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree_util.tree_leaves(grads))
        return loss, gn

    d = bench(fwd_bwd, (params, batch, key), args.steps, "D fwd+bwd")

    gf = step_gflops(uc, args.batch, args.seq)
    print(f"\nsummary batch={args.batch} seq={args.seq}:")
    print(f"  A assembly {a:.1f} | B qformer {bm:.1f} | C fwd {c:.1f} "
          f"(glue {c-a-bm:+.1f}) | D fwd+bwd {d:.1f} (bwd {d-c:+.1f}) | "
          f"E step {e:.1f} (opt {e-d:+.1f})")
    print(f"  GEMM audit: {gf:.0f} GFLOP fwd -> {gf/BF16_RATE:.1f} ms floor"
          f" @ {BF16_RATE:.0f} TFLOP/s -> fwd at {gf/BF16_RATE/c*100:.0f}%"
          f" of floor; fwd+bwd floor ~{3*gf/BF16_RATE:.1f} ms -> "
          f"{3*gf/BF16_RATE/d*100:.0f}%")

    if not args.skip_matrix:
        print("\nconfig matrix (full step, same grant):", flush=True)
        for flash, fused, label in [
            (True, False, "flash cross"),
            (False, True, "fused self"),
            (True, True, "flash+fused"),
        ]:
            t2, _ = make_trainer(args, flash=flash, fused=fused)
            time_full_step(t2, batch, args.steps, f"E {label}")


if __name__ == "__main__":
    main()
