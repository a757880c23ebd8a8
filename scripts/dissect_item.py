"""Dissect the Item Q-Former train step on the real TPU.

Breaks the shipped step (batch 512, bf16 activations, int8 fused pos/neg
reference forwards — BASELINE.md round 3: 293.9 ms) into its components so
the gap to the roofline is attributable:

  A. anchor forward, deterministic
  B. anchor forward, dropout on (isolates RNG/dropout cost)
  C. anchor fwd+bwd (pos/neg reps held constant -> anchor compute only)
  D. pos+neg fused reference forwards alone (bf16 or int8)
  E. full shipped train step (trainer._train_step)

Usage: python scripts/dissect_item.py [--batch 512] [--ref int8|bf16]
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


def bench(fn, args, steps, label):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(x.reshape(-1)[0]) if hasattr(x, "reshape") else x, out
    )
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    # one scalar sync at the end (per-step float() costs ~34 ms RTT each
    # through the axon tunnel)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    dt = (time.time() - t0) / steps * 1000
    print(f"{label}: {dt:.1f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--ref", default="int8", choices=["bf16", "int8"])
    args = p.parse_args()

    from unirec_tpu.configs import (
        ItemQFormerConfig,
        MeshConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from unirec_tpu.ops.losses import item_qformer_loss
    from unirec_tpu.train.item_qformer import ItemQFormerTrainer

    cfg = ItemQFormerConfig()
    trainer = ItemQFormerTrainer(
        cfg,
        TrainConfig(batch_size=args.batch,
                    optimizer=OptimizerConfig(learning_rate=1e-4),
                    mesh=MeshConfig(dp=1, tp=1)),
        dtype="bfloat16",
        fused_reference_forwards=True,
        fused_precision=args.ref,
    )
    state = trainer.init_state()
    model = trainer.model

    rng = np.random.RandomState(0)
    b, f, d = args.batch, cfg.num_fields, cfg.field_embedding_dim
    mk = lambda: (jnp.asarray(rng.randn(b, f, d).astype(np.float32)),  # noqa
                  jnp.ones((b, f), jnp.float32))
    ae, am = mk()
    pe, pm = mk()
    ne, nm = mk()
    batch = {"anchor_emb": ae, "anchor_mask": am, "pos_emb": pe,
             "pos_mask": pm, "neg_emb": ne, "neg_mask": nm}
    params = jax.device_get(state.params)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # A. anchor forward, deterministic
    @jax.jit
    def fwd_det(params, emb, mask):
        out = model.apply({"params": params}, emb, mask)
        return (out["query_outputs"].astype(jnp.float32).mean()
                + out["reconstructed_fields"].astype(jnp.float32).mean()
                + out["item_representation"].astype(jnp.float32).mean())

    a = bench(fwd_det, (params, ae, am), args.steps, "A anchor fwd (det)")

    # B. anchor forward, dropout on (rbg bits, like the shipped step)
    key = jax.random.key(0, impl="rbg")

    @jax.jit
    def fwd_drop(params, emb, mask, key):
        out = model.apply({"params": params}, emb, mask,
                          deterministic=False, rngs={"dropout": key})
        return (out["query_outputs"].astype(jnp.float32).mean()
                + out["reconstructed_fields"].astype(jnp.float32).mean()
                + out["item_representation"].astype(jnp.float32).mean())

    bm = bench(fwd_drop, (params, ae, am, key), args.steps,
               "B anchor fwd (dropout)")

    # C. anchor fwd+bwd (pos/neg reps constant)
    pos_rep = jnp.asarray(rng.randn(b, cfg.hidden_size), jnp.float32)
    neg_rep = jnp.asarray(rng.randn(b, cfg.hidden_size), jnp.float32)

    @jax.jit
    def fwd_bwd(params, emb, mask, key, pos_rep, neg_rep):
        def loss_fn(p):
            anc = model.apply({"params": p}, emb, mask,
                              deterministic=False, rngs={"dropout": key})
            total, _, _ = item_qformer_loss(
                anc, emb, mask, pos_rep, neg_rep, 1.0, 0.25, 0.5)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree_util.tree_leaves(grads))
        return loss, gnorm

    c = bench(fwd_bwd, (params, ae, am, key, pos_rep, neg_rep), args.steps,
              "C anchor fwd+bwd (dropout)")

    # D. pos+neg fused reference forwards alone
    from unirec_tpu.inference.fused_qformer import (
        fused_qformer_forward,
        prepare_fused_params,
    )

    @jax.jit
    def refs(params, pe, pm, ne, nm):
        fp = prepare_fused_params({"params": params}, cfg,
                                  dtype=jnp.bfloat16, precision=args.ref)
        qp = fused_qformer_forward(fp, cfg, pe, pm, interpret=False)
        qn = fused_qformer_forward(fp, cfg, ne, nm, interpret=False)
        return (qp.astype(jnp.float32).mean()
                + qn.astype(jnp.float32).mean())

    dms = bench(refs, (params, pe, pm, ne, nm), args.steps,
                f"D pos+neg fused refs ({args.ref})")

    # E. full shipped step
    def full(state, batch):
        return trainer._train_step(state, batch)

    t0 = time.time()
    state, m = full(state, batch)
    float(m["loss"])
    print(f"E compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(args.steps):
        state, m = full(state, batch)
    float(m["loss"])
    e = (time.time() - t0) / args.steps * 1000
    print(f"E full step: {e:.1f} ms", flush=True)

    print(f"\nsummary batch={b} ref={args.ref}:")
    print(f"  fwd det {a:.1f} | fwd drop {bm:.1f} (dropout tax "
          f"{bm-a:+.1f}) | fwd+bwd {c:.1f} (bwd {c-bm:+.1f})")
    print(f"  refs {dms:.1f} | C+D {c+dms:.1f} | full {e:.1f} "
          f"(residual {e-c-dms:+.1f} = optimizer+loss glue+schedule)")


if __name__ == "__main__":
    main()
