"""Dissect the joint (Qwen3+LoRA+Q-Former) train step on the real TPU.

VERDICT r4 #2: the joint step (117.5 ms exact / 108.9 int8-base @ batch 8,
flash-VJP no-remat — BASELINE.md) has never had the item-stage treatment
(scripts/dissect_item.py).  Break it into components, each timed in ONE
process/grant, and compare the GEMM-dominated slices against an analytic
floor at the same-grant demonstrated bf16 rate (~165 TFLOP/s, the
frozen-base scan measurement of BASELINE.md round 8):

  A. Q-Former fwd alone (dropout on) — [B*H, F, D] item encoding
  B. Qwen3 decoder fwd alone (dropout on, flash-VJP layout)
  C. full joint fwd (A + B + injection + pooling + loss)
  D. full fwd+bwd (value_and_grad over the trainables)
  E. full shipped train step (optimizer included)

Derived: injection/pool/loss glue = C - A - B, backward = D - C,
optimizer/apply = E - D.

Reference hot loop this dissects:
/root/reference/training/train_item_individual_token_joint.py:477-498.

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/dissect_joint.py \
      [--batch 8] [--int8-base] [--steps 15]
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

BF16_RATE = 165.0  # TFLOP/s, same-grant demonstrated (BASELINE.md round 8)


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


def decoder_gflops(qwen, lora_r, b, l):
    """Analytic GEMM GFLOP of one decoder forward (base + LoRA + attn)."""
    rows = b * l
    d = qwen.hidden_size
    q = qwen.q_size
    kv = qwen.num_key_value_heads * qwen.head_dim
    i = qwen.intermediate_size
    per_layer = 2 * rows * (
        d * (q + 2 * kv)      # qkv
        + q * d               # o
        + d * 2 * i           # gate+up
        + i * d               # down
    )
    # LoRA overlays on all 7 projections
    per_layer += 2 * rows * lora_r * (
        (d + q) + (d + kv) * 2 + (q + d) + (d + i) * 2 + (i + d)
    )
    # attention scores+ctx; causal flash computes ~half the blocks
    attn = 2 * b * qwen.num_attention_heads * l * l * qwen.head_dim * 2 * 0.5
    return (per_layer + attn) * qwen.num_hidden_layers / 1e9, attn * \
        qwen.num_hidden_layers / 1e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--int8-base", action="store_true")
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
    from unirec_tpu.models.item_qformer import ItemQFormer
    from unirec_tpu.models.qwen3 import Qwen3Model
    from unirec_tpu.train.joint import JointTrainer

    qwen = Qwen3Config(flash_vjp_attention=True)
    qf = ItemQFormerConfig(num_query_tokens=2)
    jc = JointModelConfig(max_length=args.seq)
    lora = LoRAConfig()
    trainer = JointTrainer(
        qwen, qf, jc, lora=lora,
        train_config=TrainConfig(
            batch_size=args.batch,
            optimizer=OptimizerConfig(learning_rate=1e-4, warmup_steps=20,
                                      max_grad_norm=1.0),
            mesh=MeshConfig(dp=1, tp=1),
        ),
        dtype="bfloat16", remat=False, bf16_base=True,
        int8_base=args.int8_base,
    )
    state = trainer.init_state()
    model = trainer.model
    qwen = trainer.qwen_config  # post int8_fused replace

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
    params = state.params
    qweights = trainer.qweights  # None unless int8_base
    key = jax.random.key(0, impl="rbg")

    # A. Q-Former fwd alone (the in-joint item encoding)
    qformer = ItemQFormer(qf, dtype=jnp.bfloat16)
    flat_fields = batch["history_field_embeddings"].reshape(
        b * jc.num_history_items, qf.num_fields, qf.field_embedding_dim)
    flat_mask = batch["history_attention_mask"].reshape(
        b * jc.num_history_items, qf.num_fields)

    @jax.jit
    def qf_fwd(qp, fields, mask, key):
        out = qformer.apply({"params": qp}, fields, mask,
                            deterministic=False, rngs={"dropout": key})
        return out["query_outputs"].astype(jnp.float32).mean()

    a = bench(qf_fwd, (params["qformer"], flat_fields, flat_mask, key),
              args.steps, "A qformer fwd (dropout)")

    # B. decoder fwd alone (flash-VJP layout, LoRA on, dropout rng live)
    decoder = Qwen3Model(
        qwen, lora=lora, n_extra_tokens=model.num_special_tokens,
        dtype=jnp.bfloat16)
    embeds = jnp.asarray(
        rng.randn(b, l, qwen.hidden_size).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)

    @jax.jit
    def dec_fwd(bp, qw, embeds, mask, key):
        variables = {"params": bp}
        if qw is not None:
            variables["qweights"] = qw["base_model"]
        out = decoder.apply(variables, inputs_embeds=embeds,
                            attention_mask=mask, deterministic=False,
                            rngs={"dropout": key})
        return out.astype(jnp.float32).mean()

    bb = bench(
        dec_fwd,
        (params["base_model"], qweights, embeds, batch["attention_mask"],
         key),
        args.steps, "B decoder fwd (dropout)")

    # C. full joint fwd
    from unirec_tpu.ops.losses import info_nce_loss

    @jax.jit
    def joint_fwd(p, qw, batch, key):
        variables = {"params": p}
        if qw is not None:
            variables["qweights"] = qw
        user = model.apply(
            variables, batch["input_ids"], batch["attention_mask"],
            batch["history_field_embeddings"],
            batch["history_attention_mask"],
            deterministic=False, rngs={"dropout": key})
        return info_nce_loss(
            user, batch["positive_item_embeddings"],
            batch["negative_item_embeddings"], batch["negative_masks"],
            0.07)

    c = bench(joint_fwd, (params, qweights, batch, key), args.steps,
              "C joint fwd+loss (dropout)")

    # D. fwd+bwd (trainables only, like the shipped step)
    from unirec_tpu.utils.params import lora_trainable_mask

    @jax.jit
    def fwd_bwd(p, qw, batch, key):
        def loss_fn(p):
            mask = lora_trainable_mask(p)
            p = jax.tree_util.tree_map(
                lambda x, t: x if t else jax.lax.stop_gradient(x), p, mask)
            variables = {"params": p}
            if qw is not None:
                variables["qweights"] = qw
            user = model.apply(
                variables, batch["input_ids"], batch["attention_mask"],
                batch["history_field_embeddings"],
                batch["history_attention_mask"],
                deterministic=False, rngs={"dropout": key})
            return info_nce_loss(
                user, batch["positive_item_embeddings"],
                batch["negative_item_embeddings"], batch["negative_masks"],
                0.07)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree_util.tree_leaves(grads))
        return loss, gn

    d = bench(fwd_bwd, (params, qweights, batch, key), args.steps,
              "D joint fwd+bwd")

    # E. full shipped step
    step = trainer._train_step
    state2, m = step(state, batch)
    float(m["loss"])
    t0 = time.time()
    for _ in range(args.steps):
        state2, m = step(state2, batch)
    float(m["loss"])
    e = (time.time() - t0) / args.steps * 1000
    print(f"E full step: {e:.1f} ms", flush=True)

    gf_dec, gf_attn = decoder_gflops(qwen, lora.r, b, l)
    floor_fwd = gf_dec / BF16_RATE
    print(f"\nsummary batch={b} seq={l} int8_base={args.int8_base} "
          f"int8_fused={trainer.int8_fused}:")
    print(f"  A qformer {a:.1f} | B decoder {bb:.1f} | C full fwd {c:.1f} "
          f"(glue C-A-B {c-a-bb:+.1f})")
    print(f"  D fwd+bwd {d:.1f} (bwd {d-c:+.1f}) | E step {e:.1f} "
          f"(optimizer+apply {e-d:+.1f})")
    print(f"  decoder GEMM audit: {gf_dec:.0f} GFLOP fwd (attn {gf_attn:.0f})"
          f" -> {floor_fwd:.1f} ms floor @ {BF16_RATE:.0f} TFLOP/s bf16"
          f" -> B at {floor_fwd/bb*100:.0f}% of floor")
    # backward: frozen base dx only (~1x fwd GEMM), lora dx+dW, flash
    # recompute ~1.3x attn
    floor_bwd = (gf_dec + 0.3 * gf_attn) / BF16_RATE
    print(f"  bwd floor ~{floor_bwd:.1f} ms -> bwd at "
          f"{floor_bwd/max(d-c,1e-9)*100:.0f}% of floor")


if __name__ == "__main__":
    main()
