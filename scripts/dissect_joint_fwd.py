"""Second-level attribution of the joint decoder fwd/bwd gap (VERDICT r4 #2).

dissect_joint.py measured (batch 8, seq 512, flash-VJP, no-remat,
bf16-base): decoder fwd 43.2 ms vs a 23.8 ms same-grant GEMM floor (55%),
backward 62.0 ms vs ~24.3 (39%).  This probe attributes the gap inside ONE
chip grant by ablating one suspect at a time:

  fwd variants (all non-deterministic unless noted):
    control      — shipped config (LoRA r16 dropout .1, custom flash VJP)
    lora_nodrop  — LoRA dropout 0 (196 [rows,D] masks/step removed)
    nolora       — lora=None (392 narrow-N matmuls removed)
    xla_attn     — flash_vjp off (XLA GQA attention, probs in HBM)
    det          — deterministic (all dropout off; dispatches stock flash)

  bwd variants (fwd+bwd, grads via lora_trainable_mask):
    control / lora_nodrop / dx_only (lora=None, grads w.r.t. inputs_embeds
    — the pure frozen-base dx + flash-bwd chain)

  plus: Q-Former fwd+bwd alone (its params are FULLY trainable in the
  joint step and its backward is absent from dissect_joint's bwd floor),
  and the optimizer byte-floor for the E-D = 10.1 ms slice.

Reference hot loop: training/train_item_individual_token_joint.py:477-498.

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/dissect_joint_fwd.py
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
    t0 = time.time()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    print(f"  {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    dt = (time.time() - t0) / steps * 1000
    print(f"  {label}: {dt:.1f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps", type=int, default=15)
    args = p.parse_args()

    import dataclasses

    from unirec_tpu.configs import (
        ItemQFormerConfig,
        LoRAConfig,
        Qwen3Config,
    )
    from unirec_tpu.models.item_qformer import ItemQFormer
    from unirec_tpu.models.qwen3 import Qwen3Model
    from unirec_tpu.utils.params import lora_trainable_mask

    qwen = Qwen3Config(flash_vjp_attention=True)
    lora = LoRAConfig()
    b, l = args.batch, args.seq
    d = qwen.hidden_size
    key = jax.random.key(0, impl="rbg")

    decoder = Qwen3Model(qwen, lora=lora, n_extra_tokens=20,
                         dtype=jnp.bfloat16)
    rngp = jax.random.PRNGKey(0)
    embeds = (jax.random.normal(rngp, (b, l, d), jnp.float32) * 0.02
              ).astype(jnp.bfloat16)
    mask = jnp.ones((b, l), jnp.float32)
    params = decoder.init(rngp, inputs_embeds=embeds, attention_mask=mask)[
        "params"]

    variants = {
        "control": (lora, True),
        "lora_nodrop": (dataclasses.replace(lora, dropout=0.0), True),
        "nolora": (None, True),
        "xla_attn": (lora, False),
    }
    fwd_ms = {}
    for name, (lcfg, flash) in variants.items():
        cfg = dataclasses.replace(qwen, flash_vjp_attention=flash,
                                  flash_attention=flash)
        dec = Qwen3Model(cfg, lora=lcfg, n_extra_tokens=20,
                         dtype=jnp.bfloat16)

        def fwd(bp, embeds, mask, key, _dec=dec):
            out = _dec.apply({"params": bp}, inputs_embeds=embeds,
                             attention_mask=mask, deterministic=False,
                             rngs={"dropout": key})
            return out.astype(jnp.float32).mean()

        fwd_ms[name] = bench(jax.jit(fwd), (params, embeds, mask, key),
                             args.steps, f"fwd {name}")

    def det_fwd(bp, embeds, mask):
        out = decoder.apply({"params": bp}, inputs_embeds=embeds,
                            attention_mask=mask, deterministic=True)
        return out.astype(jnp.float32).mean()

    fwd_ms["det"] = bench(jax.jit(det_fwd), (params, embeds, mask),
                          args.steps, "fwd det")

    # -- backward variants ---------------------------------------------------
    def make_fwd_bwd(dec):
        def fwd_bwd(bp, embeds, mask, key):
            def loss_fn(bp):
                m = lora_trainable_mask(bp)
                bp = jax.tree_util.tree_map(
                    lambda x, t: x if t else jax.lax.stop_gradient(x), bp, m)
                out = dec.apply({"params": bp}, inputs_embeds=embeds,
                                attention_mask=mask, deterministic=False,
                                rngs={"dropout": key})
                return out.astype(jnp.float32).mean()

            loss, grads = jax.value_and_grad(loss_fn)(bp)
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree_util.tree_leaves(grads))
            return loss, gn
        return fwd_bwd

    bwd_ms = {}
    bwd_ms["control"] = bench(jax.jit(make_fwd_bwd(decoder)),
                              (params, embeds, mask, key), args.steps,
                              "fwd+bwd control")
    dec_nd = Qwen3Model(qwen, lora=dataclasses.replace(lora, dropout=0.0),
                        n_extra_tokens=20, dtype=jnp.bfloat16)
    bwd_ms["lora_nodrop"] = bench(jax.jit(make_fwd_bwd(dec_nd)),
                                  (params, embeds, mask, key), args.steps,
                                  "fwd+bwd lora_nodrop")

    dec_nl = Qwen3Model(qwen, lora=None, n_extra_tokens=20,
                        dtype=jnp.bfloat16)

    def dx_only(bp, embeds, mask, key):
        def loss_fn(e):
            out = dec_nl.apply({"params": bp}, inputs_embeds=e,
                               attention_mask=mask, deterministic=False,
                               rngs={"dropout": key})
            return out.astype(jnp.float32).mean()

        loss, g = jax.value_and_grad(loss_fn)(embeds)
        return loss, jnp.sum(jnp.square(g.astype(jnp.float32)))

    bwd_ms["dx_only"] = bench(jax.jit(dx_only), (params, embeds, mask, key),
                              args.steps, "fwd+bwd dx_only (nolora)")

    # -- Q-Former fwd+bwd (fully trainable in the joint step) ---------------
    qf = ItemQFormerConfig(num_query_tokens=2)
    qformer = ItemQFormer(qf, dtype=jnp.bfloat16)
    fields = jax.random.normal(rngp, (b * 10, qf.num_fields,
                                      qf.field_embedding_dim), jnp.float32)
    fmask = jnp.ones((b * 10, qf.num_fields), jnp.float32)
    qp = qformer.init(rngp, fields, fmask)["params"]

    def qf_fwd(qp, fields, fmask, key):
        out = qformer.apply({"params": qp}, fields, fmask,
                            deterministic=False, rngs={"dropout": key})
        return out["query_outputs"].astype(jnp.float32).mean()

    qf_f = bench(jax.jit(qf_fwd), (qp, fields, fmask, key), args.steps,
                 "qformer fwd")

    def qf_fwd_bwd(qp, fields, fmask, key):
        loss, grads = jax.value_and_grad(
            lambda q: qf_fwd(q, fields, fmask, key))(qp)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree_util.tree_leaves(grads))
        return loss, gn

    qf_fb = bench(jax.jit(qf_fwd_bwd), (qp, fields, fmask, key), args.steps,
                  "qformer fwd+bwd")

    # -- optimizer byte floor ------------------------------------------------
    n_qf = sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(qp))
    mask_tree = lora_trainable_mask(params)
    n_lora = sum(int(np.prod(x.shape))
                 for x, t in zip(jax.tree_util.tree_leaves(params),
                                 jax.tree_util.tree_leaves(mask_tree)) if t)
    n_train = n_qf + n_lora
    # AdamW fp32: read p,m,v + grad, write p,m,v = 7 passes; + 2 grad-norm
    opt_bytes = n_train * 4 * 9
    print(f"\ntrainables: qformer {n_qf/1e6:.1f}M + decoder-side "
          f"{n_lora/1e6:.1f}M = {n_train/1e6:.1f}M"
          f" -> optimizer byte floor ~{opt_bytes/819e9*1e3:.1f} ms"
          f" @ 819 GB/s HBM", flush=True)

    print(f"\nsummary batch={b} seq={l}:")
    c = fwd_ms["control"]
    print("  fwd: " + " | ".join(
        f"{k} {v:.1f}" for k, v in fwd_ms.items()))
    print(f"    lora-dropout cost {c - fwd_ms['lora_nodrop']:+.1f} | "
          f"lora total {c - fwd_ms['nolora']:+.1f} | "
          f"flash-vs-xla {fwd_ms['xla_attn'] - c:+.1f} | "
          f"all-dropout {c - fwd_ms['det']:+.1f}")
    bc = bwd_ms["control"]
    print("  fwd+bwd: " + " | ".join(
        f"{k} {v:.1f}" for k, v in bwd_ms.items()))
    print(f"    bwd-side lora-dropout {bc - bwd_ms['lora_nodrop'] - (c - fwd_ms['lora_nodrop']):+.1f}"
          f" | lora bwd total {bc - bwd_ms['dx_only'] - (c - fwd_ms['nolora']):+.1f}")
    print(f"  qformer: fwd {qf_f:.1f} | fwd+bwd {qf_fb:.1f} "
          f"(bwd {qf_fb - qf_f:+.1f})")


if __name__ == "__main__":
    main()
