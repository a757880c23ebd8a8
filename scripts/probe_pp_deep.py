"""pp at a DEEPER-THAN-HBM backbone (VERDICT r4 #6).

probe_pp_production.py validates pp=4 at Qwen3-0.6B — a scale where dp/tp
suffice and the replicated embedding table dominates.  This probes pp at
the configuration the axis exists for: a Qwen3-4B-class layer stack
(36 layers x d 2560, GQA 32q/8kv, inter 9728 — ~101M params/layer, **14.6
GB of fp32 layer params alone**, just under one v5e's 16 GB before
embeddings/activations/optimizer even enter).  Per-stage parameter bytes
are measured from the actual sharded arrays, and one full joint train step
runs to a finite loss at pp=4 and pp=8 on the virtual CPU mesh.

The vocab is shrunk to 32k (embeddings replicate across stages either way;
the LAYER stack is the memory claim under test — the production-vocab
replication cost is probe_pp_production.py's subject).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/probe_pp_deep.py [--pp 4,8]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def stage_bytes(tree):
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        shard = leaf.addressable_shards[0]
        total += shard.data.nbytes
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pp", default="4,8")
    ap.add_argument("--layers", type=int, default=36)
    ap.add_argument("--microbatches", type=int, default=2)
    args = ap.parse_args()

    from unirec_tpu.configs import (
        ItemQFormerConfig,
        JointModelConfig,
        LoRAConfig,
        MeshConfig,
        OptimizerConfig,
        Qwen3Config,
        TrainConfig,
    )
    from unirec_tpu.train.joint import JointTrainer, PipelinedJointTrainer

    # Qwen3-4B-class decoder (hidden/heads/inter per the public 4B config;
    # vocab shrunk — see module docstring)
    qwen = Qwen3Config(
        vocab_size=32768, hidden_size=2560, intermediate_size=9728,
        num_hidden_layers=args.layers, num_attention_heads=32,
        num_key_value_heads=8, head_dim=128, flash_attention=False,
    )
    qf = ItemQFormerConfig(
        num_query_tokens=2, hidden_size=2560, num_hidden_layers=2,
        num_attention_heads=16, intermediate_size=4096,
    )
    jc = JointModelConfig(max_length=64)
    tc = TrainConfig(batch_size=2, optimizer=OptimizerConfig(),
                     mesh=MeshConfig(dp=1, tp=1))
    # fp32 params (no bf16_base): the deeper-than-HBM claim is about the
    # full-precision layer stack; dtype bf16 keeps activations cheap
    trainer = JointTrainer(qwen, qf, jc, lora=LoRAConfig(), train_config=tc,
                           dtype="bfloat16", remat=True, remat_policy="dots")
    t0 = time.time()
    state = trainer.init_state()
    print(f"init(4B-class, {args.layers} layers): {time.time()-t0:.1f}s",
          flush=True)

    n_layer_params = sum(
        int(np.prod(x.shape))
        for p, x in jax.tree_util.tree_flatten_with_path(
            state.params["base_model"])[0]
        if any("layers_" in str(k) for k in p)
    )
    print(f"layer-stack params: {n_layer_params/1e9:.2f}B "
          f"= {n_layer_params*4/1e9:.1f} GB fp32 "
          f"(one v5e HBM = 16 GB)", flush=True)

    rng = np.random.RandomState(0)
    b, s = tc.batch_size, jc.max_length
    ids = rng.randint(1, 1000, (b, s)).astype(np.int32)
    ids[:, 10:30] = (qwen.vocab_size + np.arange(20))[None, :]
    batch_np = {
        "input_ids": ids,
        "attention_mask": np.ones((b, s), np.float32),
        "history_field_embeddings": rng.randn(
            b, jc.num_history_items, qf.num_fields,
            qf.field_embedding_dim).astype(np.float32),
        "history_attention_mask": np.ones(
            (b, jc.num_history_items, qf.num_fields), np.float32),
        "positive_item_embeddings": rng.randn(
            b, qwen.hidden_size).astype(np.float32),
        "negative_item_embeddings": rng.randn(
            b, 3, qwen.hidden_size).astype(np.float32),
        "negative_masks": np.ones((b, 3), np.float32),
    }

    from unirec_tpu.parallel.mesh import shard_batch

    for pp in [int(x) for x in args.pp.split(",")]:
        ptrainer = PipelinedJointTrainer(
            trainer, pp=pp, num_microbatches=args.microbatches)
        trainable, opt_state, tx = ptrainer.init_trainable(state)
        st = stage_bytes(trainable["stacked"])
        rest = (stage_bytes(trainable["rest"])
                + stage_bytes(trainable["qformer"]))
        print(f"pp={pp}: per-stage layer params {st/1e9:.2f} GB "
              f"(unsharded {st*pp/1e9:.2f} GB), replicated rest+qformer "
              f"{rest/1e9:.2f} GB, per-device total {(st+rest)/1e9:.2f} GB"
              f" -> {'FITS' if st+rest < 16e9 else 'EXCEEDS'} one 16 GB chip",
              flush=True)
        step = ptrainer._make_step(tx)
        batch = shard_batch(ptrainer.mesh, {
            k: jnp.asarray(v) for k, v in batch_np.items()})
        t0 = time.time()
        trainable, opt_state, loss_dev = step(trainable, opt_state, 0, batch)
        loss = float(loss_dev)
        print(f"pp={pp} deep train step: compile+run {time.time()-t0:.1f}s "
              f"loss={loss:.4f} finite={np.isfinite(loss)}", flush=True)
        assert np.isfinite(loss)
        del trainable, opt_state, step
    print("OK")


if __name__ == "__main__":
    main()
