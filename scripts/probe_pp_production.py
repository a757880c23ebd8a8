"""pp=4 at the PRODUCTION 0.6B joint config (VERDICT r2 next #8).

pp>1 cannot run on the real hardware here (ONE v5e chip behind the
tunnel), so the memory claim is validated the only honest way available:
the full `train joint --pp 4` step at the REAL Qwen3-0.6B shapes on a
4(x dp)-device virtual CPU mesh — compile + one executed train step —
with the per-stage parameter bytes measured from the actual sharded
arrays rather than arithmetic.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
     python scripts/probe_pp_production.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
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

    pp = 4
    qwen = Qwen3Config(flash_attention=False)  # PRODUCTION 0.6B defaults
    qf = ItemQFormerConfig(num_query_tokens=2)  # production joint Q-Former
    jc = JointModelConfig(max_length=64)  # short seq: param memory is the claim
    tc = TrainConfig(batch_size=2, optimizer=OptimizerConfig(), 
                     mesh=MeshConfig(dp=1, tp=1))
    trainer = JointTrainer(qwen, qf, jc, lora=LoRAConfig(), train_config=tc,
                           dtype="bfloat16", remat=True,
                           remat_policy="dots", bf16_base=True)
    t0 = time.time()
    state = trainer.init_state()
    print(f"init(0.6B production): {time.time()-t0:.1f}s", flush=True)

    ptrainer = PipelinedJointTrainer(trainer, pp=pp, num_microbatches=2)
    trainable, opt_state, tx = ptrainer.init_trainable(state)
    del state

    # measured per-stage parameter bytes from the ACTUAL sharded arrays
    def stage_bytes(tree):
        total = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            shard = leaf.addressable_shards[0]
            total += shard.data.nbytes
        return total

    st = stage_bytes(trainable["stacked"])
    rest = stage_bytes(trainable["rest"]) + stage_bytes(trainable["qformer"])
    print(f"per-stage stacked-layer params: {st/1e9:.3f} GB; "
          f"replicated rest+qformer: {rest/1e9:.3f} GB; "
          f"per-device params total: {(st+rest)/1e9:.3f} GB "
          f"(vs unsharded layers {st*pp/1e9:.3f} GB)", flush=True)

    rng = np.random.RandomState(0)
    b, s = tc.batch_size, jc.max_length
    ids = rng.randint(1, 1000, (b, s)).astype(np.int32)
    spec = qwen.vocab_size + np.arange(20)
    ids[:, 10:30] = spec[None, :]
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), jnp.float32),
        "history_field_embeddings": jnp.asarray(
            rng.randn(b, jc.num_history_items, qf.num_fields,
                      qf.field_embedding_dim).astype(np.float32)),
        "history_attention_mask": jnp.ones(
            (b, jc.num_history_items, qf.num_fields), jnp.float32),
        "positive_item_embeddings": jnp.asarray(
            rng.randn(b, qwen.hidden_size).astype(np.float32)),
        "negative_item_embeddings": jnp.asarray(
            rng.randn(b, 3, qwen.hidden_size).astype(np.float32)),
        "negative_masks": jnp.ones((b, 3), jnp.float32),
    }
    from unirec_tpu.parallel.mesh import shard_batch

    step = ptrainer._make_step(tx)
    batch = shard_batch(ptrainer.mesh, batch)
    t0 = time.time()
    trainable, opt_state, loss_dev = step(trainable, opt_state, 0, batch)
    loss = float(loss_dev)
    print(f"pp={pp} production train step: compile+run {time.time()-t0:.1f}s "
          f"loss={loss:.4f} finite={np.isfinite(loss)}", flush=True)
    assert np.isfinite(loss)
    print("OK")


if __name__ == "__main__":
    main()
