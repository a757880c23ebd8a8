"""Split the serving `recommend` path into timed phases on the real TPU.

Round-8 found direct warm `recommend` at 51 users/s (was 103 in round 5)
while the encode-only path hit 131.8 — the regression is AFTER encoding.
This probe times each phase separately at the production serving shape
(batch 16, catalog 20k, fetch k+H):

  encode   — _encode_user_chunks + device sync
  retrieve — _retrieve over all users + device sync
  finalize — recommend_finalize (host-side result assembly)
  e2e      — rec.recommend (the whole thing)

Same synthetic corpus as scripts/bench_serving.py.
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

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=96)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--catalog", type=int, default=20000)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--no-fused-blocks", action="store_true")
    args = p.parse_args()

    from unirec_tpu.configs import (
        ItemQFormerConfig,
        JointModelConfig,
        LoRAConfig,
        Qwen3Config,
    )
    from unirec_tpu.data.cache import FieldEmbeddingCache
    from unirec_tpu.data.tokenizer import HashTokenizer
    from unirec_tpu.models.joint import MultiModalQwenEmbedding
    from unirec_tpu.serving.recommender import Recommender

    qwen = Qwen3Config()
    qf = ItemQFormerConfig(num_query_tokens=2)
    jc = JointModelConfig(max_length=args.seq)

    rng = np.random.RandomState(0)
    n = args.catalog
    item_ids = [f"B{k:08d}" for k in range(n)]
    cache = FieldEmbeddingCache(
        embeddings=rng.randn(n, qf.num_fields, qf.field_embedding_dim).astype(
            np.float32),
        masks=np.ones((n, qf.num_fields), np.float32),
        fields=[f"f{j}" for j in range(qf.num_fields)],
        item_ids=item_ids,
    )
    catalog = {iid: rng.randn(qwen.hidden_size).astype(np.float32)
               for iid in item_ids}
    item_dict = {
        iid: {"title": f"Product {k} with a reasonably long catalog title"}
        for k, iid in enumerate(item_ids)
    }
    tok = HashTokenizer(qwen.vocab_size, jc.num_history_items,
                       jc.num_query_tokens_per_item)
    model = MultiModalQwenEmbedding(qwen, qf, jc, lora=LoRAConfig(),
                                    dtype=jnp.bfloat16)
    t0 = time.time()
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, jc.max_length), jnp.int32),
        jnp.ones((1, jc.max_length)),
        jnp.zeros((1, jc.num_history_items, qf.num_fields,
                   qf.field_embedding_dim)),
        jnp.ones((1, jc.num_history_items, qf.num_fields)),
    )
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    rec = Recommender(
        model, params, tok, item_dict, cache, catalog,
        batch_size=args.batch, precision="int8", merge_lora=True,
        fused_blocks=False if args.no_fused_blocks else None,
    )
    rec.prewarm_prompts()

    hot = max(1, n // 20)
    histories = [
        [item_ids[rng.randint(0, hot if rng.rand() < 0.8 else n)]
         for _ in range(rng.randint(1, jc.num_history_items + 1))]
        for _ in range(args.users)
    ]

    t0 = time.time()
    rec.recommend(histories[: args.batch], k=10)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    k = 10
    fetch = k + jc.num_history_items
    for it in range(args.passes):
        t0 = time.time()
        chunks = rec._encode_user_chunks(histories)
        users_dev = jnp.concatenate(
            [emb for emb, _ in chunks], axis=0).astype(jnp.float32)
        float(users_dev[0, 0])
        t_enc = time.time() - t0

        t0 = time.time()
        s, ix = rec._retrieve(users_dev, fetch)
        float(s[0, 0])
        t_ret = time.time() - t0

        t0 = time.time()
        handle = (s, ix, [nn for _, nn in chunks], histories, k, True)
        out = rec.recommend_finalize(handle)
        t_fin = time.time() - t0
        assert len(out) == args.users and len(out[0]) == k

        t0 = time.time()
        rec.recommend(histories, k=k)
        t_e2e = time.time() - t0
        print(
            f"pass {it}: encode {t_enc:.3f}s  retrieve {t_ret:.3f}s  "
            f"finalize {t_fin:.3f}s  | e2e {t_e2e:.3f}s "
            f"({args.users/t_e2e:.1f} users/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
