"""Why does recommend_submit take ~0.83 s in the HTTP dispatcher?

Round-8: the HTTP path measures submit_s ~0.83 s/batch independent of
client count, while the direct recommend path amortizes to ~0.12 s/batch.
This probe reproduces the dispatcher's exact call pattern in-process, no
HTTP, and times each phase:

  A. solo loop:       submit(batch16); finalize  — sequential
  B. pipelined pair:  submit N+1 while a settler thread finalizes N
  C. submit internals: _build_batch_rows / fwd dispatch / retrieve
     dispatch, each timed separately (no sync in between)

If A's submit is already ~0.8 s, the dispatch itself blocks (axon tunnel
in-flight limit / synchronous transfer); if only B's is, the two JAX
threads interfere.
"""

import os
import sys
import threading
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
    jc = JointModelConfig(max_length=512)

    rng = np.random.RandomState(0)
    n = 20000
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
    item_dict = {iid: {"title": f"Product {k} title"}
                 for k, iid in enumerate(item_ids)}
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
    rec = Recommender(model, params, tok, item_dict, cache, catalog,
                      batch_size=16, precision="int8", merge_lora=True)
    rec.prewarm_prompts()

    hot = n // 20
    def mk_batch(seed):
        r = np.random.RandomState(seed)
        return [
            [item_ids[r.randint(0, hot)]
             for _ in range(r.randint(1, jc.num_history_items + 1))]
            for _ in range(16)
        ]

    t0 = time.time()
    rec.recommend(mk_batch(0), k=10)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    # A: solo sequential loop
    print("A: sequential submit/finalize", flush=True)
    for it in range(6):
        b = mk_batch(100 + it)
        t0 = time.time()
        h = rec.recommend_submit(b, k=10)
        t_sub = time.time() - t0
        t0 = time.time()
        rec.recommend_finalize(h)
        t_fin = time.time() - t0
        print(f"  submit {t_sub:.3f}s  finalize {t_fin:.3f}s", flush=True)

    # B: two-stage (settler thread finalizes while main submits next)
    print("B: pipelined submit with settler thread", flush=True)
    import queue as _q
    sq: "_q.Queue" = _q.Queue(maxsize=1)
    done = []

    def settler():
        while True:
            item = sq.get()
            if item is None:
                return
            t0 = time.time()
            rec.recommend_finalize(item)
            done.append(time.time() - t0)

    st = threading.Thread(target=settler)
    st.start()
    t_all = time.time()
    for it in range(6):
        b = mk_batch(200 + it)
        t0 = time.time()
        h = rec.recommend_submit(b, k=10)
        t_sub = time.time() - t0
        sq.put(h)
        print(f"  submit {t_sub:.3f}s", flush=True)
    sq.put(None)
    st.join()
    span = time.time() - t_all
    print(f"  B total: {span:.2f}s for 96 users = {96/span:.1f} users/s; "
          f"finalize times {[f'{d:.3f}' for d in done]}", flush=True)

    # C: submit internals
    print("C: submit internals (no syncs)", flush=True)
    for it in range(3):
        b = mk_batch(300 + it)
        t0 = time.time()
        ids, lengths, rows = rec._build_batch_rows(b)
        t_asm = time.time() - t0
        t0 = time.time()
        emb = rec._fwd_rows(rec.params, jnp.asarray(ids),
                            jnp.asarray(lengths), jnp.asarray(rows))
        t_fwd = time.time() - t0
        t0 = time.time()
        users_dev = emb.astype(jnp.float32)
        s, ix = rec._retrieve(users_dev, 20)
        t_ret = time.time() - t0
        t0 = time.time()
        float(s[0, 0])
        t_sync = time.time() - t0
        print(f"  assemble {t_asm:.3f}s  fwd-dispatch {t_fwd:.3f}s  "
              f"retrieve-dispatch {t_ret:.3f}s  sync-wait {t_sync:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
