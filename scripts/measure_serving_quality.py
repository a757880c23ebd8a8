"""Quality gate for the serving user-embedding paths vs the fp32 forward.

Measures per-user cosine similarity of `Recommender.encode_users` output
for each serving mode against the strict fp32 XLA forward at the
production config (Qwen3-0.6B, seq 512, random-init weights — weights'
statistics, not their values, drive quantization error):

    bf16            (library default)
    int8 XLA        (per-projection dots, fused_blocks=False)
    int8 fused      (ops/fused_qwen3_int8.py kernels, the serving default)

Gate: per-user cosine >= 0.999 for int8 modes (the same bar as the item
engine's gate in scripts/measure_int8_quality.py).  Run on the real chip;
re-measure whenever the Qwen3 serving kernels change.

Usage: python scripts/measure_serving_quality.py [--users 64] [--batch 16]
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

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--catalog", type=int, default=2000)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    if args.tiny:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from unirec_tpu.configs import (
        ItemQFormerConfig,
        JointModelConfig,
        LoRAConfig,
        Qwen3Config,
        tiny_qwen3_config,
    )
    from unirec_tpu.data.cache import FieldEmbeddingCache
    from unirec_tpu.data.tokenizer import HashTokenizer
    from unirec_tpu.models.joint import MultiModalQwenEmbedding
    from unirec_tpu.serving.recommender import Recommender

    if args.tiny:
        qwen = tiny_qwen3_config(
            hidden_size=128, intermediate_size=256, num_attention_heads=1,
            num_key_value_heads=1, head_dim=128, max_position_embeddings=64,
            flash_attention=False,
        )
        qf = ItemQFormerConfig(
            hidden_size=128, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, num_query_tokens=2, field_embedding_dim=16,
            num_fields=3, dropout=0.0,
        )
        jc = JointModelConfig(max_length=64)
        args.catalog = min(args.catalog, 200)
        args.batch = 8  # 8 * 64 = 512 rows: the fused tile
    else:
        qwen = Qwen3Config()
        qf = ItemQFormerConfig(num_query_tokens=2)
        jc = JointModelConfig(max_length=args.seq)

    rng = np.random.RandomState(0)
    n = args.catalog
    item_ids = ["B%08d" % k for k in range(n)]
    cache = FieldEmbeddingCache(
        embeddings=rng.randn(n, qf.num_fields, qf.field_embedding_dim)
        .astype(np.float32),
        masks=np.ones((n, qf.num_fields), np.float32),
        fields=[f"f{j}" for j in range(qf.num_fields)],
        item_ids=item_ids,
    )
    catalog = {iid: rng.randn(qwen.hidden_size).astype(np.float32)
               for iid in item_ids}
    item_dict = {iid: {"title": f"Product {k} with a catalog title"}
                 for k, iid in enumerate(item_ids)}
    tok = HashTokenizer(qwen.vocab_size, jc.num_history_items,
                        jc.num_query_tokens_per_item)

    # fp32 oracle model; serving modes run their own precisions on clones
    model32 = MultiModalQwenEmbedding(qwen, qf, jc, lora=LoRAConfig(),
                                      dtype=jnp.float32)
    t0 = time.time()
    params = model32.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, jc.max_length), jnp.int32),
        jnp.ones((1, jc.max_length)),
        jnp.zeros((1, jc.num_history_items, qf.num_fields,
                   qf.field_embedding_dim)),
        jnp.ones((1, jc.num_history_items, qf.num_fields)),
    )
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    hists = []
    for u in range(args.users):
        h = rng.randint(1, 8)
        hists.append(["B%08d" % rng.randint(0, n) for _ in range(h)])

    def encode(label, model, **kw):
        rec = Recommender(model, params, tok, item_dict, cache, catalog,
                          batch_size=args.batch, **kw)
        t0 = time.time()
        out = np.asarray(rec.encode_users(hists), np.float32)
        print(f"  {label}: encoded in {time.time()-t0:.1f}s", flush=True)
        return out

    ref = encode("fp32 oracle", model32)
    model_bf16 = MultiModalQwenEmbedding(qwen, qf, jc, lora=LoRAConfig(),
                                         dtype=jnp.bfloat16)
    results = {
        "bf16": encode("bf16", model_bf16),
        "int8_xla": encode("int8 XLA dots", model_bf16, precision="int8",
                           fused_blocks=False),
        "int8_fused": encode("int8 fused blocks", model_bf16,
                             precision="int8", merge_lora=True),
    }
    ok = True
    for label, emb in results.items():
        cos = (emb * ref).sum(-1) / (
            np.linalg.norm(emb, axis=-1) * np.linalg.norm(ref, axis=-1)
            + 1e-9
        )
        gate = 0.999 if label.startswith("int8") else 0.9995
        status = "OK" if cos.min() >= gate else "FAIL"
        ok &= cos.min() >= gate
        print(f"{label}: cosine mean {cos.mean():.5f} min {cos.min():.5f} "
              f"(gate {gate}) {status}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
