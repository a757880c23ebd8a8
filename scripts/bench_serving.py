"""Benchmark end-to-end serving (Recommender.recommend) on the real TPU.

Reproduces the BASELINE.md round-2 "5b" configuration: production joint model
(Qwen3-0.6B + K=2 Q-Former), seq 512, top-10 over a 20k-item catalog, batch 16
— then measures the host-side pipeline (prompt tokenization, cache gathers,
batch assembly) overlapped with device compute.

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/bench_serving.py \
      [--users 128] [--batch 16] [--catalog 20000]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--catalog", type=int, default=20000)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--precision", default="bf16", choices=["bf16", "int8"])
    p.add_argument("--merge-lora", action="store_true",
                   help="fold LoRA into base kernels before serving")
    p.add_argument("--no-fused-blocks", action="store_true",
                   help="disable the fused int8 Qwen3 block kernels")
    p.add_argument("--freeze-heap", action="store_true",
                   help="gc.freeze() the post-warmup heap before the "
                        "measured passes (serving/host_tuning.py)")
    p.add_argument("--prewarm", action="store_true",
                   help="batch-tokenize all prompt fragments at startup")
    p.add_argument("--http-clients", type=int, default=0,
                   help="N concurrent HTTP clients through the micro-batched "
                        "server (0 = skip)")
    p.add_argument("--http-requests", type=int, default=8,
                   help="requests per client in the HTTP load test")
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

    rec = Recommender(model, params, tok, item_dict, cache, catalog,
                      batch_size=args.batch, precision=args.precision,
                      merge_lora=args.merge_lora,
                      fused_blocks=False if args.no_fused_blocks else None)
    if args.prewarm:
        t0 = time.time()
        n_frag = rec.prewarm_prompts()
        print(f"prewarm: {n_frag} fragments in {time.time()-t0:.1f}s",
              flush=True)

    # user histories: zipfian-ish sampling over the catalog (repeat-heavy,
    # like real traffic — exercises the fragment cache)
    hot = max(1, n // 20)
    histories = [
        [item_ids[rng.randint(0, hot if rng.rand() < 0.8 else n)]
         for _ in range(rng.randint(1, jc.num_history_items + 1))]
        for _ in range(args.users)
    ]

    t0 = time.time()
    out = rec.recommend(histories[: args.batch], k=10)
    print(f"compile+first batch: {time.time()-t0:.1f}s", flush=True)
    assert len(out) == args.batch and len(out[0]) == 10

    if args.freeze_heap:
        from unirec_tpu.serving.host_tuning import freeze_host_heap

        print(f"froze {freeze_host_heap()} heap objects", flush=True)

    # offline sweep path (the `users` CLI): encode_users only — no
    # retrieval, chunks drained to host as they leave the in-flight window
    for label in ("sweep-cold", "sweep-warm"):
        t0 = time.time()
        emb = rec.encode_users(histories)
        dt = time.time() - t0
        print(f"RESULT {label} users={len(histories)} batch={args.batch} "
              f"users_per_s={len(histories)/dt:.1f} total_s={dt:.2f} "
              f"dim={emb.shape[1]}", flush=True)

    # pass 1: fragment cache mostly cold (only the compile batch is cached);
    # pass 2: same histories -> fully warm (the steady state under real,
    # repeat-heavy traffic)
    for label, hs in (("cold-frags", histories), ("warm", histories[::-1])):
        t0 = time.time()
        out = rec.recommend(hs, k=10)
        dt = time.time() - t0
        print(
            f"RESULT {label} users={len(hs)} batch={args.batch} "
            f"catalog={n} users_per_s={len(hs)/dt:.1f} total_s={dt:.2f}",
            flush=True,
        )

    # host-side assembly alone (no device): the previous bottleneck
    t0 = time.time()
    for i in range(0, len(histories), args.batch):
        chunk = list(histories[i : i + args.batch])
        while len(chunk) < args.batch:
            chunk.append([])
        rec._build_batch(chunk)
    dt = time.time() - t0
    print(f"host assembly only: {len(histories)/dt:.1f} users/s", flush=True)

    if args.http_clients:
        import json
        import threading
        import urllib.request

        from unirec_tpu.serving.server import make_server

        server, batcher = make_server(rec, port=0, max_wait_ms=25.0)
        port = server.server_address[1]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        n_c, n_r = args.http_clients, args.http_requests
        errors = []

        # phase 0: direct batcher calls (no HTTP) — isolates the HTTP layer
        def direct_client(ci):
            r = np.random.RandomState(1000 + ci)
            for _ in range(n_r):
                h = [item_ids[r.randint(0, hot)]
                     for _ in range(r.randint(1, jc.num_history_items + 1))]
                out = batcher.recommend(h, k=10)
                assert len(out) == 10
        direct_client(0)  # warm
        b0, s0 = batcher.batches_run, batcher.requests_served
        t0 = time.time()
        dthreads = [threading.Thread(target=direct_client, args=(ci,))
                    for ci in range(n_c)]
        for th in dthreads: th.start()
        for th in dthreads: th.join()
        dt = time.time() - t0
        print(f"RESULT direct-batcher clients={n_c} reqs={n_c*n_r} "
              f"users_per_s={n_c*n_r/dt:.1f} "
              f"batches={batcher.batches_run-b0} "
              f"fill={(batcher.requests_served-s0)/max(batcher.batches_run-b0,1):.1f}",
              flush=True)

        latencies = []

        def client(ci):
            r = np.random.RandomState(ci)
            for _ in range(n_r):
                h = [item_ids[r.randint(0, hot)]
                     for _ in range(r.randint(1, jc.num_history_items + 1))]
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/recommend",
                    data=json.dumps({"history": h, "k": 10}).encode(),
                    method="POST",
                )
                t_req = time.time()
                with urllib.request.urlopen(req, timeout=120) as resp:
                    out = json.loads(resp.read())
                    assert len(out["items"]) == 10
                latencies.append(time.time() - t_req)

        # warm one round (compile/caches) before timing
        threads = [threading.Thread(target=lambda: client(999))]
        threads[0].start(); threads[0].join()
        latencies.clear()
        served0, batches0 = batcher.requests_served, batcher.batches_run
        def safe_client(ci):
            try:
                client(ci)
            except Exception as e:
                errors.append((ci, repr(e)))

        t0 = time.time()
        threads = [
            threading.Thread(target=safe_client, args=(ci,))
            for ci in range(n_c)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = time.time() - t0
        total = n_c * n_r
        served = batcher.requests_served - served0
        batches = batcher.batches_run - batches0
        lat = np.sort(np.asarray(latencies)) * 1000.0 if latencies else None
        pct = (
            f" p50_ms={lat[int(0.50*(len(lat)-1))]:.0f}"
            f" p95_ms={lat[int(0.95*(len(lat)-1))]:.0f}"
            f" p99_ms={lat[int(0.99*(len(lat)-1))]:.0f}"
            if lat is not None else ""
        )
        print(
            f"RESULT http clients={n_c} reqs={total} errors={len(errors)} "
            f"users_per_s={total/dt:.1f} batches={batches} "
            f"avg_batch_fill={served/max(batches,1):.1f}{pct}",
            flush=True,
        )
        server.shutdown()
        batcher.close()


if __name__ == "__main__":
    main()
