"""HTTP serving throughput with OUT-OF-PROCESS load generation.

VERDICT r2 next #1: the round-4 in-process threaded load test measured the
client (GIL serialization with the server), not the server.  This harness
runs the real `serving/server.py` threaded micro-batched endpoint in this
process and drives it with N separate client PROCESSES
(scripts/http_load_client.py) — the load pattern production traffic actually
has.  If the 1-core host still caps throughput below the device ceiling, the
published breakdown (device-busy fraction from the dispatcher's own
accounting, client/server CPU seconds) is a measurement, not a conjecture.

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/bench_http_serving.py \
      [--clients 32] [--requests 32] [--precision int8] [--batch 16]
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def spawn_clients(port, n_clients, n_requests, catalog, hot, seed0):
    """Launch client processes synchronized to one start instant via a
    READY/GO handshake (interpreter spawn costs ~2s each on the 1-core
    host, so a precomputed start time can't synchronize them)."""
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "http_load_client.py"),
                "--port", str(port),
                "--requests", str(n_requests),
                "--seed", str(seed0 + ci),
                "--catalog", str(catalog),
                "--hot", str(hot),
                "--sync",
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for ci in range(n_clients)
    ]
    for p in procs:
        assert p.stdout.readline().strip() == b"READY"
    for p in procs:
        p.stdin.write(b"GO\n")
        p.stdin.flush()
    outs = []
    for p in procs:
        out, _ = p.communicate()
        outs.append(json.loads(out))
    return outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--requests", type=int, default=32,
                   help="requests per client in the measured phase")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--catalog", type=int, default=20000)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--precision", default="int8", choices=["bf16", "int8"])
    p.add_argument("--merge-lora", action="store_true",
                   help="fold LoRA into base kernels before serving")
    p.add_argument("--no-fused-blocks", action="store_true",
                   help="disable the fused int8 Qwen3 block kernels")
    p.add_argument("--max-wait-ms", type=float, default=25.0)
    p.add_argument("--max-queued", type=int, default=None,
                   help="admission bound (requests); default 2x batch")
    p.add_argument("--modes", default="pipe,nopipe",
                   help="comma list of dispatcher modes to A/B in one "
                        "process (same chip session + warm compile cache): "
                        "pipe | nopipe")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + CPU platform: validates the harness "
                        "mechanics without the chip")
    args = p.parse_args()

    if args.tiny:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

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
    from unirec_tpu.serving.server import make_server

    if args.tiny:
        qwen = tiny_qwen3_config()
        qf = ItemQFormerConfig(num_query_tokens=2, hidden_size=64,
                               num_hidden_layers=2, num_attention_heads=4,
                               intermediate_size=128)
        jc = JointModelConfig(max_length=64)
        args.catalog = min(args.catalog, 500)
    else:
        qwen = Qwen3Config()
        qf = ItemQFormerConfig(num_query_tokens=2)
        jc = JointModelConfig(max_length=args.seq)

    rng = np.random.RandomState(0)
    n = args.catalog
    item_ids = ["B%08d" % k for k in range(n)]
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
    t0 = time.time()
    n_frag = rec.prewarm_prompts()
    print(f"prewarm: {n_frag} fragments in {time.time()-t0:.1f}s", flush=True)

    hot = max(1, n // 20)
    for mode in args.modes.split(","):
        # mode syntax: "pipe" | "nopipe", with optional ":wN" (max_wait_ms
        # override) and ":dN" (settle-queue depth) suffixes, e.g.
        # "pipe:w8:d2" — all modes share one process/grant for the A/B
        parts = mode.split(":")
        wait_ms, depth = args.max_wait_ms, 1
        for tok in parts[1:]:
            if tok.startswith("w"):
                wait_ms = float(tok[1:])
            elif tok.startswith("d"):
                depth = int(tok[1:])
        t0 = time.time()
        server, batcher = make_server(
            rec, port=0, max_wait_ms=wait_ms, warmup=True,
            freeze_heap=True, max_queued=args.max_queued,
            settle_depth=depth,
        )
        batcher.pipeline = parts[0] == "pipe"
        port = server.server_address[1]
        print(f"[{mode}] warmup(+compile): {time.time()-t0:.1f}s  "
              f"port={port}", flush=True)
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rec.submit_phase_s.clear()
        for phase, seed0 in (("warm", 10_000), ("measured", 10_000)):
            # same seeds both phases: the measured phase hits a warm
            # fragment cache and warm jit shapes — the steady state under
            # repeat-heavy production traffic
            batcher.reset_latency_window()
            b0, s0 = batcher.batches_run, batcher.requests_served
            d0, i0 = batcher.device_time_s, batcher.idle_time_s
            sub0, fin0 = batcher.submit_time_s, batcher.finalize_time_s
            hp0, hw0, hr0 = (batcher.handler_parse_s, batcher.handler_wait_s,
                             batcher.handler_respond_s)
            cpu0 = os.times()
            t0 = time.time()
            outs = spawn_clients(port, args.clients, args.requests, n, hot,
                                 seed0)
            wall = time.time() - t0
            cpu1 = os.times()
            total = sum(o["requests"] for o in outs)
            errors = sum(o["errors"] for o in outs)
            sheds = sum(o.get("sheds", 0) for o in outs)
            lat = np.sort(np.concatenate(
                [np.asarray(o["latencies_ms"], np.float64) for o in outs]))
            # sustained window: measured from first client start to last
            # finish, as reported by the clients (excludes process spawn)
            span = (max(o["t_end"] for o in outs)
                    - min(o["t_start"] for o in outs))
            batches = batcher.batches_run - b0
            served = batcher.requests_served - s0
            dev = batcher.device_time_s - d0
            idle = batcher.idle_time_s - i0
            # fraction of the traffic window the dispatcher spent driving
            # the device (all _run time falls inside the clients' span)
            busy_frac = dev / max(span, 1e-9)
            print(
                f"RESULT {mode} {phase} clients={args.clients} reqs={total} "
                f"errors={errors} users_per_s={total/span:.1f} "
                f"span_s={span:.2f} wall_s={wall:.2f} "
                f"batches={batches} fill={served/max(batches,1):.1f} "
                f"device_busy={busy_frac:.2f} device_s={dev:.2f} "
                f"submit_s={batcher.submit_time_s-sub0:.2f} "
                f"finalize_s={batcher.finalize_time_s-fin0:.2f} "
                f"idle_s={idle:.2f} "
                f"server_cpu_s="
                f"{cpu1.user-cpu0.user+cpu1.system-cpu0.system:.2f} "
                f"p50_ms={lat[int(0.50*(len(lat)-1))]:.0f} "
                f"p95_ms={lat[int(0.95*(len(lat)-1))]:.0f} "
                f"p99_ms={lat[int(0.99*(len(lat)-1))]:.0f} "
                f"shed={sheds} (server latency view: "
                f"{batcher.latency_quantiles()}; submit phases: "
                f"{dict(rec.submit_phase_s)})",
                flush=True,
            )
            client_cpu = sum(o.get("cpu_s", 0.0) for o in outs)
            print(
                f"HOST {mode} {phase} span_s={span:.2f} "
                f"server_cpu_s="
                f"{cpu1.user-cpu0.user+cpu1.system-cpu0.system:.2f} "
                f"client_cpu_s={client_cpu:.2f} "
                f"core_utilization="
                f"{(cpu1.user-cpu0.user+cpu1.system-cpu0.system+client_cpu)/max(span,1e-9):.2f} "
                f"handler_parse_s={batcher.handler_parse_s-hp0:.3f} "
                f"handler_wait_s={batcher.handler_wait_s-hw0:.2f} "
                f"handler_respond_s={batcher.handler_respond_s-hr0:.3f} "
                f"per_req_parse_us="
                f"{(batcher.handler_parse_s-hp0)/max(total,1)*1e6:.0f} "
                f"per_req_respond_us="
                f"{(batcher.handler_respond_s-hr0)/max(total,1)*1e6:.0f}",
                flush=True,
            )
            rec.submit_phase_s.clear()

        server.shutdown()
        batcher.close()


if __name__ == "__main__":
    main()
