"""Sustained rate of BACKWARD-style (transposed-weight) dots at the joint
shape (round-9 bwd-floor honesty check).

The joint bwd floor prices dx dots at the 165 TFLOP/s FORWARD-scan rate
(the round-8 merged-frozen-base-dots probe).  dx dots contract against
the transposed weight (dy @ W^T, i.e. dot_general contracting rhs dim 1)
— this measures whether that orientation sustains the same rate through
XLA at batch 8 x seq 512, using the same scan-over-layers structure.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/probe_dx_rate.py
"""

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

ROWS = 4096  # batch 8 x seq 512
D = 1024
Q = 2048
KV = 1024
I = 3072
LAYERS = 28


def main():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    # per-layer weights, stacked for the scan (as the real bwd sees them:
    # the FORWARD layout [in, out], contracted on the OUT dim)
    wq = jax.random.normal(ks[0], (LAYERS, D, Q), jnp.bfloat16)
    wk = jax.random.normal(ks[1], (LAYERS, D, KV), jnp.bfloat16)
    wv = jax.random.normal(ks[6], (LAYERS, D, KV), jnp.bfloat16)
    wo = jax.random.normal(ks[2], (LAYERS, Q, D), jnp.bfloat16)
    wgate = jax.random.normal(ks[3], (LAYERS, D, I), jnp.bfloat16)
    wup = jax.random.normal(ks[7], (LAYERS, D, I), jnp.bfloat16)
    wdown = jax.random.normal(ks[4], (LAYERS, I, D), jnp.bfloat16)
    dy = jax.random.normal(ks[5], (ROWS, D), jnp.bfloat16) * 0.02

    def dxT(g, w):
        # dy @ W^T: contract g's last dim with w's OUT (last) dim
        return jax.lax.dot_general(g, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)

    @jax.jit
    def bwd_scan(dy, wq, wk, wv, wo, wgate, wup, wdown):
        def layer(h, ws):
            q, k_, v_, o, gate, up, down = ws
            dctx = dxT(h, o)                        # [rows, Q]
            dh_attn = dxT(dctx, q)                  # via q_proj
            dh_attn += dxT(dctx[:, :KV], k_)        # k (shape proxy)
            dh_attn += dxT(dctx[:, KV:2 * KV], v_)  # v (shape proxy)
            dinter = dxT(h, down)                   # [rows, I]
            dh_mlp = dxT(dinter, gate) + dxT(dinter, up)
            h = (dh_attn + dh_mlp) * 1e-3
            return h, ()

        h, _ = jax.lax.scan(layer, dy, (wq, wk, wv, wo, wgate, wup, wdown))
        return h.astype(jnp.float32).sum()

    args = (dy, wq, wk, wv, wo, wgate, wup, wdown)
    t0 = time.time()
    float(bwd_scan(*args))
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    steps = 20
    for _ in range(steps):
        out = bwd_scan(*args)
    float(out)
    dt = (time.time() - t0) / steps * 1000
    per_layer = 2 * ROWS * (Q * D + Q * D + KV * D * 2 + I * D + I * D * 2)
    gf = per_layer * LAYERS / 1e9
    print(f"dx-scan: {dt:.1f} ms for {gf:.0f} GFLOP -> "
          f"{gf/dt:.0f} TFLOP/s (fwd-scan reference: ~165)", flush=True)


if __name__ == "__main__":
    main()
