"""Measure int8 (W8A8) engine quality vs the strict fp32 XLA path.

Production Item Q-Former config (hidden 1024, 12 layers, K=32, F=14), random
init (no trained weights exist in this environment — the structural error of
the quantization is what transfers).  Reports per-token cosine similarity and
relative L2 error of the int8 engine AND the bf16 engine, both vs fp32.

Run on the TPU; results recorded in BASELINE.md.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)

import jax
import jax.numpy as jnp

from unirec_tpu.configs import ItemQFormerConfig
from unirec_tpu.inference.fused_qformer import (
    fused_qformer_forward,
    prepare_fused_params,
)
from unirec_tpu.models.item_qformer import ItemQFormer


def main():
    cfg = ItemQFormerConfig()  # production, fp32 strict path
    model = ItemQFormer(cfg)  # fp32
    rng = jax.random.PRNGKey(0)
    batch = 512
    fields = jax.random.normal(rng, (batch, 14, 1024), jnp.float32)
    mask = (jax.random.uniform(jax.random.PRNGKey(1), (batch, 14)) > 0.2)
    mask = mask.at[:, 0].set(True).astype(jnp.float32)
    params = model.init(rng, fields[:2], mask[:2])

    @jax.jit
    def ref_fwd(p, f, m):
        return model.apply(p, f, m)["query_outputs"]

    ref = ref_fwd(params, fields, mask)

    def stats(out, ref):
        a = out.reshape(-1, out.shape[-1]).astype(jnp.float32)
        b = ref.reshape(-1, ref.shape[-1]).astype(jnp.float32)
        cos = (a * b).sum(-1) / (
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-9
        )
        rel = jnp.linalg.norm(a - b, axis=-1) / (
            jnp.linalg.norm(b, axis=-1) + 1e-9
        )
        return (
            float(cos.mean()), float(cos.min()),
            float(rel.mean()), float(rel.max()),
        )

    for precision in ("bf16", "int8"):
        fused = prepare_fused_params(params, cfg, precision=precision)

        @jax.jit
        def fwd(fp, f, m):
            return fused_qformer_forward(fp, cfg, f, m)

        out = fwd(fused, fields, mask)
        cm, cmin, rm, rmax = stats(out, ref)
        print(
            f"QUALITY {precision}: cos_mean={cm:.6f} cos_min={cmin:.6f} "
            f"rel_l2_mean={rm:.5f} rel_l2_max={rmax:.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
