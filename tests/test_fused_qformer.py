"""Parity: fused Pallas inference engine vs the Flax ItemQFormer.

The fused engine (inference/fused_qformer.py) consumes the model's own
parameter pytree, so bit-compatibility reduces to kernel correctness —
verified here in interpret mode on the CPU mesh at fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirec_tpu.configs import ItemQFormerConfig
from unirec_tpu.inference.fused_qformer import (
    fused_qformer_forward,
    prepare_fused_params,
    supports_fused,
)
from unirec_tpu.models.item_qformer import ItemQFormer

F, D = 6, 64

CFG = ItemQFormerConfig(
    hidden_size=64,
    num_hidden_layers=3,  # layers 0 and 2 cross-attend (freq 2)
    num_attention_heads=4,
    intermediate_size=128,
    num_query_tokens=8,
    field_embedding_dim=D,
    num_fields=F,
    dropout=0.0,
)


@pytest.fixture(scope="module")
def setup():
    model = ItemQFormer(CFG)
    rng = np.random.RandomState(0)
    fields = rng.randn(9, F, D).astype(np.float32)
    mask = (rng.rand(9, F) > 0.25).astype(np.float32)
    mask[:, 0] = 1.0  # at least one valid field per item
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(fields[:2]), jnp.asarray(mask[:2])
    )
    return model, params, fields, mask


def test_fused_matches_model(setup):
    model, params, fields, mask = setup
    ref = model.apply(params, jnp.asarray(fields), jnp.asarray(mask))[
        "query_outputs"
    ]
    fused = prepare_fused_params(params, CFG, dtype=jnp.float32)
    out = fused_qformer_forward(
        fused, CFG, jnp.asarray(fields), jnp.asarray(mask), interpret=True
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fused_masked_field_invariance(setup):
    """A masked-out field's values must not influence the output."""
    model, params, fields, mask = setup
    fused = prepare_fused_params(params, CFG, dtype=jnp.float32)
    mask2 = mask.copy()
    mask2[:, -1] = 0.0
    out_a = fused_qformer_forward(
        fused, CFG, jnp.asarray(fields), jnp.asarray(mask2), interpret=True
    )
    poisoned = fields.copy()
    poisoned[:, -1] = 1e3
    out_b = fused_qformer_forward(
        fused, CFG, jnp.asarray(poisoned), jnp.asarray(mask2), interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_fused_all_masked_item_matches_model(setup):
    """An item with ZERO valid fields must produce the same output as the
    per-item XLA path, independent of the other items sharing its tile."""
    model, params, fields, mask = setup
    mask2 = mask.copy()
    mask2[3] = 0.0  # item 3: no valid fields at all
    ref = model.apply(params, jnp.asarray(fields), jnp.asarray(mask2))[
        "query_outputs"
    ]
    fused = prepare_fused_params(params, CFG, dtype=jnp.float32)
    out = fused_qformer_forward(
        fused, CFG, jnp.asarray(fields), jnp.asarray(mask2), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
    # batch-composition independence for the all-masked item
    poisoned = fields.copy()
    poisoned[4] += 100.0
    out_b = fused_qformer_forward(
        fused, CFG, jnp.asarray(poisoned), jnp.asarray(mask2), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out[3]), np.asarray(out_b[3]), atol=1e-5
    )


def test_supports_fused_gate():
    assert supports_fused(CFG)
    assert supports_fused(ItemQFormerConfig())  # production config
    assert not supports_fused(
        ItemQFormerConfig(num_query_tokens=3)  # 3 does not divide 256
    )


def test_fused_odd_batch_padding(setup):
    """Batch not divisible by the packing factor pads internally."""
    model, params, fields, mask = setup
    fused = prepare_fused_params(params, CFG, dtype=jnp.float32)
    for n in (1, 5, 9):
        ref = model.apply(
            params, jnp.asarray(fields[:n]), jnp.asarray(mask[:n])
        )["query_outputs"]
        out = fused_qformer_forward(
            fused, CFG, jnp.asarray(fields[:n]), jnp.asarray(mask[:n]),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def test_qformer_inference_fused_dispatch(setup, eight_devices):
    """QFormerInference(use_fused=True) must match the XLA path on the same
    params, single-device and dp-sharded (shard_map around the kernels)."""
    import numpy as np
    from jax.sharding import Mesh

    from unirec_tpu.inference.qformer_inference import QFormerInference

    model, params, fields, mask = setup
    common = dict(
        config=CFG, params=params,
        field_names=[f"f{i}" for i in range(F)], batch_size=16,
    )
    xla = QFormerInference(**common, use_fused=False)
    fused = QFormerInference(**common, use_fused=True)
    assert fused.use_fused and not xla.use_fused

    out_x = xla.query_tokens_from_embeddings(fields, mask)
    out_f = fused.query_tokens_from_embeddings(fields, mask)
    # both paths run bf16 on-device; fused does fp32 LN/softmax in-kernel
    np.testing.assert_allclose(out_f, out_x, atol=0.08, rtol=0.1)

    mesh = Mesh(np.asarray(eight_devices).reshape(8, 1), ("dp", "tp"))
    meshed = QFormerInference(**common, use_fused=True, mesh=mesh)
    out_m = meshed.query_tokens_from_embeddings(fields, mask)
    np.testing.assert_allclose(out_m, out_f, atol=1e-2, rtol=1e-2)


def test_fused_with_field_type_embeddings():
    """use_field_type_embeddings checkpoints must not silently diverge in the
    fused engine (code-review r2 finding)."""
    cfg = ItemQFormerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, num_query_tokens=8, field_embedding_dim=D,
        num_fields=F, dropout=0.0, use_field_type_embeddings=True,
    )
    model = ItemQFormer(cfg)
    rng = np.random.RandomState(1)
    fields = rng.randn(4, F, D).astype(np.float32)
    mask = np.ones((4, F), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(fields[:2]), jnp.asarray(mask[:2])
    )
    ref = model.apply(params, jnp.asarray(fields), jnp.asarray(mask))[
        "query_outputs"
    ]
    fused = prepare_fused_params(params, cfg, dtype=jnp.float32)
    assert fused.field_id_embeddings is not None
    out = fused_qformer_forward(
        fused, cfg, jnp.asarray(fields), jnp.asarray(mask), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fused_ffn_multi_chunk_and_odd_intermediate():
    """The FFN kernel's chunked accumulation (num_chunks > 1) must match the
    model, and non-chunkable intermediate dims must fall back to XLA via
    supports_fused (code-review r2 findings)."""
    from unirec_tpu.ops.fused_qformer_layer import ffn_chunk_size

    assert ffn_chunk_size(4096) == 1024  # production: 4 chunks
    assert ffn_chunk_size(2048) == 1024
    assert ffn_chunk_size(1536) == 768
    assert ffn_chunk_size(1000) == 0  # no lane-aligned divisor -> XLA
    assert not supports_fused(ItemQFormerConfig(intermediate_size=1000))

    cfg = ItemQFormerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=2048,  # 2 chunks: exercises acc init/+=/flush
        num_query_tokens=8, field_embedding_dim=D, num_fields=F, dropout=0.0,
    )
    model = ItemQFormer(cfg)
    rng = np.random.RandomState(2)
    fields = rng.randn(4, F, D).astype(np.float32)
    mask = np.ones((4, F), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(fields[:2]), jnp.asarray(mask[:2])
    )
    ref = model.apply(params, jnp.asarray(fields), jnp.asarray(mask))[
        "query_outputs"
    ]
    fused = prepare_fused_params(params, cfg, dtype=jnp.float32)
    out = fused_qformer_forward(
        fused, cfg, jnp.asarray(fields), jnp.asarray(mask), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
