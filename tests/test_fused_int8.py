"""Int8 (W8A8) fused engine: quantization correctness + closeness to fp32.

The int8 path is opt-in for inference; it must track the fp32 model closely
(cosine similarity per query token) and respect masking semantics exactly.
Kernels run in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirec_tpu.configs import ItemQFormerConfig
from unirec_tpu.inference.fused_qformer import (
    fused_qformer_forward,
    prepare_fused_params,
)
from unirec_tpu.models.item_qformer import ItemQFormer
from unirec_tpu.ops.fused_qformer_int8 import quantize_weight

F, D = 6, 64

CFG = ItemQFormerConfig(
    hidden_size=64,
    num_hidden_layers=3,
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
    mask[:, 0] = 1.0
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(fields[:2]), jnp.asarray(mask[:2])
    )
    return model, params, fields, mask


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(3)
    w = rng.randn(64, 128).astype(np.float32) * np.linspace(
        0.01, 5.0, 128
    )  # very different per-channel ranges
    q, scale = quantize_weight(jnp.asarray(w))
    assert q.dtype == jnp.int8 and scale.shape == (1, 128)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    # per-channel scaling keeps relative error ~1/254 of the channel range
    err = np.abs(deq - w).max(axis=0) / np.abs(w).max(axis=0)
    assert err.max() < 0.005


def test_int8_close_to_fp32_model(setup):
    model, params, fields, mask = setup
    ref = np.asarray(
        model.apply(params, jnp.asarray(fields), jnp.asarray(mask))[
            "query_outputs"
        ]
    )
    fused = prepare_fused_params(params, CFG, precision="int8")
    assert fused.layers[0].is_int8
    assert fused.layers[0].wqkv.dtype == jnp.int8
    out = np.asarray(
        fused_qformer_forward(
            fused, CFG, jnp.asarray(fields), jnp.asarray(mask),
            interpret=True,
        ),
        np.float32,
    )
    assert out.shape == ref.shape
    # per-token cosine similarity: int8 must stay >0.995 of the fp32 tokens
    a = out.reshape(-1, out.shape[-1])
    b = ref.reshape(-1, ref.shape[-1])
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.995, cos.min()


def test_int8_masked_field_invariance(setup):
    """Masked fields must not influence int8 outputs (exact, not approx)."""
    model, params, fields, mask = setup
    fused = prepare_fused_params(params, CFG, precision="int8")
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


def test_inference_precision_dispatch(setup):
    from unirec_tpu.inference.qformer_inference import QFormerInference

    model, params, fields, mask = setup
    common = dict(
        config=CFG, params=params,
        field_names=[f"f{i}" for i in range(F)], batch_size=16,
    )
    q8 = QFormerInference(**common, precision="int8")
    assert q8.use_fused and q8.precision == "int8"
    out8 = q8.query_tokens_from_embeddings(fields, mask)
    ref = QFormerInference(**common, use_fused=False)
    outr = ref.query_tokens_from_embeddings(fields, mask)
    a, b = out8.reshape(-1, out8.shape[-1]), outr.reshape(-1, outr.shape[-1])
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.99

    with pytest.raises(ValueError):
        QFormerInference(**common, precision="int8", use_fused=False)
    with pytest.raises(ValueError):
        QFormerInference(**common, precision="fp8")


def test_int8_dp_sharded_sweep(setup, eight_devices):
    """int8 engine under the dp shard_map sweep must match single-device."""
    from jax.sharding import Mesh

    from unirec_tpu.inference.qformer_inference import QFormerInference

    model, params, fields, mask = setup
    common = dict(
        config=CFG, params=params,
        field_names=[f"f{i}" for i in range(F)], precision="int8",
    )
    single = QFormerInference(**common, batch_size=16)
    out_s = single.query_tokens_from_embeddings(fields, mask)
    mesh = Mesh(np.asarray(eight_devices).reshape(8, 1), ("dp", "tp"))
    meshed = QFormerInference(**common, batch_size=16, mesh=mesh)
    out_m = meshed.query_tokens_from_embeddings(fields, mask)
    np.testing.assert_allclose(out_m, out_s, atol=1e-2, rtol=1e-2)


def test_item_train_step_int8_reference_forwards():
    """fused_precision="int8": pos/neg triplet targets on the W8A8 kernels;
    training must stay close to the XLA step (targets differ only by int8
    noise)."""
    from unirec_tpu.configs import MeshConfig, OptimizerConfig, TrainConfig
    from unirec_tpu.train.item_qformer import ItemQFormerTrainer

    cfg = ItemQFormerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, num_query_tokens=8, field_embedding_dim=32,
        num_fields=4, dropout=0.0,
    )
    tc = TrainConfig(batch_size=8, optimizer=OptimizerConfig(),
                     mesh=MeshConfig(dp=1, tp=1))
    rng = np.random.RandomState(0)
    mk = lambda: (  # noqa: E731
        jnp.asarray(rng.randn(8, 4, 32).astype(np.float32)),
        jnp.ones((8, 4), jnp.float32),
    )
    ae, am = mk(); pe, pm = mk(); ne, nm = mk()
    batch = {"anchor_emb": ae, "anchor_mask": am, "pos_emb": pe,
             "pos_mask": pm, "neg_emb": ne, "neg_mask": nm}

    losses = {}
    for mode, prec in (("xla", "bf16"), ("int8", "int8")):
        tr = ItemQFormerTrainer(
            cfg, tc, dtype="bfloat16",
            fused_reference_forwards=(mode == "int8"),
            fused_precision=prec,
        )
        state = tr.init_state(seed=0)
        state, m = tr._train_step(state, batch)
        losses[mode] = float(m["loss"])
        assert np.isfinite(losses[mode])
    # triplet targets differ only by int8 quantization noise
    assert abs(losses["int8"] - losses["xla"]) / abs(losses["xla"]) < 0.02, (
        losses
    )


def test_ffn_whole_intermediate_residency_default():
    """inter <= 4096 defaults to chunk=inter (weights VMEM-resident,
    round-8); the result must match an explicitly chunked run up to
    requant-grouping noise, and exactly match explicit chunk=inter."""
    from unirec_tpu.ops.fused_qformer_int8 import fused_ffn_block_q

    rng = np.random.RandomState(3)
    d, inter, b, k = 64, 256, 4, 8
    x = jnp.asarray(rng.randn(b, k, d).astype(np.float32) * 0.1)
    w1_q, s1 = quantize_weight(jnp.asarray(rng.randn(d, inter), jnp.float32))
    w2_q, s2 = quantize_weight(jnp.asarray(rng.randn(inter, d), jnp.float32))
    b1 = jnp.asarray(rng.randn(inter).astype(np.float32) * 0.01)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.01)
    g = jnp.ones((d,), jnp.float32)
    be = jnp.zeros((d,), jnp.float32)
    args = (x, w1_q, s1, b1, w2_q, s2, b2, g, be)

    default = fused_ffn_block_q(*args, tile_rows=32, interpret=True)
    whole = fused_ffn_block_q(*args, tile_rows=32, chunk=inter,
                              interpret=True)
    chunked = fused_ffn_block_q(*args, tile_rows=32, chunk=128,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(default), np.asarray(whole))
    # chunk boundaries change the h-requant grouping: small but nonzero
    diff = np.max(np.abs(np.asarray(default) - np.asarray(chunked)))
    assert 0 < diff < 0.15
