"""Fused-kernel inference engine for the Item Q-Former.

Consumes the *same* parameter pytree as ``models.item_qformer.ItemQFormer``
(so checkpoints, torch conversion, and training are untouched) but executes
the encoder stack with the fused Pallas blocks from
``ops/fused_qformer_layer.py``: one kernel per attention block plus a
chunked FFN kernel whose [rows, intermediate] activation never touches HBM.
Inference-only — the hot path of
item-query-token generation (reference hot loop:
data_processing/generate_all_item_embeddings.py:148-346).

Numerics: matmuls accumulate fp32, softmax and LayerNorm run fp32; with
bf16 weights/activations this matches the ``fast_attention`` XLA path's
precision class (BASELINE.md), while the default fp32 model path remains
the strict-parity reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from unirec_tpu.configs import ItemQFormerConfig
from unirec_tpu.ops.fused_qformer_layer import (
    NEG_INF,
    fused_cross_attention_block,
    fused_ffn_block,
    fused_self_attention_block,
)


@dataclasses.dataclass
class FusedLayerParams:
    """Per-layer weights pre-fused for the kernels (QKV / KV concatenated)."""

    wqkv: Any
    bqkv: Any
    self_wo: Any
    self_bo: Any
    self_ln_g: Any
    self_ln_b: Any
    # cross-attention (None on layers without it)
    wq: Any = None
    bq: Any = None
    wkv: Any = None
    bkv: Any = None
    cross_wo: Any = None
    cross_bo: Any = None
    cross_ln_g: Any = None
    cross_ln_b: Any = None
    # query FFN
    w1: Any = None
    b1: Any = None
    w2: Any = None
    b2: Any = None
    ffn_ln_g: Any = None
    ffn_ln_b: Any = None
    # int8 per-output-channel weight scales (ops/fused_qformer_int8.py);
    # None on the bf16 engine
    sqkv: Any = None
    self_so: Any = None
    sq: Any = None
    skv: Any = None
    cross_so: Any = None
    s1: Any = None
    s2: Any = None

    @property
    def has_cross(self) -> bool:
        return self.wq is not None

    @property
    def is_int8(self) -> bool:
        return self.sqkv is not None


jax.tree_util.register_dataclass(
    FusedLayerParams,
    data_fields=[f.name for f in dataclasses.fields(FusedLayerParams)],
    meta_fields=[],
)


@dataclasses.dataclass
class FusedQFormerParams:
    query_embeddings: Any  # [1, K, D]
    emb_ln_g: Any
    emb_ln_b: Any
    layers: List[FusedLayerParams]
    # [F, field_dim] when ItemQFormerConfig.use_field_type_embeddings
    field_id_embeddings: Any = None


jax.tree_util.register_dataclass(
    FusedQFormerParams,
    data_fields=[
        "query_embeddings", "emb_ln_g", "emb_ln_b", "layers",
        "field_id_embeddings",
    ],
    meta_fields=[],
)


def prepare_fused_params(
    params, config: ItemQFormerConfig, dtype=jnp.bfloat16,
    precision: str = "bf16",
) -> FusedQFormerParams:
    """ItemQFormer param tree -> kernel-ready fused weights (host-side,
    one-time).  Accepts ``{"params": tree}`` or the inner tree.

    ``precision="int8"`` quantizes every projection/FFN weight per output
    channel (ops/fused_qformer_int8.quantize_weight) for the W8A8 kernels;
    biases/LayerNorms stay fp32 either way (kernels compute them fp32).
    """
    tree = params.get("params", params)
    qf = tree["qformer"]
    enc = qf["encoder"]
    cfg = config.qformer() if hasattr(config, "qformer") else config
    int8 = precision == "int8"
    if int8:
        from unirec_tpu.ops.fused_qformer_int8 import quantize_weight

    def arr(x):
        # jnp.asarray casts in place on device — never pull params through
        # the slow host<->device tunnel (CLAUDE.md: ~7 MB/s)
        return jnp.asarray(x, dtype)

    def dense(d):
        return arr(d["kernel"]), arr(d["bias"])

    def quant(w):
        return quantize_weight(jnp.asarray(w, jnp.float32))

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = enc[f"layer_{i}"]
        att = lp["attention"]
        wq, bq = dense(att["query"])
        wk, bk = dense(att["key"])
        wv, bv = dense(att["value"])
        wo, bo = dense(att["output_dense"])
        layer = FusedLayerParams(
            wqkv=jnp.concatenate([wq, wk, wv], axis=1),
            bqkv=jnp.concatenate([bq, bk, bv]),
            self_wo=wo,
            self_bo=bo,
            self_ln_g=arr(att["output_LayerNorm"]["scale"]),
            self_ln_b=arr(att["output_LayerNorm"]["bias"]),
        )
        if int8:
            layer.wqkv, layer.sqkv = quant(layer.wqkv)
            layer.self_wo, layer.self_so = quant(layer.self_wo)
        if "crossattention" in lp:
            catt = lp["crossattention"]
            cwq, cbq = dense(catt["query"])
            cwk, cbk = dense(catt["key"])
            cwv, cbv = dense(catt["value"])
            cwo, cbo = dense(catt["output_dense"])
            layer.wq, layer.bq = cwq, cbq
            layer.wkv = jnp.concatenate([cwk, cwv], axis=1)
            layer.bkv = jnp.concatenate([cbk, cbv])
            layer.cross_wo, layer.cross_bo = cwo, cbo
            layer.cross_ln_g = arr(catt["output_LayerNorm"]["scale"])
            layer.cross_ln_b = arr(catt["output_LayerNorm"]["bias"])
            if int8:
                layer.wq, layer.sq = quant(layer.wq)
                layer.wkv, layer.skv = quant(layer.wkv)
                layer.cross_wo, layer.cross_so = quant(layer.cross_wo)
        ffn = lp["ffn_query"]
        layer.w1, layer.b1 = dense(ffn["intermediate_dense"])
        layer.w2, layer.b2 = dense(ffn["output_dense"])
        layer.ffn_ln_g = arr(ffn["output_LayerNorm"]["scale"])
        layer.ffn_ln_b = arr(ffn["output_LayerNorm"]["bias"])
        if int8:
            layer.w1, layer.s1 = quant(layer.w1)
            layer.w2, layer.s2 = quant(layer.w2)
        layers.append(layer)

    return FusedQFormerParams(
        query_embeddings=arr(tree["query_embeddings"]),
        emb_ln_g=arr(qf["embeddings"]["LayerNorm"]["scale"]),
        emb_ln_b=arr(qf["embeddings"]["LayerNorm"]["bias"]),
        layers=layers,
        field_id_embeddings=(
            arr(tree["field_id_embeddings"])
            if "field_id_embeddings" in tree else None
        ),
    )


def supports_fused(config: ItemQFormerConfig) -> bool:
    """Kernel constraints: items must tile into 256 MXU rows, heads must
    split the hidden dim, and the FFN intermediate dim must admit a
    lane-aligned chunk (ops/fused_qformer_layer.ffn_chunk_size)."""
    from unirec_tpu.ops.fused_qformer_layer import ffn_chunk_size

    k = config.num_query_tokens
    return (
        k > 0
        and 256 % k == 0
        and config.hidden_size % config.num_attention_heads == 0
        and ffn_chunk_size(config.intermediate_size) > 0
    )


def fused_qformer_forward(
    fused: FusedQFormerParams,
    config: ItemQFormerConfig,
    field_embeddings: jax.Array,  # [B, F, field_dim]
    attention_mask: Optional[jax.Array] = None,  # [B, F]
    *,
    interpret: bool = False,
    int8_cross_tile: Optional[int] = None,
) -> jax.Array:
    """[B, F, D] cached field embeddings -> [B, K, hidden] query tokens.

    Mirrors ItemQFormer.__call__'s query path (models/item_qformer.py:39-92)
    minus the reconstruction heads (not needed for token generation).
    """
    cfg = config.qformer() if hasattr(config, "qformer") else config
    b = field_embeddings.shape[0]
    k = config.num_query_tokens
    heads = cfg.num_attention_heads
    eps = cfg.layer_norm_eps
    f = field_embeddings.shape[1]

    if attention_mask is None:
        attention_mask = jnp.ones((b, f), jnp.float32)
    key_bias = (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF

    dtype = fused.query_embeddings.dtype
    mem = field_embeddings.astype(dtype)
    if fused.field_id_embeddings is not None:
        # field-id conditioning added before the encoder
        # (models/item_qformer.py:63-72)
        mem = mem + fused.field_id_embeddings[None, :, :]

    # embeddings: LayerNorm over the broadcast query tokens
    h = jnp.broadcast_to(
        fused.query_embeddings, (b, k, fused.query_embeddings.shape[-1])
    ).astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    hc = h - mu
    var = jnp.mean(hc * hc, axis=-1, keepdims=True)
    h = hc * jax.lax.rsqrt(var + eps)
    h = h * fused.emb_ln_g.astype(jnp.float32) + fused.emb_ln_b.astype(
        jnp.float32
    )
    h = h.astype(dtype)

    int8 = fused.layers and fused.layers[0].is_int8
    if int8:
        from unirec_tpu.ops.fused_qformer_int8 import (
            fused_cross_attention_block_q,
            fused_ffn_block_q,
            fused_self_attention_block_q,
        )

    def self_block(x, layer):
        if layer.is_int8:
            return fused_self_attention_block_q(
                x, layer.wqkv, layer.sqkv, layer.bqkv,
                layer.self_wo, layer.self_so, layer.self_bo,
                layer.self_ln_g, layer.self_ln_b,
                num_heads=heads, n_q=k, ln_eps=eps, interpret=interpret,
            )
        return fused_self_attention_block(
            x, layer.wqkv, layer.bqkv, layer.self_wo, layer.self_bo,
            layer.self_ln_g, layer.self_ln_b,
            num_heads=heads, n_q=k, ln_eps=eps, interpret=interpret,
        )

    for li, layer in enumerate(fused.layers):
        if li == 0:
            # at entry every item carries the SAME broadcast query tokens, so
            # the first self-attention block is batch-constant: compute one
            # item and broadcast (exact; saves 1/num_layers of self time)
            h = jnp.broadcast_to(self_block(h[:1], layer), h.shape)
        else:
            h = self_block(h, layer)
        if layer.has_cross:
            if layer.is_int8:
                h = fused_cross_attention_block_q(
                    h, mem, key_bias,
                    layer.wq, layer.sq, layer.bq,
                    layer.wkv, layer.skv, layer.bkv,
                    layer.cross_wo, layer.cross_so, layer.cross_bo,
                    layer.cross_ln_g, layer.cross_ln_b,
                    num_heads=heads, n_q=k, n_kv=f, ln_eps=eps,
                    interpret=interpret, tile_rows=int8_cross_tile,
                )
            else:
                h = fused_cross_attention_block(
                    h, mem, key_bias,
                    layer.wq, layer.bq, layer.wkv, layer.bkv,
                    layer.cross_wo, layer.cross_bo,
                    layer.cross_ln_g, layer.cross_ln_b,
                    num_heads=heads, n_q=k, n_kv=f, ln_eps=eps,
                    interpret=interpret,
                )
        if layer.is_int8:
            h = fused_ffn_block_q(
                h, layer.w1, layer.s1, layer.b1, layer.w2, layer.s2,
                layer.b2, layer.ffn_ln_g, layer.ffn_ln_b,
                ln_eps=eps, interpret=interpret,
            )
        else:
            h = fused_ffn_block(
                h, layer.w1, layer.b1, layer.w2, layer.b2,
                layer.ffn_ln_g, layer.ffn_ln_b,
                ln_eps=eps, interpret=interpret,
            )
    return h
