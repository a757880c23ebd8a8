"""Convert PyTorch reference checkpoints to Flax parameter trees.

Gives the rebuild checkpoint *compatibility* with the reference: a
``best_qformer_model.pth`` saved by the reference trainer
(reference: training/item_qformer_training.py:171-187) loads directly into the
TPU ItemQFormer, and raw ``BertModel`` state dicts load into QFormerModel.
Also used by the parity tests to copy random torch weights into Flax and
compare activations.

All functions take a ``state_dict``-like mapping of numpy arrays (call
``tensor.detach().cpu().numpy()`` on torch tensors first, or pass torch
tensors — they are converted via ``np.asarray``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from unirec_tpu.configs import ItemQFormerConfig, QFormerConfig, UserQFormerConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> flax Dense (kernel is transposed)."""
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _attention(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """BertAttention (self or cross) -> QFormerAttention params."""
    out = {
        "query": _dense(sd, f"{prefix}.self.query"),
        "key": _dense(sd, f"{prefix}.self.key"),
        "value": _dense(sd, f"{prefix}.self.value"),
        "output_dense": _dense(sd, f"{prefix}.output.dense"),
        "output_LayerNorm": _layernorm(sd, f"{prefix}.output.LayerNorm"),
    }
    if f"{prefix}.self.distance_embedding.weight" in sd:
        # relative-position variants (reference: models/qformer.py:138-146)
        out["distance_embedding"] = {
            "embedding": _np(sd[f"{prefix}.self.distance_embedding.weight"])
        }
    return out


def _ffn(sd: Mapping[str, Any], inter_prefix: str, out_prefix: str) -> Dict[str, Any]:
    return {
        "intermediate_dense": _dense(sd, f"{inter_prefix}.dense"),
        "output_dense": _dense(sd, f"{out_prefix}.dense"),
        "output_LayerNorm": _layernorm(sd, f"{out_prefix}.LayerNorm"),
    }


def convert_qformer_model(
    sd: Mapping[str, Any], config: QFormerConfig, prefix: str = ""
) -> Dict[str, Any]:
    """Torch BertModel state_dict -> QFormerModel params dict.

    ``prefix``: state-dict key prefix (e.g. ``"qformer."`` inside the item
    wrapper checkpoint, reference: models/qformer_utils.py:31).
    """
    p = prefix
    emb: Dict[str, Any] = {
        "LayerNorm": _layernorm(sd, f"{p}embeddings.LayerNorm"),
    }
    if f"{p}embeddings.word_embeddings.weight" in sd:
        emb["word_embeddings"] = {
            "embedding": _np(sd[f"{p}embeddings.word_embeddings.weight"])
        }
        emb["position_embeddings"] = {
            "embedding": _np(sd[f"{p}embeddings.position_embeddings.weight"])
        }

    encoder: Dict[str, Any] = {}
    for i in range(config.num_hidden_layers):
        lp = f"{p}encoder.layer.{i}"
        layer: Dict[str, Any] = {
            "attention": _attention(sd, f"{lp}.attention"),
            "ffn_query": _ffn(sd, f"{lp}.intermediate_query", f"{lp}.output_query"),
        }
        if f"{lp}.crossattention.self.query.weight" in sd:
            layer["crossattention"] = _attention(sd, f"{lp}.crossattention")
        if f"{lp}.intermediate.dense.weight" in sd:
            layer["ffn"] = _ffn(sd, f"{lp}.intermediate", f"{lp}.output")
        encoder[f"layer_{i}"] = layer

    out = {"embeddings": emb, "encoder": encoder}
    if f"{p}pooler.dense.weight" in sd:
        out["pooler"] = {"dense": _dense(sd, f"{p}pooler.dense")}
    return out


def convert_item_qformer(
    sd: Mapping[str, Any], config: ItemQFormerConfig
) -> Dict[str, Any]:
    """Torch QFormerForItemRepresentation state_dict -> ItemQFormer params.

    Layout per reference: models/qformer_utils.py:29-35 — ``query_embeddings``
    [1,K,H], nested ``qformer.*`` BertModel, three Linear heads.  The
    field_projection Linear(K->F) weight [F,K] maps to DenseGeneral kernel
    [K,F].
    """
    return {
        "query_embeddings": _np(sd["query_embeddings"]),
        "qformer": convert_qformer_model(sd, config.qformer(), prefix="qformer."),
        "item_representation_head": _dense(sd, "item_representation_head"),
        "reconstruction_head": _dense(sd, "reconstruction_head"),
        "field_projection": {
            "kernel": _np(sd["field_projection.weight"]).T,
            "bias": _np(sd["field_projection.bias"]),
        },
    }


def convert_user_qformer(
    sd: Mapping[str, Any], config: UserQFormerConfig
) -> Dict[str, Any]:
    """Torch UserQFormer state_dict -> UserQFormer params
    (reference: training/user_qformer_training.py:17-45; prediction_head is a
    Sequential[Linear, GELU, LayerNorm, Linear] -> indices 0, 2, 3)."""
    return {
        "query_embeddings": _np(sd["query_embeddings"]),
        "qformer": convert_qformer_model(sd, config.qformer(), prefix="qformer."),
        "head_dense1": _dense(sd, "prediction_head.0"),
        "head_norm": _layernorm(sd, "prediction_head.2"),
        "head_dense2": _dense(sd, "prediction_head.3"),
    }


def convert_qformer_lm_head(sd: Mapping[str, Any], prefix: str = "cls.predictions") -> Dict[str, Any]:
    """BertLMPredictionHead -> QFormerLMPredictionHead params
    (reference: models/qformer.py:607-641: transform.dense -> act -> LayerNorm
    -> decoder Linear(hidden, vocab) with a standalone bias)."""
    decoder = {"kernel": _np(sd[f"{prefix}.decoder.weight"]).T}
    if f"{prefix}.decoder.bias" in sd:
        decoder["bias"] = _np(sd[f"{prefix}.decoder.bias"])
    elif f"{prefix}.bias" in sd:
        decoder["bias"] = _np(sd[f"{prefix}.bias"])
    return {
        "transform_dense": _dense(sd, f"{prefix}.transform.dense"),
        "transform_LayerNorm": _layernorm(sd, f"{prefix}.transform.LayerNorm"),
        "decoder": decoder,
    }


def convert_qformer_lm_model(sd: Mapping[str, Any], config) -> Dict[str, Any]:
    """Torch BertLMHeadModel state_dict -> QFormerLMHeadModel params."""
    return {
        "bert": convert_qformer_model(sd, config, prefix="bert."),
        "cls": convert_qformer_lm_head(sd),
    }


def convert_qwen3(sd: Mapping[str, Any], num_layers: int) -> Dict[str, Any]:
    """HF Qwen3Model state_dict -> unirec_tpu Qwen3Model params.

    Accepts both bare-model keys (``layers.0...``) and ``model.``-prefixed
    keys (full checkpoints).  LoRA params are not present in HF checkpoints;
    they initialize fresh (zeros for lora_b -> identity overlay).
    """
    def get(k: str) -> np.ndarray:
        if k in sd:
            return _np(sd[k])
        return _np(sd["model." + k])

    def lin(prefix: str) -> Dict[str, np.ndarray]:
        out = {"kernel": get(prefix + ".weight").T}
        if prefix + ".bias" in sd or ("model." + prefix + ".bias") in sd:
            out["bias"] = get(prefix + ".bias")
        return out

    params: Dict[str, Any] = {
        "embed_tokens": get("embed_tokens.weight"),
        "norm": {"scale": get("norm.weight")},
    }
    for i in range(num_layers):
        lp = f"layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": lin(f"{lp}.self_attn.q_proj"),
                "k_proj": lin(f"{lp}.self_attn.k_proj"),
                "v_proj": lin(f"{lp}.self_attn.v_proj"),
                "o_proj": lin(f"{lp}.self_attn.o_proj"),
                "q_norm": {"scale": get(f"{lp}.self_attn.q_norm.weight")},
                "k_norm": {"scale": get(f"{lp}.self_attn.k_norm.weight")},
            },
            "mlp": {
                "gate_proj": lin(f"{lp}.mlp.gate_proj"),
                "up_proj": lin(f"{lp}.mlp.up_proj"),
                "down_proj": lin(f"{lp}.mlp.down_proj"),
            },
            "input_layernorm": {"scale": get(f"{lp}.input_layernorm.weight")},
            "post_attention_layernorm": {
                "scale": get(f"{lp}.post_attention_layernorm.weight")
            },
        }
    return params


def load_reference_item_qformer_checkpoint(path: str):
    """Load a reference ``best_qformer_model.pth`` checkpoint.

    Returns (ItemQFormerConfig, flax params, field_names).  Checkpoint schema
    per reference training/item_qformer_training.py:178-182:
    {model_state_dict, config: BertConfig, field_names}.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    bert_cfg = ckpt["config"]
    field_names = ckpt["field_names"]
    cfg = ItemQFormerConfig(
        hidden_size=bert_cfg.hidden_size,
        num_hidden_layers=bert_cfg.num_hidden_layers,
        num_attention_heads=bert_cfg.num_attention_heads,
        intermediate_size=bert_cfg.intermediate_size,
        num_query_tokens=bert_cfg.query_length,
        field_embedding_dim=bert_cfg.encoder_width,
        num_fields=len(field_names),
        dropout=bert_cfg.hidden_dropout_prob,
    )
    params = convert_item_qformer(ckpt["model_state_dict"], cfg)
    return cfg, {"params": params}, field_names


def convert_joint_model(
    sd: Mapping[str, Any], qwen_config, qformer_config: ItemQFormerConfig
) -> Dict[str, Any]:
    """Reference ``MultiModalQwenEmbedding`` state_dict -> flax joint params.

    Handles the PEFT-wrapped layout the reference saves
    (train_item_individual_token_joint.py:88-132, 183-200): the Q-Former
    under ``qformer_model.*``; the LoRA-wrapped Qwen3 under
    ``base_model.base_model.model.*`` with linear weights at
    ``<proj>.base_layer.weight`` and adapters at
    ``<proj>.lora_A.default.weight`` / ``lora_B.default.weight``.  The
    resized embedding table (vocab + 20 special rows, :118-119) splits into
    ``embed_tokens`` + ``extra_embed_tokens``.  Also accepts un-wrapped
    (no-LoRA / bare) layouts.
    """
    qwen_sd: Dict[str, Any] = {}
    lora_sd: Dict[str, Any] = {}
    qformer_sd: Dict[str, Any] = {}
    for key, value in sd.items():
        if key.startswith("qformer_model."):
            qformer_sd[key[len("qformer_model."):]] = value
            continue
        k = key
        while k.startswith("base_model."):
            k = k[len("base_model."):]
        if k.startswith("model."):
            k = k[len("model."):]
        if ".lora_A." in k or ".lora_B." in k:
            lora_sd[k] = value
        else:
            qwen_sd[k.replace(".base_layer.", ".")] = value

    base = convert_qwen3(qwen_sd, qwen_config.num_hidden_layers)
    vocab = qwen_config.vocab_size
    full_embed = base["embed_tokens"]
    if full_embed.shape[0] > vocab:
        base["embed_tokens"] = full_embed[:vocab]
        base["extra_embed_tokens"] = full_embed[vocab:]
    for k, v in lora_sd.items():
        # layers.{i}.(self_attn|mlp).{proj}.lora_[AB][.default].weight
        parts = k.split(".")
        dest = base[f"layers_{int(parts[1])}"][parts[2]][parts[3]]
        if parts[4] == "lora_A":
            dest["lora_a"] = _np(v).T
        elif parts[4] == "lora_B":
            dest["lora_b"] = _np(v).T
        else:  # pragma: no cover
            raise KeyError(f"unrecognized LoRA key {k}")
    return {
        "base_model": base,
        "qformer": convert_item_qformer(qformer_sd, qformer_config),
    }
