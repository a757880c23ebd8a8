"""Loss functions for every training stage, as pure jnp functions.

Mirrors the reference loss semantics exactly:
* masked reconstruction MSE + triplet margin
  (reference: training/item_qformer_training.py:41-56),
* InfoNCE with temperature 0.07 over masked negatives
  (reference: training/train_item_individual_token_joint.py:326-352),
* user Q-Former token MSE (reference: training/user_qformer_training.py:193,209).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def masked_reconstruction_mse(
    reconstructed: jax.Array,  # [B, F, D]
    target: jax.Array,  # [B, F, D]
    field_mask: jax.Array,  # [B, F]
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Sum of per-element squared error over valid fields / number of valid
    fields (reference: training/item_qformer_training.py:51-53 — note the
    denominator is mask.sum(), i.e. the loss is per-field summed over D).

    ``axis_name``: set when running INSIDE ``jax.shard_map`` over a dp
    axis.  The denominator is the valid-field count, which varies per
    shard, so a pmean of per-shard means is NOT the full-batch mean; using
    ``pmean(count)`` as the denominator makes both the pmean'd VALUE and
    the pmean'd GRADIENTS exactly match the full-batch step:
    pmean_s(sum_s / (C/S)) = (Σ_s sum_s) / C."""
    err = (reconstructed - target) ** 2  # [B, F, D]
    masked = err * field_mask[..., None]
    count = field_mask.sum()
    if axis_name is not None:
        # Clamp the GLOBAL count, not the per-shard pmean: pmean(count) is
        # C/S, so the all-empty guard must be max(C,1)/S = max(C/S, 1/S) or
        # a batch with 0 < C < S valid fields would diverge from dp=1.
        n_shards = jax.lax.psum(1, axis_name)
        count = jax.lax.pmean(count, axis_name)
        return masked.sum() / jnp.maximum(count, 1.0 / n_shards)
    return masked.sum() / jnp.maximum(count, 1.0)


def triplet_margin_loss(
    anchor: jax.Array,  # [B, D]
    positive: jax.Array,
    negative: jax.Array,
    margin: float = 0.5,
    eps: float = 1e-6,
) -> jax.Array:
    """torch.nn.TripletMarginLoss semantics: mean(relu(margin + d(a,p) - d(a,n)))
    with euclidean distance (reference: training/item_qformer_training.py:46)."""
    d_pos = jnp.sqrt(jnp.sum((anchor - positive) ** 2, axis=-1) + eps)
    d_neg = jnp.sqrt(jnp.sum((anchor - negative) ** 2, axis=-1) + eps)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def item_qformer_loss(
    model_output: dict,
    field_embeddings: jax.Array,
    field_mask: jax.Array,
    positive_rep: jax.Array,
    negative_rep: jax.Array,
    reconstruction_weight: float = 1.0,
    contrastive_weight: float = 0.25,
    margin: float = 0.5,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Combined item Q-Former training loss
    (reference: training/item_qformer_training.py:49-56; weights from the
    production run at :200,42).  ``axis_name``: see
    masked_reconstruction_mse — the triplet term is a per-sample mean over
    equal shards, so plain pmean is already exact for it."""
    recon = masked_reconstruction_mse(
        model_output["reconstructed_fields"], field_embeddings, field_mask,
        axis_name=axis_name,
    )
    cont = triplet_margin_loss(
        model_output["item_representation"], positive_rep, negative_rep, margin
    )
    total = reconstruction_weight * recon + contrastive_weight * cont
    return total, recon, cont


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """F.normalize(p=2) semantics (clamped norm)."""
    norm = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return x / norm


def info_nce_loss(
    user_embeddings: jax.Array,  # [B, D]
    positive_embeddings: jax.Array,  # [B, D]
    negative_embeddings: jax.Array,  # [B, N, D]
    negative_mask: Optional[jax.Array] = None,  # [B, N] bool/0-1
    temperature: float = 0.07,
) -> jax.Array:
    """InfoNCE over one positive + masked negatives
    (reference: training/train_item_individual_token_joint.py:326-352).

    The reference loops per-sample and concatenates [pos, valid_negs] before a
    logsumexp; here it is one vectorized masked logsumexp — identical value
    because masked logits at -1e9 contribute exp(-1e9) = 0.
    """
    u = l2_normalize(user_embeddings)
    p = l2_normalize(positive_embeddings)
    n = l2_normalize(negative_embeddings)
    pos_sim = jnp.sum(u * p, axis=-1) / temperature  # [B]
    neg_sim = jnp.einsum("bd,bnd->bn", u, n) / temperature  # [B, N]
    if negative_mask is not None:
        neg_sim = jnp.where(negative_mask.astype(bool), neg_sim, -1e9)
    all_sim = jnp.concatenate([pos_sim[:, None], neg_sim], axis=1)  # [B, 1+N]
    loss = -pos_sim + jax.nn.logsumexp(all_sim, axis=1)
    return loss.mean()


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Plain mean MSE (user Q-Former training objective,
    reference: training/user_qformer_training.py:193)."""
    return jnp.mean((pred - target) ** 2)
