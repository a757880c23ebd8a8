"""Item Q-Former training: masked reconstruction + triplet contrastive.

TPU-native rebuild of reference training/item_qformer_training.py:

* triplets = (anchor, positive=next-in-sequence, random negative) from user
  histories (reference :23-39);
* anchor forward carries gradients; positive/negative forwards are
  stop-gradient (the reference runs them under no_grad, :123-125);
* loss = recon_w * masked-recon-MSE + cont_w * TripletMargin(0.5)
  (reference :41-56, production weights 1.0/0.25 :200);
* validation every N epochs: masked MSE + mean per-valid-field cosine
  (reference :139-169 — the reference's python double loop over fields is one
  vectorized masked reduction here);
* best-by-val-loss checkpointing keeping the {config, field_names} contract
  (reference :171-187) via orbax, plus optimizer state for true step resume
  (the reference has none, SURVEY.md §5).

The whole step — 3 forwards + backward + AdamW — is one jit over a dp mesh;
negatives are sampled on the fly per epoch like the reference's __getitem__.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unirec_tpu.configs import ItemQFormerConfig, TrainConfig
from unirec_tpu.data.cache import FieldEmbeddingCache
from unirec_tpu.models.item_qformer import ItemQFormer
from unirec_tpu.ops.losses import item_qformer_loss, masked_reconstruction_mse
from unirec_tpu.parallel.mesh import (
    data_parallel_jit,
    make_mesh,
    pad_batch,
    replicate,
)
from unirec_tpu.train.common import (
    TrainState,
    drive_steps,
    epoch_batches,
    make_optimizer,
)


def build_triplet_pairs(
    item_sequences: Sequence[Sequence[str]], id_to_row: Dict[str, int]
) -> np.ndarray:
    """(anchor_row, positive_row) for consecutive items in user histories
    (reference: training/item_qformer_training.py:27-28)."""
    pairs = [
        (id_to_row[seq[i]], id_to_row[seq[i + 1]])
        for seq in item_sequences
        for i in range(len(seq) - 1)
        if seq[i] in id_to_row and seq[i + 1] in id_to_row
    ]
    return np.asarray(pairs, np.int32).reshape(-1, 2)


def sample_negatives(
    rng: np.random.Generator, pairs: np.ndarray, num_items: int
) -> np.ndarray:
    """Random negative != anchor and != positive
    (reference: training/item_qformer_training.py:32-34)."""
    if num_items <= 2:
        # every item is the anchor or the positive of some pair —
        # rejection sampling would loop forever; fall back to any
        # different item (or the anchor itself when there is only one)
        return ((pairs[:, 0] + 1) % max(num_items, 1)).astype(np.int32)
    neg = rng.integers(0, num_items, size=len(pairs)).astype(np.int32)
    bad = (neg == pairs[:, 0]) | (neg == pairs[:, 1])
    while bad.any():
        neg[bad] = rng.integers(0, num_items, size=int(bad.sum()))
        bad = (neg == pairs[:, 0]) | (neg == pairs[:, 1])
    return neg


def make_train_step(
    model: ItemQFormer,
    reconstruction_weight: float = 1.0,
    contrastive_weight: float = 0.25,
    margin: float = 0.5,
    fused_reference_config=None,
    fused_precision: str = "bf16",
    return_grads: bool = False,
    seed: int = 0,
    axis_name: Optional[str] = None,
):
    """One jitted step. ``fused_reference_config``: when set (an
    ItemQFormerConfig), the no-gradient positive/negative forwards run
    through the fused Pallas inference engine — they only feed the
    triplet targets, so inference-precision is appropriate and 2 of the
    step's 3 forwards move to the fast path (TPU only).
    ``fused_precision="int8"`` additionally runs them on the W8A8 kernels
    (weights re-quantized in-graph each step — a few VPU passes over 110M
    params, negligible next to the forwards they accelerate).
    ``axis_name``: set when the step runs INSIDE ``jax.shard_map`` over a
    dp axis (the kernel-bearing paths — GSPMD cannot partition
    pallas_call); losses use pmean-count normalization so pmean of
    per-shard (loss, grads) is exactly the full-batch step."""

    def fused_ref_representation(params, emb, mask):
        from unirec_tpu.inference.fused_qformer import (
            fused_qformer_forward,
            prepare_fused_params,
        )

        frozen = jax.lax.stop_gradient(params)
        fp = prepare_fused_params(
            {"params": frozen}, fused_reference_config, dtype=jnp.bfloat16,
            precision=fused_precision,
        )
        q = fused_qformer_forward(
            fp, fused_reference_config, emb, mask,
            interpret=jax.default_backend() != "tpu",
            # the 512-row int8 cross tile sits ~2% under the 16 MB scoped
            # VMEM limit; sharing the step with the trainable fused anchor
            # kernels pushes it 350K over — drop to 256 in that combination
            int8_cross_tile=(
                256
                if getattr(fused_reference_config, "fused_training", False)
                else None
            ),
        )
        head = frozen["item_representation_head"]
        rep = (
            q.mean(axis=1) @ head["kernel"].astype(q.dtype)
            + head["bias"].astype(q.dtype)
        )
        return rep.astype(jnp.float32)

    def step(state: TrainState, batch):
        # hardware-rng dropout bits (see train/joint.py: threefry measured
        # ~60 ms/step at the joint scale; same seed+fold_in determinism);
        # the configured seed feeds the key so different-seed runs draw
        # different dropout masks
        rng = jax.random.fold_in(
            jax.random.key(seed, impl="rbg"), state.step
        )
        if axis_name is not None:
            # per-shard independent dropout bits (same determinism
            # contract: seed + step + shard index)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def loss_fn(params):
            anc = model.apply(
                {"params": params},
                batch["anchor_emb"],
                batch["anchor_mask"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            # positive/negative: inference mode, no gradient
            # (reference: training/item_qformer_training.py:123-125)
            if fused_reference_config is not None:
                pos = {"item_representation": fused_ref_representation(
                    params, batch["pos_emb"], batch["pos_mask"])}
                neg = {"item_representation": fused_ref_representation(
                    params, batch["neg_emb"], batch["neg_mask"])}
            else:
                pos = model.apply(
                    {"params": jax.lax.stop_gradient(params)},
                    batch["pos_emb"],
                    batch["pos_mask"],
                )
                neg = model.apply(
                    {"params": jax.lax.stop_gradient(params)},
                    batch["neg_emb"],
                    batch["neg_mask"],
                )
            total, recon, cont = item_qformer_loss(
                anc,
                batch["anchor_emb"],
                batch["anchor_mask"],
                jax.lax.stop_gradient(pos["item_representation"]),
                jax.lax.stop_gradient(neg["item_representation"]),
                reconstruction_weight,
                contrastive_weight,
                margin,
                axis_name=axis_name,
            )
            return total, (recon, cont)

        (total, (recon, cont)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis_name is not None:
            total = jax.lax.pmean(total, axis_name)
            recon = jax.lax.pmean(recon, axis_name)
            cont = jax.lax.pmean(cont, axis_name)
            grads = jax.lax.pmean(grads, axis_name)
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": total, "recon": recon, "contrastive": cont}
        if return_grads:  # parity-test instrumentation
            metrics["grads"] = grads
        return state, metrics

    return step


def make_eval_step(model: ItemQFormer):
    """Masked recon MSE + mean cosine over valid fields, fully vectorized
    (replaces the reference's per-field python loop,
    item_qformer_training.py:156-164)."""

    @jax.jit
    def step(params, field_emb, mask):
        out = model.apply({"params": params}, field_emb, mask)
        recon = out["reconstructed_fields"]
        mse = masked_reconstruction_mse(recon, field_emb, mask)
        o = field_emb / jnp.maximum(
            jnp.linalg.norm(field_emb, axis=-1, keepdims=True), 1e-12
        )
        r = recon / jnp.maximum(
            jnp.linalg.norm(recon, axis=-1, keepdims=True), 1e-12
        )
        cos = jnp.sum(o * r, axis=-1)  # [B, F]
        cos_sum = jnp.sum(cos * mask)
        return mse, cos_sum, jnp.sum(mask)

    return step


@dataclasses.dataclass
class ItemQFormerTrainer:
    """End-to-end trainer over a FieldEmbeddingCache."""

    model_config: ItemQFormerConfig
    train_config: TrainConfig
    reconstruction_weight: float = 1.0
    contrastive_weight: float = 0.25
    # "float32" (strict reference parity) or "bfloat16" (mixed precision:
    # bf16 activations, fp32 params/optimizer — the MXU-native mode)
    dtype: str = "float32"
    # None = auto: fused bf16 pos/neg forwards on TPU with bf16 activations
    # (fp32 mode keeps strict reference numerics end-to-end; pass True to
    # opt in explicitly). pallas_call does not partition under GSPMD, so
    # dp>1 meshes route the whole step through an explicit shard_map
    # (exact: pmean-count loss normalization); tp>1 disables fused refs.
    fused_reference_forwards: Optional[bool] = None
    # "bf16" (default) or "int8": precision of the fused pos/neg reference
    # forwards (they only produce stop-gradient triplet targets; int8 runs
    # the W8A8 kernels with in-graph weight re-quantization)
    fused_precision: str = "bf16"

    def __post_init__(self):
        compute_dtype = (
            jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        )
        self.model = ItemQFormer(self.model_config, dtype=compute_dtype)
        self.mesh = make_mesh(self.train_config.mesh)
        fused_anchor = getattr(self.model_config, "fused_training", False)
        if fused_anchor and self.mesh.shape["tp"] > 1:
            raise ValueError(
                "fused_training is incompatible with tp>1 (pallas_call is "
                "opaque to GSPMD and the kernels have no in-kernel "
                "collectives); use dp-only meshes"
            )
        from unirec_tpu.inference.fused_qformer import supports_fused

        use_fused = self.fused_reference_forwards
        if use_fused is None:
            use_fused = (
                jax.default_backend() == "tpu" and self.dtype == "bfloat16"
            )
        # kernel-bearing paths cannot partition under GSPMD; multi-device
        # dp meshes route through an explicit shard_map instead (exact:
        # the losses pmean their valid-field counts)
        multi = self.mesh.devices.size > 1
        use_fused = (
            use_fused
            and supports_fused(self.model_config)
            and self.mesh.shape["tp"] == 1
        )
        kernel_step = use_fused or fused_anchor
        step = make_train_step(
            self.model, self.reconstruction_weight, self.contrastive_weight,
            fused_reference_config=self.model_config if use_fused else None,
            fused_precision=self.fused_precision,
            seed=self.train_config.seed,
            axis_name="dp" if (kernel_step and multi) else None,
        )
        self._dp_shard_map = bool(kernel_step and multi)
        if self._dp_shard_map:
            from unirec_tpu.parallel.mesh import dp_shard_map_jit

            self._train_step = dp_shard_map_jit(step, self.mesh)
        else:
            self._train_step = data_parallel_jit(step, self.mesh)
        self._eval_step = make_eval_step(self.model)
        self.dp_size = self.mesh.shape["dp"]

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.train_config.seed if seed is None else seed
        cfg = self.model_config
        dummy_emb = jnp.zeros((2, cfg.num_fields, cfg.field_embedding_dim))
        dummy_mask = jnp.ones((2, cfg.num_fields))
        params = self.model.init(
            jax.random.PRNGKey(seed), dummy_emb, dummy_mask
        )["params"]
        tx = make_optimizer(self.train_config.optimizer)
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx
        )
        return replicate(self.mesh, state)

    def _gather_batch(
        self, cache: FieldEmbeddingCache, pairs: np.ndarray, neg: np.ndarray
    ) -> Dict[str, np.ndarray]:
        a, p = pairs[:, 0], pairs[:, 1]
        return {
            "anchor_emb": cache.embeddings[a],
            "anchor_mask": cache.masks[a],
            "pos_emb": cache.embeddings[p],
            "pos_mask": cache.masks[p],
            "neg_emb": cache.embeddings[neg],
            "neg_mask": cache.masks[neg],
        }

    def train_epoch(
        self,
        state: TrainState,
        cache: FieldEmbeddingCache,
        pairs: np.ndarray,
        rng: np.random.Generator,
        batch_size: Optional[int] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        batch_size = batch_size or self.train_config.batch_size

        def stream():
            for idx in epoch_batches(rng, len(pairs), batch_size):
                bp = pairs[idx]
                neg = sample_negatives(rng, bp, len(cache))
                batch, _ = pad_batch(
                    self._gather_batch(cache, bp, neg), self.dp_size
                )
                yield batch

        from unirec_tpu.parallel.mesh import batch_sharding

        state, mean, _ = drive_steps(
            self._train_step, state, stream(), sharding=batch_sharding(self.mesh)
        )
        return state, mean

    def evaluate(
        self,
        state: TrainState,
        cache: FieldEmbeddingCache,
        rows: Optional[np.ndarray] = None,
        batch_size: int = 512,
    ) -> Dict[str, float]:
        rows = np.arange(len(cache)) if rows is None else rows
        total_mse, total_cos, total_fields, n_batches = 0.0, 0.0, 0.0, 0
        for i in range(0, len(rows), batch_size):
            r = rows[i : i + batch_size]
            emb, mask = cache.embeddings[r], cache.masks[r]
            if len(r) < batch_size:
                # pad the tail to the compiled shape with ZERO masks (the
                # metrics are mask-normalized, so pad rows contribute
                # nothing) — a ragged final batch would retrace through
                # the minutes-long remote compile (CLAUDE.md)
                pad = batch_size - len(r)
                emb = np.concatenate(
                    [emb, np.zeros_like(emb[:1]).repeat(pad, 0)]
                )
                mask = np.concatenate(
                    [mask, np.zeros_like(mask[:1]).repeat(pad, 0)]
                )
            mse, cos_sum, n_valid = self._eval_step(
                state.params, jnp.asarray(emb), jnp.asarray(mask)
            )
            total_mse += float(mse)
            total_cos += float(cos_sum)
            total_fields += float(n_valid)
            n_batches += 1
        return {
            "val_recon_loss": total_mse / max(n_batches, 1),
            "avg_cosine_similarity": total_cos / max(total_fields, 1.0),
        }


def train_item_qformer(
    cache: FieldEmbeddingCache,
    item_sequences: Sequence[Sequence[str]],
    model_config: Optional[ItemQFormerConfig] = None,
    train_config: Optional[TrainConfig] = None,
    val_rows: Optional[np.ndarray] = None,
    checkpoint_dir: Optional[str] = None,
    contrastive_weight: float = 0.25,
    dtype: str = "float32",
    fused_precision: str = "bf16",
    resume: bool = False,
    metrics_logger=None,
    log_fn=print,
) -> Tuple[TrainState, Dict[str, float]]:
    """Full training driver (reference: train_qformer,
    item_qformer_training.py:70-187).  ``resume=True`` restores params +
    optimizer state + step from ``checkpoint_dir`` (the epoch counter
    restarts; the optimizer step and best-val watermark continue)."""
    model_config = model_config or ItemQFormerConfig(
        num_fields=cache.num_fields, field_embedding_dim=cache.embedding_dim
    )
    train_config = train_config or TrainConfig()
    trainer = ItemQFormerTrainer(
        model_config, train_config, contrastive_weight=contrastive_weight,
        dtype=dtype, fused_precision=fused_precision,
    )
    state = trainer.init_state()
    pairs = build_triplet_pairs(item_sequences, cache.id_to_row)
    rng = np.random.default_rng(train_config.seed)

    best_val = float("inf")
    if resume:
        from unirec_tpu.utils.checkpoint import resume_train_state

        state, meta = resume_train_state(
            checkpoint_dir, state, log_fn,
            expect_grad_accum=train_config.optimizer
            .gradient_accumulation_steps,
        )
        best_val = float(meta.get("val_recon_loss", float("inf")))
    last_metrics: Dict[str, float] = {}
    for epoch in range(train_config.num_epochs):
        state, train_metrics = trainer.train_epoch(state, cache, pairs, rng)
        log_fn(f"epoch {epoch + 1}: {train_metrics}")
        if metrics_logger:
            metrics_logger.log(dict(train_metrics), step=int(state.step))
        if (epoch + 1) % train_config.eval_every_epochs == 0:
            val = trainer.evaluate(state, cache, val_rows)
            log_fn(f"epoch {epoch + 1} val: {val}")
            if metrics_logger:
                metrics_logger.log(dict(val), step=int(state.step))
            last_metrics = {**train_metrics, **val}
            if val["val_recon_loss"] < best_val and checkpoint_dir:
                best_val = val["val_recon_loss"]
                from unirec_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_dir,
                    state,
                    config=model_config,
                    extra={"field_names": list(cache.fields),
                           "val_recon_loss": best_val,
                           "grad_accum": train_config.optimizer
                           .gradient_accumulation_steps},
                )
        else:
            last_metrics = train_metrics
    from unirec_tpu.train.common import flush_grad_accum

    state = flush_grad_accum(state, train_config.optimizer)
    return state, last_metrics
