"""Joint training: Qwen3 + LoRA + Item Q-Former with InfoNCE ranking loss.

TPU-native rebuild of the flagship trainer
(reference: training/train_item_individual_token_joint.py):

* dataset assembly mirrors AmazonBeautyTrain/ValDataset (:595-680): history
  field embeddings pulled from the shared cache, candidate embeddings from a
  precomputed item-embedding dict, prompt built by construct_input_text;
* the collator pads negatives to ``max_negatives`` with masks (:290-323);
* one jit step: Q-Former fwd -> token injection -> 28-layer Qwen3 fwd ->
  pooling -> InfoNCE -> backward through LoRA + extra token embeddings + the
  whole Q-Former (base Qwen3 weights frozen via optax.multi_transform,
  matching PEFT's behavior, :121-132);
* evaluation computes MRR and Recall@K/NDCG@K over the 100-candidate pool in
  one vectorized pass (:355-419 computes MRR only, per-sample).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unirec_tpu.configs import (
    ItemQFormerConfig,
    JointModelConfig,
    LoRAConfig,
    OptimizerConfig,
    Qwen3Config,
    TrainConfig,
)
from unirec_tpu.data.cache import FieldEmbeddingCache
from unirec_tpu.data.tokenizer import BaseTokenizer
from unirec_tpu.models.joint import MultiModalQwenEmbedding, construct_input_text
from unirec_tpu.ops.losses import info_nce_loss
from unirec_tpu.parallel.mesh import (
    make_mesh,
    pad_batch,
    replicate,
    shard_batch,
)
from unirec_tpu.train.common import TrainState, epoch_batches, make_optimizer
from unirec_tpu.utils.params import lora_trainable_mask


class JointDataset:
    """Assembles fixed-shape joint batches from rec samples.

    ``data``: list of {history, candidate, ground_truth} samples
    (reference sample schema, process_rec_old_user.py:74-79).
    """

    def __init__(
        self,
        data: Sequence[Dict],
        item_emb_dict: Dict[str, Sequence[float]],
        tokenizer: BaseTokenizer,
        item_dict: Dict[str, Dict],
        field_cache: FieldEmbeddingCache,
        joint_config: JointModelConfig = JointModelConfig(),
        max_negatives: int = 10,
        item_emb_dim: int = 1024,
    ):
        self.data = list(data)
        self.item_emb_dict = item_emb_dict
        self.tokenizer = tokenizer
        self.item_dict = item_dict
        self.cache = field_cache
        self.jc = joint_config
        self.max_negatives = max_negatives
        self.item_emb_dim = item_emb_dim

    def __len__(self) -> int:
        return len(self.data)

    def _candidate_embeddings(self, sample: Dict) -> Tuple[np.ndarray, np.ndarray]:
        """(positive [D], negatives [C-1, D]); unknown ids -> zeros
        (reference: train_item_individual_token_joint.py:609-618)."""
        candidates = sample["candidate"]
        gt = sample["ground_truth"]
        default = np.zeros(self.item_emb_dim, np.float32)
        embs = np.stack(
            [
                np.asarray(self.item_emb_dict.get(str(c), default), np.float32)
                for c in candidates
            ]
        )
        gt_idx = candidates.index(gt)
        positive = embs[gt_idx]
        negatives = np.delete(embs, gt_idx, axis=0)
        return positive, negatives

    def batch(self, indices: Sequence[int], max_negatives: Optional[int] = None
              ) -> Dict[str, np.ndarray]:
        jc = self.jc
        max_neg = max_negatives or self.max_negatives
        n = len(indices)
        num_fields = self.cache.num_fields
        fd = self.cache.embedding_dim

        input_ids = np.zeros((n, jc.max_length), np.int32)
        attn = np.zeros((n, jc.max_length), np.float32)
        hist_emb = np.zeros(
            (n, jc.num_history_items, num_fields, fd), np.float32
        )
        hist_mask = np.zeros((n, jc.num_history_items, num_fields), np.float32)
        pos = np.zeros((n, self.item_emb_dim), np.float32)
        negs = np.zeros((n, max_neg, self.item_emb_dim), np.float32)
        neg_mask = np.zeros((n, max_neg), np.float32)

        for bi, si in enumerate(indices):
            sample = self.data[si]
            history = [str(h) for h in sample["history"]][: jc.num_history_items]
            e, m = self.cache.gather(history)
            hist_emb[bi, : len(history)] = e
            hist_mask[bi, : len(history)] = m

            text = construct_input_text(
                history,
                self.item_dict,
                jc.num_history_items,
                jc.num_query_tokens_per_item,
            )
            ids, mask = self.tokenizer.encode(text, jc.max_length)
            input_ids[bi], attn[bi] = ids, mask

            p, ns = self._candidate_embeddings(sample)
            pos[bi] = p
            k = min(len(ns), max_neg)
            negs[bi, :k] = ns[:k]
            neg_mask[bi, :k] = 1.0

        return {
            "input_ids": input_ids,
            "attention_mask": attn,
            "history_field_embeddings": hist_emb,
            "history_attention_mask": hist_mask,
            "positive_item_embeddings": pos,
            "negative_item_embeddings": negs,
            "negative_masks": neg_mask,
        }


def make_joint_train_step(model: MultiModalQwenEmbedding, temperature: float = 0.07):
    def step(state: TrainState, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), state.step)

        def loss_fn(params):
            user_emb = model.apply(
                {"params": params},
                batch["input_ids"],
                batch["attention_mask"],
                batch["history_field_embeddings"],
                batch["history_attention_mask"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            return info_nce_loss(
                user_emb,
                batch["positive_item_embeddings"],
                batch["negative_item_embeddings"],
                batch["negative_masks"],
                temperature,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step


def make_joint_optimizer(
    params, opt_cfg: OptimizerConfig
) -> optax.GradientTransformation:
    """AdamW on LoRA + extra token embeddings + Q-Former; base Qwen3 frozen
    (PEFT-equivalent, reference: train_item_individual_token_joint.py:121-132)."""
    mask = lora_trainable_mask(params)
    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", mask
    )
    return optax.multi_transform(
        {"train": make_optimizer(opt_cfg), "freeze": optax.set_to_zero()},
        labels,
    )


@dataclasses.dataclass
class JointTrainer:
    qwen_config: Qwen3Config
    qformer_config: ItemQFormerConfig
    joint_config: JointModelConfig = JointModelConfig()
    lora: LoRAConfig = LoRAConfig()
    train_config: TrainConfig = TrainConfig(batch_size=16)
    dtype: str = "float32"
    remat: bool = False

    def __post_init__(self):
        self.model = MultiModalQwenEmbedding(
            self.qwen_config,
            self.qformer_config,
            self.joint_config,
            lora=self.lora,
            dtype=jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32,
            remat=self.remat,
        )
        self.mesh = make_mesh(self.train_config.mesh)
        self.dp_size = self.mesh.shape["dp"]
        self.tp_size = self.mesh.shape["tp"]
        self._raw_step = make_joint_train_step(self.model)
        self._train_step = None  # jitted lazily once state shardings exist
        self._state_shardings = None
        self._eval_fwd = jax.jit(
            lambda p, ids, m, he, hm: self.model.apply(
                {"params": p}, ids, m, he, hm
            )
        )

    def state_shardings(self, state: TrainState):
        """Sharding tree for the train state: Qwen3 kernels tensor-sharded
        over 'tp' (models/qwen3.tp_spec_for_path matches params AND the
        optimizer's mu/nu trees by path), everything else replicated."""
        from jax.sharding import NamedSharding

        from unirec_tpu.models.qwen3 import tp_spec_for_path

        if self.tp_size <= 1:
            from unirec_tpu.parallel.mesh import replicated

            sh = replicated(self.mesh)
            return jax.tree_util.tree_map(lambda _: sh, state)
        return jax.tree_util.tree_map_with_path(
            lambda path, x: NamedSharding(
                self.mesh, tp_spec_for_path(path, np.ndim(x))
            ),
            state,
        )

    def init_state(
        self, qformer_params=None, qwen_params=None, seed: Optional[int] = None
    ) -> TrainState:
        seed = self.train_config.seed if seed is None else seed
        jc = self.joint_config
        qc = self.qformer_config
        dummy = {
            "input_ids": jnp.zeros((2, jc.max_length), jnp.int32),
            "attention_mask": jnp.ones((2, jc.max_length)),
            "history_field_embeddings": jnp.zeros(
                (2, jc.num_history_items, qc.num_fields, qc.field_embedding_dim)
            ),
            "history_attention_mask": jnp.ones(
                (2, jc.num_history_items, qc.num_fields)
            ),
        }
        params = self.model.init(
            jax.random.PRNGKey(seed),
            dummy["input_ids"],
            dummy["attention_mask"],
            dummy["history_field_embeddings"],
            dummy["history_attention_mask"],
        )["params"]
        from unirec_tpu.utils.params import merge_params

        if qformer_params is not None:
            params = dict(params)
            params["qformer"] = merge_params(
                params["qformer"], qformer_params
            )
        if qwen_params is not None:
            params = dict(params)
            params["base_model"] = merge_params(
                params["base_model"], qwen_params
            )
        tx = make_joint_optimizer(params, self.train_config.optimizer)
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx
        )
        self._state_shardings = self.state_shardings(state)
        from unirec_tpu.parallel.mesh import mixed_parallel_jit, shard_like

        self._train_step = mixed_parallel_jit(
            self._raw_step, self.mesh, self._state_shardings
        )
        return shard_like(state, self._state_shardings)

    def train_epoch(
        self,
        state: TrainState,
        dataset: JointDataset,
        rng: np.random.Generator,
        batch_size: Optional[int] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        batch_size = batch_size or self.train_config.batch_size
        sums: Dict[str, float] = {}
        count = 0
        for idx in epoch_batches(rng, len(dataset), batch_size):
            batch = dataset.batch(idx)
            batch, _ = pad_batch(batch, self.dp_size)
            batch = shard_batch(self.mesh, batch)
            state, metrics = self._train_step(state, batch)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        return state, {k: v / max(count, 1) for k, v in sums.items()}

    def train_steps(
        self,
        state: TrainState,
        dataset: JointDataset,
        rng: np.random.Generator,
        num_steps: int,
        batch_size: Optional[int] = None,
        step_hook=None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """Step-driven training with an optional per-step hook
        (reference evaluates every N global steps via a Trainer callback,
        train_item_individual_token_joint.py:439-474)."""
        batch_size = batch_size or self.train_config.batch_size
        it = None
        last: Dict[str, float] = {}
        for step in range(num_steps):
            if it is None:
                it = epoch_batches(rng, len(dataset), batch_size)
            try:
                idx = next(it)
            except StopIteration:
                it = epoch_batches(rng, len(dataset), batch_size)
                idx = next(it)
            batch = dataset.batch(idx)
            batch, _ = pad_batch(batch, self.dp_size)
            batch = shard_batch(self.mesh, batch)
            state, metrics = self._train_step(state, batch)
            last = {k: float(v) for k, v in metrics.items()}
            if step_hook is not None:
                state = step_hook(int(state.step), state, last) or state
        return state, last

    def evaluate(
        self,
        state: TrainState,
        dataset: JointDataset,
        batch_size: int = 32,
        max_negatives: int = 99,
        ks: Tuple[int, ...] = (1, 5, 10),
    ) -> Dict[str, float]:
        """MRR + Recall@K + NDCG@K over the full candidate pool
        (reference MRREvaluator :355-419 + the metrics BASELINE.json adds).

        Tail batches are padded to ``batch_size`` so every step reuses one
        compiled shape; padded rows' ranks are trimmed before aggregation.
        """
        from unirec_tpu.ops.ranking import rank_of_positive
        from unirec_tpu.train.common import pad_to_batch

        rank_fn = jax.jit(rank_of_positive)
        ranks: List[np.ndarray] = []
        for i in range(0, len(dataset), batch_size):
            idx = list(range(i, min(i + batch_size, len(dataset))))
            batch = dataset.batch(idx, max_negatives=max_negatives)
            batch, n = pad_to_batch(batch, batch_size)
            user = self._eval_fwd(
                state.params,
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["history_field_embeddings"]),
                jnp.asarray(batch["history_attention_mask"]),
            )
            r = rank_fn(
                user,
                jnp.asarray(batch["positive_item_embeddings"]),
                jnp.asarray(batch["negative_item_embeddings"]),
                jnp.asarray(batch["negative_masks"]),
            )
            ranks.append(np.asarray(r)[:n])
        all_ranks = np.concatenate(ranks).astype(np.float64)
        out: Dict[str, float] = {"mrr": float(np.mean(1.0 / all_ranks))}
        for k in ks:
            hit = all_ranks <= k
            out[f"recall@{k}"] = float(hit.mean())
            out[f"ndcg@{k}"] = float(
                np.where(hit, 1.0 / np.log2(all_ranks + 1.0), 0.0).mean()
            )
        return out
