"""Attention primitives for the Q-Former stacks.

The reference computes attention as unfused torch matmuls with an additive
``-10000`` mask (reference: models/qformer.py:204-264, 793-801).  On TPU the
equivalent is:

* ``attention``: an XLA einsum path — XLA fuses the softmax chain into the
  matmuls; right choice for the item Q-Former where the memory axis is tiny
  (~14 fields) and attention-prob dropout is required during training.
* ``flash_cross_attention``: a Pallas kernel with streaming softmax, blocked
  over the memory (key/value) axis so the [B, H, Lq, Lkv] score matrix never
  touches HBM.  Right choice for the user Q-Former whose cross-attention
  memory is seq_len * K query tokens (up to ~2k vectors,
  reference: models/user_sequence_encoder.py:133-136) and for any
  long-history scaling beyond that (SURVEY.md §5 "long-context").

Both share the signature (q, k, v, bias) with per-head layout
``[B, H, L, head_dim]`` and an additive bias broadcastable to
``[B, H, Lq, Lkv]``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Large negative for masked logits.  exp(-1e9) == 0.0 in fp32, numerically
# identical to the reference's additive -10000 (models/qformer.py:801).
NEG_INF = -1e9

# Memory length at which the Pallas streaming kernel beats the XLA path.
_FLASH_MIN_KV = 1024


def make_additive_mask(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, Lk] 0/1 validity mask -> additive bias [B, 1, 1, Lk].

    Mirrors ``(1.0 - mask) * -10000`` (reference: models/qformer.py:798-801).
    """
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]


def make_causal_mask(
    attention_mask: jax.Array,
    seq_length: int,
    query_length: int = 0,
    dtype=jnp.float32,
) -> jax.Array:
    """Causal (+ optional UniLM query-prefix) additive mask.

    Reproduces BertModel.get_extended_attention_mask for the decoder path
    (reference: models/qformer.py:743-783): text tokens attend causally, the
    ``query_length`` prefix attends bidirectionally among itself, and all rows
    may attend to the full prefix.

    Args:
      attention_mask: [B, L_total] padding mask over the full sequence
        (queries + text).
      seq_length: length of the causal (text) part.
      query_length: length of the bidirectional prefix.
    Returns:
      additive bias [B, 1, L_total, L_total].
    """
    total = query_length + seq_length
    i = jnp.arange(total)[:, None]
    j = jnp.arange(total)[None, :]
    # Text rows: causal within text, full access to prefix.
    causal = (j <= i) | (j < query_length)
    # Query-prefix rows (UniLM): attend only within the prefix.
    prefix_rows = i < query_length
    allowed = jnp.where(prefix_rows, j < query_length, causal)
    combined = allowed[None, :, :].astype(dtype) * attention_mask[:, None, :].astype(dtype)
    return ((1.0 - combined) * NEG_INF)[:, None, :, :]


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, L, D] -> [B, H, L, D//H] (reference: models/qformer.py:161-167)."""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, L, hd] -> [B, L, H*hd] (reference: models/qformer.py:266-268)."""
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    fast: bool = False,
    return_probs: bool = False,
) -> jax.Array:
    """XLA attention.  q,k,v: [B, H, L, hd]; bias broadcastable to scores.

    ``return_probs=True`` (introspection; forces the fp32 path) returns
    ``(out, probs)`` with the post-dropout [B, H, Lq, Lkv] probabilities —
    the functional stand-in for the reference's save_attention hooks
    (reference: models/qformer.py:147-159).

    Default: softmax in fp32 regardless of input dtype (the reference runs
    fp32 throughout; under bf16 this preserves the normalizer).
    Attention-prob dropout drops whole key positions, matching nn.Dropout on
    probs (reference: models/qformer.py:256-258).

    ``fast=True`` (inference-only): bf16 scores with the exp in fp32 after a
    bf16 max-subtract — ~20% faster on small-L attention where the tiny
    batched matmuls bottleneck the MXU; relative error vs the fp32 path is
    ~1e-2, comparable to the reference's own fp16 training precision
    (train_item_individual_token_joint.py:762).
    """
    in_dtype = q.dtype
    if (
        fast and not return_probs
        and (deterministic or dropout_rate == 0.0)
        and in_dtype == jnp.bfloat16
    ):
        scale = jnp.bfloat16(1.0 / float(q.shape[-1]) ** 0.5)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.bfloat16
        ) * scale
        if bias is not None:
            s = s + bias.astype(jnp.bfloat16)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.float32)).astype(jnp.bfloat16)
        probs = e / jnp.sum(e, axis=-1, keepdims=True).astype(jnp.bfloat16)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.bfloat16
        )
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when applying attention dropout")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(in_dtype), v, preferred_element_type=jnp.float32
    )
    if return_probs:
        return out.astype(in_dtype), probs
    return out.astype(in_dtype)


# ---------------------------------------------------------------------------
# Pallas flash cross-attention (TPU)
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_ref,  # [1, 1, Lq, hd]
    k_ref,  # [1, 1, Bkv, hd]
    v_ref,  # [1, 1, Bkv, hd]
    bias_ref,  # [1, 1, 1, Bkv] or None
    o_ref,  # [1, 1, Lq, hd]
    m_scratch,  # [Lq, 128] fp32 running max
    l_scratch,  # [Lq, 128] fp32 running sum
    acc_scratch,  # [Lq, hd] fp32 accumulator
    *,
    sm_scale: float,
    num_kv_blocks: int,
):
    import jax.experimental.pallas as pl  # noqa: F401

    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0].astype(jnp.float32)  # [Lq, hd]
    k = k_ref[0, 0].astype(jnp.float32)  # [Bkv, hd]
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Lq, Bkv]
    s = s * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0, 0][None, :].astype(jnp.float32)

    m_prev = m_scratch[:, :1]  # [Lq, 1]
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [Lq, 1]
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)  # [Lq, Bkv]
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc = acc_scratch[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
    acc_scratch[...] = acc

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finish():
        l = l_scratch[:, :1]
        # All-masked rows have l == 0; emit zeros rather than NaN.
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, ...] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_kv", "interpret"))
def flash_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    block_kv: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Streaming-softmax cross attention. q: [B,H,Lq,hd], k/v: [B,H,Lkv,hd].

    bias: optional additive [B, 1, 1, Lkv] (per-key validity, shared across
    heads and queries — the only mask shape the Q-Former cross-attention uses,
    reference: models/qformer.py:185-188 where encoder_attention_mask replaces
    the self mask).  Memory axis is blocked with running max/sum, so peak
    memory is O(Lq * block_kv) per (batch, head) instead of O(Lq * Lkv).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, hd = q.shape
    lkv = k.shape[2]

    # Pad to TPU tile boundaries: rows to 8 (fp32 sublane), kv to block.
    lq_pad = max(8, ((lq + 7) // 8) * 8)
    q = _pad_to(q, 2, lq_pad) if lq != lq_pad else q
    block_kv = min(block_kv, max(128, ((lkv + 127) // 128) * 128))
    kv_pad = (-lkv) % block_kv
    if kv_pad:
        k = _pad_to(k, 2, block_kv)
        v = _pad_to(v, 2, block_kv)
        # 2*NEG_INF: padded keys must underflow to exactly zero weight even
        # on FULLY-masked rows (whose real keys sit at -1e9 and would share
        # mass with a -1e9 pad)
        pad_bias = jnp.full((b, 1, 1, kv_pad), 2.0 * NEG_INF, dtype=jnp.float32)
        if bias is None:
            bias = jnp.concatenate(
                [jnp.zeros((b, 1, 1, lkv), jnp.float32), pad_bias], axis=-1
            )
        else:
            bias = jnp.concatenate([bias.astype(jnp.float32), pad_bias], axis=-1)
    lkv_p = k.shape[2]
    num_kv_blocks = lkv_p // block_kv

    grid = (b, h, num_kv_blocks)
    q_spec = pl.BlockSpec(
        (1, 1, lq_pad, hd), lambda i, j, t: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_kv, hd), lambda i, j, t: (i, j, t, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (1, 1, 1, block_kv), lambda i, j, t: (i, 0, 0, t), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (1, 1, lq_pad, hd), lambda i, j, t: (i, j, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=1.0 / (hd**0.5),
        num_kv_blocks=num_kv_blocks,
    )
    if bias is None:
        def kernel_nobias(q_ref, k_ref, v_ref, o_ref, m_s, l_s, a_s):
            return kernel(q_ref, k_ref, v_ref, None, o_ref, m_s, l_s, a_s)

        body, in_specs, args = kernel_nobias, [q_spec, kv_spec, kv_spec], (q, k, v)
    else:
        body, in_specs, args = kernel, [q_spec, kv_spec, kv_spec, bias_spec], (
            q,
            k,
            v,
            bias,
        )

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, lq_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((lq_pad, 128), jnp.float32),
            pltpu.VMEM((lq_pad, 128), jnp.float32),
            pltpu.VMEM((lq_pad, hd), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:, :, :lq, :]


def cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatch: Pallas streaming kernel for long memory on TPU, XLA otherwise.

    Dropout on attention probs forces the XLA path (training); the flash path
    serves inference / long-memory encoding where dropout is off.
    """
    needs_dropout = dropout_rate > 0.0 and not deterministic
    if use_flash is None:
        # auto-dispatch only for inference: the Pallas kernel defines no VJP,
        # so training forwards (even with dropout 0) stay on the XLA path
        on_tpu = jax.default_backend() == "tpu"
        use_flash = on_tpu and deterministic and k.shape[2] >= _FLASH_MIN_KV
    if use_flash and not needs_dropout:
        return flash_cross_attention(q, k, v, bias)
    return attention(
        q,
        k,
        v,
        bias,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
    )
