"""TRAINABLE fused Q-Former attention blocks (custom VJP, Pallas TPU).

The inference engine (ops/fused_qformer_layer.py) fuses each attention
block — QKV projections, per-item attention packed into MXU tiles, output
projection — into one kernel, and runs the item-stage forward ~2x faster
than XLA (BASELINE.md round-5 dissection: 13.3k vs 6.6k items/s).  Training
could not use it: no VJP.  This module adds training variants:

    out = W_o · Attention(W_qkv · x) + b_o          (self, packed items)
    out = W_o · Attention(W_q x, W_kv mem) + b_o    (cross, packed items)

deliberately STOPPING before the residual/dropout/LayerNorm tail — hidden
dropout (reference models/qformer.py:330-346) sits between the output
projection and the residual add, so keeping the tail in XLA preserves the
reference's hidden-dropout semantics exactly.  Attention-PROB dropout is
the one semantic not supported (the kernels recompute deterministic probs
in the backward); the model dispatch engages these blocks only when
``attention_probs_dropout_prob`` is inactive, mirroring ``flash_training``.

Forward kernels save the projected activations (qkv / q_all+kv) and the
attention context as residuals — the same tensors the XLA path stores —
and the backward runs ONE kernel per block computing the projection-input
gradients (softmax backward + the tiny per-item score/context matmuls all
in VMEM); the large weight-gradient GEMMs (x^T·dqkv, ctx^T·dout, ...) are
left to XLA, where they run at full MXU rate on [rows, D]-sized operands.
No gradient accumulation across grid steps: every tile owns its rows, so
each backward output block is written exactly once.

Masking: a per-KEY additive bias (0 valid / -1e9 missing) plus the static
per-item block diagonal — exactly the item Q-Former semantics (queries are
never masked, reference models/qformer_utils.py:43).  Paths with 2-D
attention masks (UniLM / causal text decoding) must stay on the XLA path.

Layouts follow the inference engine: rows item-major [B*K, D], heads as
column ranges, memory field-major [B*F, D].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from unirec_tpu.ops.fused_qformer_layer import NEG_INF, _row2d

_TILE_ROWS = 256


def _block_bias(t, t_kv, n_q, n_kv):
    """Static per-item block-diagonal additive bias [t, t_kv]."""
    qi = jax.lax.broadcasted_iota(jnp.int32, (t, t_kv), 0) // n_q
    ki = jax.lax.broadcasted_iota(jnp.int32, (t, t_kv), 1) // n_kv
    # strictly below the per-key -1e9 so an item with zero valid keys
    # spreads softmax over its OWN keys, never onto packed neighbours
    # (same constant as ops/fused_qformer_layer._cross_block_kernel)
    return jnp.where(qi == ki, 0.0, 2.0 * NEG_INF).astype(jnp.float32)


def _attn_heads_fwd(q_all, kv_k, kv_v, bias, num_heads, sm_scale, ctx_ref):
    """Per-head streaming attention into ctx_ref columns (fwd math shared
    by self/cross kernels); q_all [T, D], kv_k/kv_v [T_m, D]."""
    d = q_all.shape[-1]
    hd = d // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = (
            jax.lax.dot_general(
                q_all[:, sl], kv_k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
            + bias
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        ctx_ref[:, sl] = jax.lax.dot_general(
            p.astype(kv_v.dtype), kv_v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(ctx_ref.dtype)


def _attn_heads_bwd(
    q_all, kv_k, kv_v, bias, dctx, num_heads, sm_scale, dq_ref, dk_ref, dv_ref
):
    """Per-head attention backward: recompute probs, softmax VJP, write
    dq/dk/dv column ranges.  All operands VMEM-resident."""
    d = q_all.shape[-1]
    hd = d // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_all[:, sl]
        kh = kv_k[:, sl]
        vh = kv_v[:, sl]
        s = (
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
            + bias
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))  # [T, T_m] fp32
        dctx_h = dctx[:, sl]  # fp32
        dp = jax.lax.dot_general(
            dctx_h.astype(vh.dtype), vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * sm_scale).astype(qh.dtype)
        dq_ref[:, sl] = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[:, sl] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        dv_ref[:, sl] = jax.lax.dot_general(
            p.astype(dctx_h.dtype), dctx_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# self block
# ---------------------------------------------------------------------------


def _self_fwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, kbias_ref,
    out_ref, qkv_ref, ctx_ref,
    *, num_heads, n_q, sm_scale,
):
    t, d = x_ref.shape
    x = x_ref[...]
    qkv = (
        jax.lax.dot_general(
            x, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    qkv_ref[...] = qkv
    bias = _block_bias(t, t, n_q, n_q) + kbias_ref[0, 0].astype(jnp.float32)
    _attn_heads_fwd(
        qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :], bias, num_heads,
        sm_scale, ctx_ref,
    )
    out_ref[...] = (
        jax.lax.dot_general(
            ctx_ref[...].astype(x.dtype), wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)


def _self_bwd_kernel(
    qkv_ref, wo_ref, kbias_ref, dout_ref,
    dqkv_ref,
    *, num_heads, n_q, sm_scale,
):
    t = qkv_ref.shape[0]
    d = qkv_ref.shape[1] // 3
    qkv = qkv_ref[...]
    dctx = jax.lax.dot_general(
        dout_ref[...], wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # dout · Wo^T  [T, D] fp32
    bias = _block_bias(t, t, n_q, n_q) + kbias_ref[0, 0].astype(jnp.float32)
    _attn_heads_bwd(
        qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :], bias, dctx,
        num_heads, sm_scale,
        _ColView(dqkv_ref, 0), _ColView(dqkv_ref, d), _ColView(dqkv_ref, 2 * d),
    )


class _ColView:
    """Column-range view over a Ref, so _attn_heads_bwd can write dq/dk/dv
    into one [T, 3D] buffer without slicing syntax on the Ref itself."""

    def __init__(self, ref, base):
        self.ref = ref
        self.base = base

    def __setitem__(self, idx, val):
        rows, cols = idx
        self.ref[rows, slice(self.base + cols.start, self.base + cols.stop)] = val

    @property
    def dtype(self):
        return self.ref.dtype


def _pad_rows(a, rows):
    pad = rows - a.shape[0]
    return jnp.pad(a, ((0, pad), (0, 0))) if pad else a


def _self_fwd(x2, kbias, wqkv, bqkv, wo, bo, num_heads, n_q, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = x2.shape
    tile = _TILE_ROWS if _TILE_ROWS % n_q == 0 else n_q
    n_tiles = rows // tile
    hd = d // num_heads
    kernel = functools.partial(
        _self_fwd_kernel, num_heads=num_heads, n_q=n_q,
        sm_scale=1.0 / hd ** 0.5,
    )
    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    out, qkv, ctx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3 * d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((rows, 3 * d), x2.dtype),
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
        ],
        interpret=interpret,
    )(x2, wqkv, _row2d(bqkv), wo, _row2d(bo), kbias.reshape(n_tiles, 1, tile))
    return out, qkv, ctx


def _self_bwd_call(qkv, wo, kbias, dout, num_heads, n_q, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d3 = qkv.shape
    d = d3 // 3
    tile = _TILE_ROWS if _TILE_ROWS % n_q == 0 else n_q
    n_tiles = rows // tile
    hd = d // num_heads
    kernel = functools.partial(
        _self_bwd_kernel, num_heads=num_heads, n_q=n_q,
        sm_scale=1.0 / hd ** 0.5,
    )
    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 3 * d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 3 * d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 3 * d), qkv.dtype),
        interpret=interpret,
    )(qkv, wo, kbias.reshape(n_tiles, 1, tile), dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _self_block(x2, kbias, wqkv, bqkv, wo, bo, num_heads, n_q, interpret):
    out, _, _ = _self_fwd(
        x2, kbias, wqkv, bqkv, wo, bo, num_heads, n_q, interpret
    )
    return out


def _self_vjp_fwd(x2, kbias, wqkv, bqkv, wo, bo, num_heads, n_q, interpret):
    out, qkv, ctx = _self_fwd(
        x2, kbias, wqkv, bqkv, wo, bo, num_heads, n_q, interpret
    )
    return out, (x2, kbias, qkv, ctx, wqkv, wo)


def _self_vjp_bwd(num_heads, n_q, interpret, res, dout):
    x2, kbias, qkv, ctx, wqkv, wo = res
    dqkv = _self_bwd_call(qkv, wo, kbias, dout, num_heads, n_q, interpret)
    f32 = jnp.float32
    dx = jax.lax.dot_general(
        dqkv, wqkv, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).astype(x2.dtype)
    dwqkv = jax.lax.dot_general(
        x2, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv.astype(f32), axis=0).astype(dqkv.dtype)
    dwo = jax.lax.dot_general(
        ctx, dout, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(wo.dtype)
    dbo = jnp.sum(dout.astype(f32), axis=0).astype(dout.dtype)
    return dx, jnp.zeros_like(kbias), dwqkv, dbqkv, dwo, dbo


_self_block.defvjp(_self_vjp_fwd, _self_vjp_bwd)


def fused_self_attention_train(
    x: jax.Array,          # [B, K, D]
    key_bias: jax.Array,   # [B, K] additive (0 valid / -1e9 masked); queries
    wqkv: jax.Array,       # [D, 3D]
    bqkv: jax.Array,       # [3D]
    wo: jax.Array,         # [D, D]
    bo: jax.Array,         # [D]
    *,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """W_o·SelfAttn(x) + b_o with items packed into MXU tiles;
    differentiable (custom VJP).  Returns [B, K, D] PRE-residual/LN."""
    b, k, d = x.shape
    tile = _TILE_ROWS if _TILE_ROWS % k == 0 else k
    rows = b * k
    pad = (-rows) % tile
    x2 = _pad_rows(x.reshape(rows, d), rows + pad)
    kb = key_bias.reshape(rows)
    if pad:
        kb = jnp.pad(kb, (0, pad))
    out = _self_block(
        x2, kb, wqkv, bqkv, wo, bo, num_heads, k, interpret
    )
    return out[:rows].reshape(b, k, d)


# ---------------------------------------------------------------------------
# cross block
# ---------------------------------------------------------------------------


def _cross_fwd_kernel(
    x_ref, mem_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref, bo_ref,
    kbias_ref,
    out_ref, q_ref, kv_ref, ctx_ref,
    *, num_heads, n_q, n_kv, sm_scale,
):
    t, d = x_ref.shape
    t_m = mem_ref.shape[0]
    x = x_ref[...]
    mem = mem_ref[...]
    q_all = (
        jax.lax.dot_general(
            x, wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bq_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    q_ref[...] = q_all
    kv = (
        jax.lax.dot_general(
            mem, wkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    kv_ref[...] = kv
    bias = _block_bias(t, t_m, n_q, n_kv) + kbias_ref[0, 0].astype(jnp.float32)
    _attn_heads_fwd(
        q_all, kv[:, :d], kv[:, d:], bias, num_heads, sm_scale, ctx_ref
    )
    out_ref[...] = (
        jax.lax.dot_general(
            ctx_ref[...].astype(x.dtype), wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)


def _cross_bwd_kernel(
    q_ref, kv_ref, wo_ref, kbias_ref, dout_ref,
    dq_ref, dkv_ref,
    *, num_heads, n_q, n_kv, sm_scale,
):
    t, d = q_ref.shape
    t_m = kv_ref.shape[0]
    q_all = q_ref[...]
    kv = kv_ref[...]
    dctx = jax.lax.dot_general(
        dout_ref[...], wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bias = _block_bias(t, t_m, n_q, n_kv) + kbias_ref[0, 0].astype(jnp.float32)
    _attn_heads_bwd(
        q_all, kv[:, :d], kv[:, d:], bias, dctx, num_heads, sm_scale,
        dq_ref, _ColView(dkv_ref, 0), _ColView(dkv_ref, d),
    )


def _cross_fwd(x2, memf, kbias, wq, bq, wkv, bkv, wo, bo,
               num_heads, n_q, n_kv, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = x2.shape
    rows_m, dm = memf.shape
    tile = _TILE_ROWS if _TILE_ROWS % n_q == 0 else n_q
    p_items = tile // n_q
    n_tiles = rows // tile
    t_m = p_items * n_kv
    hd = d // num_heads
    kernel = functools.partial(
        _cross_fwd_kernel, num_heads=num_heads, n_q=n_q, n_kv=n_kv,
        sm_scale=1.0 / hd ** 0.5,
    )
    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    out, q_all, kv, ctx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_m, dm), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_m, 2 * d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((rows_m, 2 * d), x2.dtype),
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
        ],
        interpret=interpret,
    )(x2, memf, wq, _row2d(bq), wkv, _row2d(bkv), wo, _row2d(bo),
      kbias.reshape(n_tiles, 1, t_m))
    return out, q_all, kv, ctx


def _cross_bwd_call(q_all, kv, wo, kbias, dout, num_heads, n_q, n_kv,
                    interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = q_all.shape
    rows_m = kv.shape[0]
    tile = _TILE_ROWS if _TILE_ROWS % n_q == 0 else n_q
    p_items = tile // n_q
    n_tiles = rows // tile
    t_m = p_items * n_kv
    hd = d // num_heads
    kernel = functools.partial(
        _cross_bwd_kernel, num_heads=num_heads, n_q=n_q, n_kv=n_kv,
        sm_scale=1.0 / hd ** 0.5,
    )
    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_m, 2 * d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_m, 2 * d), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), q_all.dtype),
            jax.ShapeDtypeStruct((rows_m, 2 * d), kv.dtype),
        ],
        interpret=interpret,
    )(q_all, kv, wo, kbias.reshape(n_tiles, 1, t_m), dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _cross_block(x2, memf, kbias, wq, bq, wkv, bkv, wo, bo,
                 num_heads, n_q, n_kv, interpret):
    out, _, _, _ = _cross_fwd(
        x2, memf, kbias, wq, bq, wkv, bkv, wo, bo, num_heads, n_q, n_kv,
        interpret,
    )
    return out


def _cross_vjp_fwd(x2, memf, kbias, wq, bq, wkv, bkv, wo, bo,
                   num_heads, n_q, n_kv, interpret):
    out, q_all, kv, ctx = _cross_fwd(
        x2, memf, kbias, wq, bq, wkv, bkv, wo, bo, num_heads, n_q, n_kv,
        interpret,
    )
    return out, (x2, memf, kbias, q_all, kv, ctx, wq, wkv, wo)


def _cross_vjp_bwd(num_heads, n_q, n_kv, interpret, res, dout):
    x2, memf, kbias, q_all, kv, ctx, wq, wkv, wo = res
    dq_all, dkv = _cross_bwd_call(
        q_all, kv, wo, kbias, dout, num_heads, n_q, n_kv, interpret
    )
    f32 = jnp.float32
    dx = jax.lax.dot_general(
        dq_all, wq, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).astype(x2.dtype)
    dmem = jax.lax.dot_general(
        dkv, wkv, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).astype(memf.dtype)
    dwq = jax.lax.dot_general(
        x2, dq_all, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(wq.dtype)
    dbq = jnp.sum(dq_all.astype(f32), axis=0).astype(dq_all.dtype)
    dwkv = jax.lax.dot_general(
        memf, dkv, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(wkv.dtype)
    dbkv = jnp.sum(dkv.astype(f32), axis=0).astype(dkv.dtype)
    dwo = jax.lax.dot_general(
        ctx, dout, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(wo.dtype)
    dbo = jnp.sum(dout.astype(f32), axis=0).astype(dout.dtype)
    return (dx, dmem, jnp.zeros_like(kbias), dwq, dbq, dwkv, dbkv, dwo, dbo)


_cross_block.defvjp(_cross_vjp_fwd, _cross_vjp_bwd)


def fused_cross_attention_train(
    x: jax.Array,          # [B, K, D] queries
    mem: jax.Array,        # [B, F, Dm] field memory
    key_bias: jax.Array,   # [B, F] additive (0 valid / -1e9 missing)
    wq: jax.Array,
    bq: jax.Array,
    wkv: jax.Array,        # [Dm, 2D] concat W_k|W_v
    bkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    *,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """W_o·CrossAttn(x -> mem) + b_o, packed items, differentiable.
    Returns [B, K, D] PRE-residual/LN; grads flow to x, mem and weights."""
    b, k, d = x.shape
    f, dm = mem.shape[1], mem.shape[2]
    tile = _TILE_ROWS if _TILE_ROWS % k == 0 else k
    p_items = tile // k
    pad_b = (-b) % p_items
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        mem = jnp.pad(mem, ((0, pad_b), (0, 0), (0, 0)))
        key_bias = jnp.pad(
            key_bias, ((0, pad_b), (0, 0)), constant_values=NEG_INF
        )
    bp = x.shape[0]
    out = _cross_block(
        x.reshape(bp * k, d), mem.reshape(bp * f, dm),
        key_bias.reshape(bp * f), wq, bq, wkv, bkv, wo, bo,
        num_heads, k, f, interpret,
    )
    return out.reshape(bp, k, d)[:b]


def supports_fused_train(k: int, d: int, num_heads: int, f: int = 1) -> bool:
    """Shape gate: items must tile into the 256-row MXU block, heads must
    split the hidden dim, the packed memory tile must stay VMEM-sized, and
    the VMEM-resident weight blocks must fit — the self forward holds
    wqkv [d, 3d] + wo [d, d] bf16 (8 bytes * d^2) next to ~3 MB of
    activation tiles, which caps d at 1024 under the 16 MB scoped limit
    (d=1152 already needs ~16.7 MB).  Callers fall back to XLA beyond."""
    return (
        k > 0
        and _TILE_ROWS % k == 0
        and d % num_heads == 0
        and d <= 1024
        and (_TILE_ROWS // k) * f <= 512
    )
