"""Trainable flash cross-attention: custom VJP over the streaming kernel.

The inference flash kernel (ops/attention.flash_cross_attention) blocks the
memory axis so the [B, H, Lq, Lkv] score matrix never touches HBM — but it
defines no VJP, so TRAINING long-history user models fell back to the XLA
path, whose saved attention probs are exactly the memory wall (seq 200 at
batch 64 OOMs a 16 GB v5e even in bf16 — BASELINE.md round 3).

``flash_cross_attention_vjp`` makes the flash path differentiable:

* forward: streaming softmax, saves only O and the per-row (max m, sum l)
  — O(B*H*Lq) residual instead of O(B*H*Lq*Lkv);
* backward: a second Pallas kernel re-materializes each score block from
  (q, k, m, l), computing dq (accumulated across kv blocks in VMEM scratch)
  and dk/dv (written per kv block) — the classic flash-attention backward
  with D = rowsum(dO * O).

m and l are saved SEPARATELY rather than as logsumexp = m + log l: with the
reference's additive -1e9 masking, |m| ~ 1e9 and fp32 swallows the log-l
term entirely (eps at 1e9 is ~64), which silently rescales the backward's
probabilities by l.  ``s - m`` cancels the -1e9 bias exactly; the explicit
division by l keeps full precision.

No attention-prob dropout (the kernel is for deterministic-prob training;
the XLA path keeps serving dropout configs).  Bias is a per-key additive
validity mask [B, 1, 1, Lkv] and gets zero gradient (it encodes masking,
not trainable signal).

Reference semantics mirrored: additive -1e9 masking, fp32 softmax
(models/qformer.py:793-801 in the reference tree).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from unirec_tpu.ops.attention import NEG_INF, _pad_to

_LANE = 128


# ---------------------------------------------------------------------------
# forward kernel: flash + logsumexp output
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,      # [1, 1, Lq, hd]
    k_ref,      # [1, 1, Bkv, hd]
    v_ref,      # [1, 1, Bkv, hd]
    bias_ref,   # [1, 1, 1, Bkv]
    o_ref,      # [1, 1, Lq, hd]
    m_ref,      # [1, 1, Lq, 128] fp32 row max (column 0 meaningful)
    l_ref,      # [1, 1, Lq, 128] fp32 row sum
    m_scratch,  # [Lq, 128] fp32
    l_scratch,  # [Lq, 128] fp32
    acc_scratch,  # [Lq, hd] fp32
    *,
    sm_scale: float,
    num_kv_blocks: int,
):
    import jax.experimental.pallas as pl

    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    s = s + bias_ref[0, 0, 0][None, :].astype(jnp.float32)

    m_prev = m_scratch[:, :1]
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
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
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, ...] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)
        m_ref[0, 0, ...] = m_scratch[...]
        l_ref[0, 0, ...] = l_scratch[...]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref,      # [1, 1, Lq, hd]
    k_ref,      # [1, 1, Bkv, hd]
    v_ref,      # [1, 1, Bkv, hd]
    bias_ref,   # [1, 1, 1, Bkv]
    do_ref,     # [1, 1, Lq, hd]
    m_ref,      # [1, 1, Lq, 128] row max from the forward
    l_ref,      # [1, 1, Lq, 128] row sum from the forward
    dsum_ref,   # [1, 1, Lq, 128]  D = rowsum(dO * O)
    dq_ref,     # [1, 1, Lq, hd]  output (written at last kv block)
    dk_ref,     # [1, 1, Bkv, hd] output (per kv block)
    dv_ref,     # [1, 1, Bkv, hd] output (per kv block)
    dq_scratch,  # [Lq, hd] fp32
    *,
    sm_scale: float,
    num_kv_blocks: int,
):
    import jax.experimental.pallas as pl

    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0, :, :1]        # [Lq, 1]
    l = l_ref[0, 0, :, :1]
    dsum = dsum_ref[0, 0, :, :1]  # [Lq, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    s = s + bias_ref[0, 0, 0][None, :].astype(jnp.float32)
    # normalized probs via (m, l): s - m cancels the -1e9 mask bias exactly
    # (a single lse = m + log l loses log l to fp32 at |m| ~ 1e9)
    p = jnp.exp(s - m) / jnp.where(l == 0.0, 1.0, l)  # [Lq, Bkv]

    dv_ref[0, 0, ...] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)  # [Bkv, hd]

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Lq, Bkv]
    ds = p * (dp - dsum) * sm_scale

    dk_ref[0, 0, ...] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)  # [Bkv, hd]

    dq_scratch[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finish():
        dq_ref[0, 0, ...] = dq_scratch[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _prep(q, k, v, bias, block_kv):
    b, h, lq, hd = q.shape
    lkv = k.shape[2]
    lq_pad = max(8, ((lq + 7) // 8) * 8)
    if lq != lq_pad:
        q = _pad_to(q, 2, lq_pad)
    block_kv = min(block_kv, max(_LANE, ((lkv + _LANE - 1) // _LANE) * _LANE))
    kv_pad = (-lkv) % block_kv
    if kv_pad or bias is None:
        # 2*NEG_INF: padded keys must underflow to exactly zero weight even
        # on FULLY-masked rows, where the real keys already sit at -1e9 and
        # a -1e9 pad would join their uniform distribution (code-review r3)
        pad_bias = jnp.full((b, 1, 1, kv_pad), 2.0 * NEG_INF, jnp.float32)
        base = (
            bias.astype(jnp.float32)
            if bias is not None
            else jnp.zeros((b, 1, 1, lkv), jnp.float32)
        )
        bias = jnp.concatenate([base, pad_bias], axis=-1)
    if kv_pad:
        k = _pad_to(k, 2, block_kv)
        v = _pad_to(v, 2, block_kv)
    return q, k, v, bias, lq_pad, block_kv, k.shape[2] // block_kv


def _specs(lq_pad, hd, block_kv):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q_spec = pl.BlockSpec((1, 1, lq_pad, hd), lambda i, j, t: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, block_kv, hd), lambda i, j, t: (i, j, t, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, 1, block_kv),
                             lambda i, j, t: (i, 0, 0, t),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, lq_pad, _LANE),
                            lambda i, j, t: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    return q_spec, kv_spec, bias_spec, row_spec


def _fwd(q, k, v, bias, *, block_kv, interpret):
    # NOT jitted: an inner jit call boundary blocks XLA buffer sharing
    # between the custom_vjp residuals (k/v) and the surrounding values —
    # measured as a full duplicate k/v set in HBM (BASELINE.md round 3).
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, hd = q.shape
    qp, kp, vp, biasp, lq_pad, bkv, n_blocks = _prep(q, k, v, bias, block_kv)
    q_spec, kv_spec, bias_spec, row_spec = _specs(lq_pad, hd, bkv)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=1.0 / (hd ** 0.5), num_kv_blocks=n_blocks
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid=(b, h, n_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
        out_specs=[q_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lq_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, lq_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lq_pad, _LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((lq_pad, _LANE), jnp.float32),
            pltpu.VMEM((lq_pad, _LANE), jnp.float32),
            pltpu.VMEM((lq_pad, hd), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, biasp)
    return o[:, :, :lq, :], m, l


def _bwd(q, k, v, bias, o, m, l, do, *, block_kv, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, hd = q.shape
    lkv = k.shape[2]
    qp, kp, vp, biasp, lq_pad, bkv, n_blocks = _prep(q, k, v, bias, block_kv)
    dop = _pad_to(do, 2, lq_pad) if lq != lq_pad else do
    op = _pad_to(o, 2, lq_pad) if lq != lq_pad else o
    # D = rowsum(dO * O), broadcast to lane width
    dsum = jnp.sum(
        dop.astype(jnp.float32) * op.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    dsum = jnp.broadcast_to(dsum, (b, h, lq_pad, _LANE))

    q_spec, kv_spec, bias_spec, row_spec = _specs(lq_pad, hd, bkv)
    kernel = functools.partial(
        _bwd_kernel, sm_scale=1.0 / (hd ** 0.5), num_kv_blocks=n_blocks
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h, n_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, q_spec, row_spec,
                  row_spec, row_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lq_pad, hd), q.dtype),
            jax.ShapeDtypeStruct(kp.shape, k.dtype),
            jax.ShapeDtypeStruct(vp.shape, v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((lq_pad, hd), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, biasp, dop, m, l, dsum)
    return (
        dq[:, :, :lq, :],
        dk[:, :, :lkv, :],
        dv[:, :, :lkv, :],
    )


# ---------------------------------------------------------------------------
# custom-vjp entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_cross_attention_vjp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    block_kv: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable streaming cross-attention.

    q [B,H,Lq,hd], k/v [B,H,Lkv,hd], bias additive [B,1,1,Lkv] (zero grad).
    Peak memory O(Lq*block_kv) per (batch, head) in BOTH passes.
    """
    o, _, _ = _fwd(q, k, v, bias, block_kv=block_kv, interpret=interpret)
    return o


def _vjp_fwd(q, k, v, bias, block_kv, interpret):
    o, m, l = _fwd(q, k, v, bias, block_kv=block_kv, interpret=interpret)
    return o, (q, k, v, bias, o, m, l)


def _vjp_bwd(block_kv, interpret, res, do):
    q, k, v, bias, o, m, l = res
    dq, dk, dv = _bwd(
        q, k, v, bias, o, m, l, do, block_kv=block_kv, interpret=interpret
    )
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


flash_cross_attention_vjp.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# projection-fused variant: residual = the SHARED memory, not per-layer k/v
# ---------------------------------------------------------------------------
#
# These kernels use a MERGED-HEAD layout ([rows, H*hd], heads as column
# ranges — the fused_qformer_layer pattern): per-head [B, H, L, 64] tensors
# waste 2x HBM on v5e (the 64-wide trailing dim pads to the 128 lane width,
# measured as "2.0x expansion" in the XLA allocation dump) and force
# transposes.  Everything below stays [B, L, D] end to end.


def _pick_block(lkv: int, want: int) -> int:
    """Largest 8-sublane-aligned block <= want that DIVIDES lkv (no pad
    copy); falls back to `want` (callers pad) if no aligned divisor exists.
    Mosaic rejects (or may miscompile) second-minor block sizes that are not
    multiples of 8, so non-aligned divisors (e.g. Lkv=150 -> 150) are never
    returned even when they would avoid the pad."""
    for blk in range(min(want, lkv), _LANE - 1, -_LANE):
        if blk % 8 == 0 and lkv % blk == 0:
            return blk
    # pad path: a single block of ceil8(lkv) beats padding all the way to
    # `want` when lkv < want (e.g. Lkv=150 -> block 152, not 512)
    return min(((want + 7) // 8) * 8, ((lkv + 7) // 8) * 8)


def _mh_fwd_kernel(
    q_ref,      # [1, Lq, D]
    k_ref,      # [1, Bkv, D]
    v_ref,      # [1, Bkv, D]
    bias_ref,   # [1, 1, Bkv]
    o_ref,      # [1, Lq, D]
    m_ref,      # [1, Lq, 128] fp32, column h = head h's row max
    l_ref,      # [1, Lq, 128]
    m_s,        # [Lq, 128] scratch
    l_s,        # [Lq, 128]
    acc_s,      # [Lq, D] fp32
    *,
    num_heads: int,
    sm_scale: float,
    num_kv_blocks: int,
):
    import jax.experimental.pallas as pl

    kv_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    d = q_ref.shape[-1]
    hd = d // num_heads
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0, 0][None, :].astype(jnp.float32)  # [1, Bkv]

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[0][:, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + bias
        m_prev = m_s[:, h : h + 1]
        l_prev = l_s[:, h : h + 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_s[:, h : h + 1] = l_prev * alpha + jnp.sum(p, axis=-1,
                                                     keepdims=True)
        m_s[:, h : h + 1] = m_next
        acc_s[:, sl] = acc_s[:, sl] * alpha + jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finish():
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            l = l_s[:, h : h + 1]
            safe_l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, :, sl] = (acc_s[:, sl] / safe_l).astype(o_ref.dtype)
        m_ref[0, ...] = m_s[...]
        l_ref[0, ...] = l_s[...]


def _mh_bwd_kernel(
    q_ref,      # [1, Lq, D]
    k_ref,      # [1, Bkv, D]
    v_ref,      # [1, Bkv, D]
    bias_ref,   # [1, 1, Bkv]
    do_ref,     # [1, Lq, D]
    m_ref,      # [1, Lq, 128]
    l_ref,      # [1, Lq, 128]
    dsum_ref,   # [1, Lq, 128]  column h = rowsum(dO_h * O_h)
    dq_ref,     # [1, Lq, D] (written at last kv block)
    dk_ref,     # [1, Bkv, D] (per kv block)
    dv_ref,     # [1, Bkv, D]
    dq_s,       # [Lq, D] fp32 scratch
    *,
    num_heads: int,
    sm_scale: float,
    num_kv_blocks: int,
):
    import jax.experimental.pallas as pl

    kv_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    d = q_ref.shape[-1]
    hd = d // num_heads
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    bias = bias_ref[0, 0][None, :].astype(jnp.float32)

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[0][:, sl].astype(jnp.float32)
        m = m_ref[0, :, h : h + 1]
        l = l_ref[0, :, h : h + 1]
        dsum = dsum_ref[0, :, h : h + 1]
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + bias
        # (m, l) kept separate: s - m cancels the -1e9 mask bias exactly
        p = jnp.exp(s - m) / jnp.where(l == 0.0, 1.0, l)

        dv_ref[0, :, sl] = jax.lax.dot_general(
            p, do[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dsum) * sm_scale
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        dq_s[:, sl] += jax.lax.dot_general(
            ds, k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finish():
        dq_ref[0, ...] = dq_s[...].astype(dq_ref.dtype)


def _mh_prep(q, mem_k, mem_v, bias, block_kv):
    """Pad Lq to sublanes, choose a divisor block for Lkv (pad fallback)."""
    b, lq, d = q.shape
    lkv = mem_k.shape[1]
    lq_pad = max(8, ((lq + 7) // 8) * 8)
    if lq != lq_pad:
        q = _pad_to(q, 1, lq_pad)
    block = _pick_block(lkv, block_kv)
    kv_pad = (-lkv) % block
    if kv_pad or bias is None:
        # 2*NEG_INF: see _prep — padded keys must vanish on fully-masked rows
        pad_bias = jnp.full((b, 1, kv_pad), 2.0 * NEG_INF, jnp.float32)
        base = (
            bias.reshape(b, 1, lkv).astype(jnp.float32)
            if bias is not None
            else jnp.zeros((b, 1, lkv), jnp.float32)
        )
        bias3 = jnp.concatenate([base, pad_bias], axis=-1)
    else:
        bias3 = bias.reshape(b, 1, lkv).astype(jnp.float32)
    if kv_pad:
        mem_k = _pad_to(mem_k, 1, block)
        mem_v = _pad_to(mem_v, 1, block)
    return q, mem_k, mem_v, bias3, lq_pad, block, mem_k.shape[1] // block


def _mh_specs(lq_pad, d, block):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q_spec = pl.BlockSpec((1, lq_pad, d), lambda i, t: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block, d), lambda i, t: (i, t, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, block), lambda i, t: (i, 0, t),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, lq_pad, _LANE), lambda i, t: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return q_spec, kv_spec, bias_spec, row_spec


def _mh_fwd(q, k3, v3, bias, num_heads, *, block_kv, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lq, d = q.shape
    qp, kp, vp, bias3, lq_pad, block, n_blocks = _mh_prep(
        q, k3, v3, bias, block_kv
    )
    q_spec, kv_spec, bias_spec, row_spec = _mh_specs(lq_pad, d, block)
    kernel = functools.partial(
        _mh_fwd_kernel, num_heads=num_heads,
        sm_scale=1.0 / ((d // num_heads) ** 0.5), num_kv_blocks=n_blocks,
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
        out_specs=[q_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, lq_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((b, lq_pad, _LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((lq_pad, _LANE), jnp.float32),
            pltpu.VMEM((lq_pad, _LANE), jnp.float32),
            pltpu.VMEM((lq_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, bias3)
    return o[:, :lq, :], m, l


def _mh_bwd(q, k3, v3, bias, o, m, l, do, num_heads, *, block_kv, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lq, d = q.shape
    lkv = k3.shape[1]
    hd = d // num_heads
    # the backward holds k/v IN blocks plus dk/dv OUT blocks (double-
    # buffered): block 512 overflows the 16 MB scoped VMEM by ~0.8 MB at
    # D=1024 fp32 (measured) — cap at 256
    qp, kp, vp, bias3, lq_pad, block, n_blocks = _mh_prep(
        q, k3, v3, bias, min(block_kv, 256)
    )
    dop = _pad_to(do, 1, lq_pad) if lq != lq_pad else do
    op = _pad_to(o, 1, lq_pad) if lq != lq_pad else o
    # per-head D: dsum[..., h] = rowsum(dO_h * O_h); stored in lane columns
    prod = (dop.astype(jnp.float32) * op.astype(jnp.float32)).reshape(
        b, lq_pad, num_heads, hd
    )
    dsum = jnp.sum(prod, axis=-1)  # [B, Lq, H]
    dsum = jnp.pad(dsum, ((0, 0), (0, 0), (0, _LANE - num_heads)))
    q_spec, kv_spec, bias_spec, row_spec = _mh_specs(lq_pad, d, block)
    kernel = functools.partial(
        _mh_bwd_kernel, num_heads=num_heads,
        sm_scale=1.0 / (hd ** 0.5), num_kv_blocks=n_blocks,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, q_spec, row_spec,
                  row_spec, row_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct(kp.shape, k3.dtype),
            jax.ShapeDtypeStruct(vp.shape, v3.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((lq_pad, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, bias3, dop, m, l, dsum)
    return dq[:, :lq, :], dk[:, :lkv, :], dv[:, :lkv, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def flash_cross_attention_proj_vjp(
    q: jax.Array,      # [B, Lq, D] merged heads (grads flow to the q dense)
    mem: jax.Array,    # [B, Lkv, D_enc] shared cross-attention memory
    wk: jax.Array,     # [D_enc, D]
    bk: jax.Array,     # [D]
    wv: jax.Array,
    bv: jax.Array,
    bias: Optional[jax.Array] = None,  # [B, 1, 1, Lkv]; zero grad
    num_heads: int = 1,
    block_kv: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash cross-attention with the K/V projections INSIDE the vjp.

    jax.checkpoint cannot recompute through a custom_vjp's residuals — with
    a per-head op every layer would save its projected k/v.  Here the fat
    residual is the SHARED memory tensor (one buffer across all layers);
    k/v are recomputed transiently (two GEMMs) in the backward.  Everything
    stays merged-head [B, L, D]: per-head [B, H, L, 64] layouts pad the
    trailing dim to the 128-lane width (2x HBM, measured) and add
    transposes.  Returns [B, Lq, D].
    """
    dt = q.dtype
    k3 = jnp.dot(mem, wk.astype(mem.dtype)).astype(dt) + bk.astype(dt)
    v3 = jnp.dot(mem, wv.astype(mem.dtype)).astype(dt) + bv.astype(dt)
    o, _, _ = _mh_fwd(q, k3, v3, bias, num_heads, block_kv=block_kv,
                      interpret=interpret)
    return o


def _proj_vjp_fwd(q, mem, wk, bk, wv, bv, bias, num_heads, block_kv,
                  interpret):
    dt = q.dtype
    k3 = jnp.dot(mem, wk.astype(mem.dtype)).astype(dt) + bk.astype(dt)
    v3 = jnp.dot(mem, wv.astype(mem.dtype)).astype(dt) + bv.astype(dt)
    o, m, l = _mh_fwd(q, k3, v3, bias, num_heads, block_kv=block_kv,
                      interpret=interpret)
    return o, (q, mem, wk, bk, wv, bv, bias, o, m, l)


def _proj_vjp_bwd(num_heads, block_kv, interpret, res, do):
    q, mem, wk, bk, wv, bv, bias, o, m, l = res
    dt = q.dtype
    k3 = jnp.dot(mem, wk.astype(mem.dtype)).astype(dt) + bk.astype(dt)
    v3 = jnp.dot(mem, wv.astype(mem.dtype)).astype(dt) + bv.astype(dt)
    dq, dk3, dv3 = _mh_bwd(
        q, k3, v3, bias, o, m, l, do, num_heads, block_kv=block_kv,
        interpret=interpret,
    )
    f32 = jnp.float32
    dmem = (
        jnp.dot(dk3.astype(f32), wk.astype(f32).T)
        + jnp.dot(dv3.astype(f32), wv.astype(f32).T)
    ).astype(mem.dtype)
    mem2 = mem.reshape(-1, mem.shape[-1]).astype(f32)
    dwk = jnp.dot(mem2.T, dk3.reshape(-1, dk3.shape[-1]).astype(f32)).astype(
        wk.dtype
    )
    dwv = jnp.dot(mem2.T, dv3.reshape(-1, dv3.shape[-1]).astype(f32)).astype(
        wv.dtype
    )
    dbk = jnp.sum(dk3.astype(f32), axis=(0, 1)).astype(bk.dtype)
    dbv = jnp.sum(dv3.astype(f32), axis=(0, 1)).astype(bv.dtype)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dmem, dwk, dbk, dwv, dbv, dbias


flash_cross_attention_proj_vjp.defvjp(_proj_vjp_fwd, _proj_vjp_bwd)
