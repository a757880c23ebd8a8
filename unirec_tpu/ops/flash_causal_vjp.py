"""Trainable flash CAUSAL self-attention for the Qwen3 backbone (GQA).

The joint trainer's fastest config (no-remat) stores every decoder layer's
attention probabilities for the backward — [B, H, L, L] bf16 is ~67 MB per
layer at batch 8 / seq 512, ~1.9 GB over 28 layers, and is exactly what
spills past batch 8 (BASELINE.md round 3 "XLA spills past batch 8").  This
kernel replaces the stored-probs backward with the flash-attention VJP so
the probs never exist in HBM:

* forward: streaming softmax over kv blocks, causal mask folded in-kernel
  (block-level skip: with equal q/kv blocks only ``ki <= qi`` participates),
  saves O and per-(row, head) (max m, sum l) — O(B*L*H) residual;
* backward: TWO recompute kernels (flash-2 style).  With both axes blocked,
  a single kernel cannot accumulate dq (across kv blocks) and dk/dv (across
  q blocks) at once — one of the two would revisit an output block at
  non-consecutive grid steps, which Pallas TPU forbids.  The dq kernel runs
  kv-innermost (dq accumulates in VMEM scratch), the dkv kernel runs
  q-innermost (dk/dv accumulate in scratch), each writing at its last
  participating block.

Layout decisions shared with ops/flash_vjp.py (measured there, BASELINE.md
round 3): MERGED-HEAD [B, L, H*hd] tensors (per-head [B, H, L, hd] pays 2x
HBM when hd < 128 lanes — here hd = 128, but the merged layout also keeps
the GQA K/V un-repeated: [B, L, Hkv*hd] is half the HBM of the repeated
XLA-path tensor); (m, l) saved separately, never logsumexp (fp32 swallows
log l at the -1e9 mask magnitude).

GQA is native: q has ``num_q_heads`` column groups, k/v have
``num_kv_heads`` — head h reads kv columns ``h // (Hq // Hkv)``.  dk/dv
accumulate over each group's q heads inside the per-head loop.

No attention-prob dropout (Qwen3 has none; LoRA dropout acts on projection
INPUTS and stays outside).  The padding mask is a per-key additive bias and
gets zero gradient.

Unlike ops/flash_vjp.py's ``flash_cross_attention_proj_vjp``, the Q/K/V
projections stay OUTSIDE this custom_vjp — deliberately: here they are
LoRADense + per-head RMSNorm + RoPE (hand-deriving those VJPs would add
grads for six-plus param leaves per layer), and the saved residuals are
per-layer [B, L, D] q/k/v (~40 MB/layer at batch 8/seq 512, ~1.1 GB over
28 layers) rather than the cross-kernel's shared memory tensor.  That
residual memory is not the binding constraint at the measured-fastest
config (batch 8; batch 12/16 already run WITHOUT OOM and are slower
per-sample — BASELINE.md round 5), so the extra VJP surface isn't paid
for.  Revisit if a config appears where those residuals block a faster
batch point.

Reference semantics: the XLA path in models/qwen3.py:204-214 (causal +
padding additive -1e9 bias, fp32 softmax), itself parity-tested against HF
transformers (tests/test_qwen3.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from unirec_tpu.ops.attention import NEG_INF, _pad_to
from unirec_tpu.ops.flash_vjp import _pick_block

_LANE = 128


# ---------------------------------------------------------------------------
# forward kernel: grid (B, nQ, nKV), kv innermost, blocks of equal size
# ---------------------------------------------------------------------------


def _causal_bias(qi, ki, block):
    """[block, block] additive causal bias for (q block qi, kv block ki)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0) + qi * block
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1) + ki * block
    return jnp.where(rows >= cols, 0.0, NEG_INF).astype(jnp.float32)


def _fwd_kernel(
    q_ref,      # [1, Bq, Dq]
    k_ref,      # [1, Bkv, Dk]
    v_ref,      # [1, Bkv, Dk]
    bias_ref,   # [1, 1, Bkv] per-key padding bias
    o_ref,      # [1, Bq, Dq]
    m_ref,      # [1, Bq, 128] fp32, column h = head h's row max
    l_ref,      # [1, Bq, 128]
    m_s,        # [Bq, 128] scratch
    l_s,
    acc_s,      # [Bq, Dq] fp32
    *,
    num_q_heads: int,
    num_kv_heads: int,
    sm_scale: float,
    block: int,
):
    import jax.experimental.pallas as pl

    qi = pl.program_id(1)
    ki = pl.program_id(2)
    group = num_q_heads // num_kv_heads
    dq = q_ref.shape[-1]
    hd = dq // num_q_heads

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    # blocks strictly above the diagonal are fully masked: skip entirely
    @pl.when(ki <= qi)
    def _compute():
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        bias = bias_ref[0, 0][None, :].astype(jnp.float32) + _causal_bias(
            qi, ki, block
        )
        for h in range(num_q_heads):
            q_sl = slice(h * hd, (h + 1) * hd)
            kv_sl = slice((h // group) * hd, (h // group + 1) * hd)
            qh = q_ref[0][:, q_sl].astype(jnp.float32)
            s = jax.lax.dot_general(
                qh, k[:, kv_sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale + bias
            m_prev = m_s[:, h : h + 1]
            l_prev = l_s[:, h : h + 1]
            m_next = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_s[:, h : h + 1] = l_prev * alpha + jnp.sum(
                p, axis=-1, keepdims=True
            )
            m_s[:, h : h + 1] = m_next
            acc_s[:, q_sl] = acc_s[:, q_sl] * alpha + jax.lax.dot_general(
                p, v[:, kv_sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # the diagonal block is the last participating kv block for this q block
    @pl.when(ki == qi)
    def _finish():
        l = l_s[...]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        for h in range(num_q_heads):
            q_sl = slice(h * hd, (h + 1) * hd)
            o_ref[0, :, q_sl] = (
                acc_s[:, q_sl] / safe_l[:, h : h + 1]
            ).astype(o_ref.dtype)
        m_ref[0, ...] = m_s[...]
        l_ref[0, ...] = l_s[...]


# ---------------------------------------------------------------------------
# backward kernel 1: dq — grid (B, nQ, nKV), kv innermost
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, bias_ref,
    do_ref,     # [1, Bq, Dq]
    m_ref, l_ref,
    dsum_ref,   # [1, Bq, 128] column h = rowsum(dO_h * O_h)
    dq_ref,     # [1, Bq, Dq]
    dq_s,       # [Bq, Dq] fp32
    *,
    num_q_heads: int,
    num_kv_heads: int,
    sm_scale: float,
    block: int,
):
    import jax.experimental.pallas as pl

    qi = pl.program_id(1)
    ki = pl.program_id(2)
    group = num_q_heads // num_kv_heads
    dq = q_ref.shape[-1]
    hd = dq // num_q_heads

    @pl.when(ki == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    @pl.when(ki <= qi)
    def _compute():
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        bias = bias_ref[0, 0][None, :].astype(jnp.float32) + _causal_bias(
            qi, ki, block
        )
        for h in range(num_q_heads):
            q_sl = slice(h * hd, (h + 1) * hd)
            kv_sl = slice((h // group) * hd, (h // group + 1) * hd)
            qh = q_ref[0][:, q_sl].astype(jnp.float32)
            do_h = do_ref[0][:, q_sl].astype(jnp.float32)
            m = m_ref[0, :, h : h + 1]
            l = l_ref[0, :, h : h + 1]
            dsum = dsum_ref[0, :, h : h + 1]
            s = jax.lax.dot_general(
                qh, k[:, kv_sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale + bias
            # (m, l) kept separate: s - m cancels the -1e9 bias exactly
            p = jnp.exp(s - m) / jnp.where(l == 0.0, 1.0, l)
            dp = jax.lax.dot_general(
                do_h, v[:, kv_sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - dsum) * sm_scale
            dq_s[:, q_sl] += jax.lax.dot_general(
                ds, k[:, kv_sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ki == qi)
    def _finish():
        dq_ref[0, ...] = dq_s[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel 2: dk/dv — grid (B, nKV, nQ), q innermost
# ---------------------------------------------------------------------------


def _dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, m_ref, l_ref, dsum_ref,
    dk_ref,     # [1, Bkv, Dk]
    dv_ref,
    dk_s,       # [Bkv, Dk] fp32
    dv_s,
    *,
    num_q_heads: int,
    num_kv_heads: int,
    sm_scale: float,
    block: int,
    num_q_blocks: int,
):
    import jax.experimental.pallas as pl

    ki = pl.program_id(1)
    qi = pl.program_id(2)
    group = num_q_heads // num_kv_heads
    dq = q_ref.shape[-1]
    hd = dq // num_q_heads

    @pl.when(qi == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    @pl.when(qi >= ki)
    def _compute():
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        bias = bias_ref[0, 0][None, :].astype(jnp.float32) + _causal_bias(
            qi, ki, block
        )
        for h in range(num_q_heads):
            q_sl = slice(h * hd, (h + 1) * hd)
            kv_sl = slice((h // group) * hd, (h // group + 1) * hd)
            qh = q_ref[0][:, q_sl].astype(jnp.float32)
            do_h = do_ref[0][:, q_sl].astype(jnp.float32)
            m = m_ref[0, :, h : h + 1]
            l = l_ref[0, :, h : h + 1]
            dsum = dsum_ref[0, :, h : h + 1]
            s = jax.lax.dot_general(
                qh, k[:, kv_sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale + bias
            p = jnp.exp(s - m) / jnp.where(l == 0.0, 1.0, l)
            # dv_h = p^T dO_h; accumulates across the GQA group via +=
            dv_s[:, kv_sl] += jax.lax.dot_general(
                p, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do_h, v[:, kv_sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - dsum) * sm_scale
            dk_s[:, kv_sl] += jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # the last q block always participates (it sees every kv block)
    @pl.when(qi == num_q_blocks - 1)
    def _finish():
        dk_ref[0, ...] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0, ...] = dv_s[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _specs(dq, dk, block):
    """BlockSpecs for grid (B, outer, inner) where the Q-side tensors index
    by grid dim `q_dim` and the KV-side tensors by `kv_dim`.

    Causally-dead grid steps (kv block above the diagonal) skip all compute
    via ``pl.when``, but Pallas still DMAs every mapped block per step — up
    to ~50% of the inner-loop fetches would be dead at large n.  The index
    maps therefore CLAMP the varying side to the diagonal (kv side clamps
    down in the q-outer kernels, q side clamps up in the kv-outer kernel):
    a skipped step re-references an already-resident (or next-live) block
    and Mosaic elides the copy."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(q_dim):
        if q_dim == 0:
            # grid (b, qi, ki): steps with ki > qi are dead
            def q_idx(b, i, j):
                return (b, i, 0)

            def kv_blk(i, j):
                return jnp.minimum(j, i)
        else:
            # grid (b, ki, qi): steps with qi < ki are dead
            def q_idx(b, i, j):
                return (b, jnp.maximum(j, i), 0)

            def kv_blk(i, j):
                return i

        q_spec = pl.BlockSpec((1, block, dq), q_idx, memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec(
            (1, block, dk), lambda b, i, j: (b, kv_blk(i, j), 0),
            memory_space=pltpu.VMEM,
        )
        bias_spec = pl.BlockSpec(
            (1, 1, block), lambda b, i, j: (b, 0, kv_blk(i, j)),
            memory_space=pltpu.VMEM,
        )
        row_spec = pl.BlockSpec((1, block, _LANE), q_idx,
                                memory_space=pltpu.VMEM)
        return q_spec, kv_spec, bias_spec, row_spec

    return make


def _dsum(do, o, num_q_heads):
    b, lp, d = do.shape
    hd = d // num_q_heads
    ds = (do.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
        b, lp, num_q_heads, hd
    ).sum(-1)
    return _pad_to(ds, 2, _LANE)


def _fwd(q, k, v, bias3, num_q_heads, num_kv_heads, block, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lp, dq = q.shape
    dk = k.shape[-1]
    n = lp // block
    hd = dq // num_q_heads
    make = _specs(dq, dk, block)
    q_spec, kv_spec, bias_spec, row_spec = make(q_dim=0)
    kernel = functools.partial(
        _fwd_kernel, num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        sm_scale=1.0 / (hd ** 0.5), block=block,
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid=(b, n, n),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
        out_specs=[q_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, dq), q.dtype),
            jax.ShapeDtypeStruct((b, lp, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((b, lp, _LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, _LANE), jnp.float32),
            pltpu.VMEM((block, _LANE), jnp.float32),
            pltpu.VMEM((block, dq), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias3)
    return o, m, l


def _bwd(q, k, v, bias3, o, m, l, do, num_q_heads, num_kv_heads, block,
         interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lp, dq = q.shape
    dk = k.shape[-1]
    n = lp // block
    hd = dq // num_q_heads
    dsum = _dsum(do, o, num_q_heads)
    make = _specs(dq, dk, block)

    q_spec, kv_spec, bias_spec, row_spec = make(q_dim=0)
    dq_kernel = functools.partial(
        _dq_kernel, num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        sm_scale=1.0 / (hd ** 0.5), block=block,
    )
    dq_out = pl.pallas_call(
        dq_kernel,
        grid=(b, n, n),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, q_spec, row_spec,
                  row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, lp, dq), q.dtype),
        scratch_shapes=[pltpu.VMEM((block, dq), jnp.float32)],
        interpret=interpret,
    )(q, k, v, bias3, do, m, l, dsum)

    q_spec, kv_spec, bias_spec, row_spec = make(q_dim=1)
    dkv_kernel = functools.partial(
        _dkv_kernel, num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        sm_scale=1.0 / (hd ** 0.5), block=block, num_q_blocks=n,
    )
    dk_out, dv_out = pl.pallas_call(
        dkv_kernel,
        grid=(b, n, n),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, q_spec, row_spec,
                  row_spec, row_spec],
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, dk), k.dtype),
            jax.ShapeDtypeStruct((b, lp, dk), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, dk), jnp.float32),
            pltpu.VMEM((block, dk), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias3, do, m, l, dsum)
    return dq_out, dk_out, dv_out


# ---------------------------------------------------------------------------
# custom VJP (operates on padded shapes; padding handled by the public entry)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_causal(q, k, v, bias3, num_q_heads, num_kv_heads, block,
                  interpret):
    o, _, _ = _fwd(q, k, v, bias3, num_q_heads, num_kv_heads, block,
                   interpret)
    return o


def _vjp_fwd(q, k, v, bias3, num_q_heads, num_kv_heads, block, interpret):
    o, m, l = _fwd(q, k, v, bias3, num_q_heads, num_kv_heads, block,
                   interpret)
    return o, (q, k, v, bias3, o, m, l)


def _vjp_bwd(num_q_heads, num_kv_heads, block, interpret, res, do):
    q, k, v, bias3, o, m, l = res
    dq, dk, dv = _bwd(q, k, v, bias3, o, m, l, do, num_q_heads,
                      num_kv_heads, block, interpret)
    return dq, dk, dv, jnp.zeros_like(bias3)


_flash_causal.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def flash_causal_self_attention(
    q3: jax.Array,          # [B, L, Hq*hd] post qk-norm + RoPE
    k3: jax.Array,          # [B, L, Hkv*hd]
    v3: jax.Array,          # [B, L, Hkv*hd]
    pad_mask,               # [B, L] 1 valid / 0 pad, or None
    num_q_heads: int,
    num_kv_heads: int,
    *,
    block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Causal GQA self-attention, differentiable, probs never in HBM.

    Returns [B, L, Hq*hd] context (merged heads, pre output-projection).
    K/V stay in their un-repeated GQA layout.  The padding mask masks KEYS
    only (queries at padded rows still compute; their outputs are pooled
    out downstream) — identical to the XLA additive-bias semantics in
    models/qwen3.py:204-214.
    """
    b, lq, dq = q3.shape
    if dq % num_q_heads or k3.shape[-1] % num_kv_heads:
        raise ValueError("hidden dims must divide head counts")
    if num_q_heads % num_kv_heads:
        raise ValueError("num_q_heads must be a multiple of num_kv_heads")
    blk = _pick_block(lq, block)
    lp = -(-lq // blk) * blk
    qp = _pad_to(q3, 1, lp)
    kp = _pad_to(k3, 1, lp)
    vp = _pad_to(v3, 1, lp)
    if pad_mask is None:
        pad_mask = jnp.ones((b, lq), jnp.float32)
    # 2*NEG_INF for kernel-pad keys: they must vanish even on rows whose
    # real keys are all masked at -1e9 (see ops/flash_vjp._prep)
    bias3 = jnp.full((b, 1, lp), 2.0 * NEG_INF, jnp.float32)
    bias3 = bias3.at[:, :, :lq].set(
        (1.0 - pad_mask.astype(jnp.float32))[:, None, :] * NEG_INF
    )
    o = _flash_causal(qp, kp, vp, bias3, num_q_heads, num_kv_heads, blk,
                      interpret)
    return o[:, :lq, :]
