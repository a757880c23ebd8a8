"""Fused int8 (W8A8) Qwen3 blocks for the serving forward.

VERDICT r3 #2: the joint/serving Qwen3 forward runs ~102 TFLOP/s effective
vs the 145 the fused Q-Former engine demonstrates sustainable; the gap is
unfused elementwise between GEMMs.  At serving shapes (batch 16 x seq 512 =
8k rows/chip) the int8 path runs XLA ``dot_general`` per projection — below
``ops/int8_matmul._MIN_ROWS`` — so each of q/k/v re-quantizes the same
activation rows, and the MLP round-trips its [rows, I] gate/up/h
intermediates through HBM (~200 MB/layer at the production config; XLA
cannot fuse through a dot).  Two kernels close this the way the Q-Former
engine does — grow the kernel until its boundary lands on a natural HBM
cut:

* ``qkv_int8``: ONE quantization pass feeds the concatenated
  [Wq|Wk|Wv] int8 matmul (the per-head q/k RMSNorm + rope stay XLA — they
  are cheap and lane-layout-hostile in-kernel);
* ``swiglu_mlp_int8``: gate/up matmul -> silu(g)*u -> re-quantize -> down
  matmul, all intermediates in VMEM; only [rows, D] touches HBM.

Both take the ALREADY-NORMED hidden states (the Layer's RMSNorms stay
where their params live).  Inference-only (no VJP), no-bias projections
(Qwen3's default).  Dispatched by ``Qwen3Attention``/``Qwen3MLP`` when
``Qwen3Config.fused_int8_inference`` is set and the ``qweights``
collection is present (serving opt-in via
``Recommender(precision="int8", merge_lora=True)``); LoRA must be merged
or absent — the kernels know nothing of adapters.

Weight layout matches ``models/qwen3.quantize_qwen3_weights``:
int8 [in, out] + fp32 per-output-column scales.
Reference hottest op this accelerates:
training/train_item_individual_token_joint.py:173-177 (the Qwen3 forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from unirec_tpu.ops.fused_qformer_int8 import _mm_q, _row_quant

_TILE_ROWS = 512


def supports_fused_qwen3(rows: int, d: int, inter: int = 0) -> bool:
    """Tileability guard: row tiles must divide evenly, dims lane-aligned."""
    return (
        rows % _TILE_ROWS == 0
        and d % 128 == 0
        and (inter == 0 or inter % 128 == 0)
    )


def _qkv_kernel(x_ref, w_ref, s_ref, o_ref):
    """[T, D] normed rows -> [T, Nq+Nk+Nv]: quantize ONCE, one matmul."""
    x_q, rs = _row_quant(x_ref[...].astype(jnp.float32))
    o_ref[...] = _mm_q(x_q, rs, w_ref, s_ref).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def qkv_int8(
    x: jax.Array,      # [rows, D] normed hidden (bf16/fp32)
    wqkv_q: jax.Array,  # [D, Nq+Nk+Nv] int8 (concat of q/k/v kernels)
    sqkv: jax.Array,    # [Nq+Nk+Nv] fp32 col scales
    interpret: bool = False,
) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = x.shape
    n = wqkv_q.shape[1]
    assert rows % _TILE_ROWS == 0, rows
    return pl.pallas_call(
        _qkv_kernel,
        grid=(rows // _TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_ROWS, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, wqkv_q, sqkv.reshape(1, -1).astype(jnp.float32))


# Implementation of the fused-STE forward, read at TRACE time:
#   "pallas" — the qkv_int8 Mosaic kernel (quant + wide matmul in one launch)
#   "xla"    — the same math as ONE wide XLA int8 dot (shared quant pass,
#              no pallas launch; XLA fuses the quant into the graph)
# Measured (scripts/ab_int8_fused.py, BASELINE.md round 9): at the joint
# training shape BOTH lose to per-projection dots (pallas 113.9 / xla 114.6
# vs 107.1 ms/step) — XLA CSE already shares the per-projection quant (one
# round op in the optimized HLO for q/k/v), so fusing only changes matmul
# granularity, for the worse.  The variable exists so the probe can A/B
# them in one process; training defaults stay per-projection.
FUSED_STE_IMPL = "pallas"


@jax.custom_vjp
def int8_linear_fused_ste(x: jax.Array, wq: jax.Array, s: jax.Array) -> jax.Array:
    """TRAINABLE wide fused int8 linear: forward = ONE activation
    quantization feeding one wide [D, N] int8 matmul (impl per
    ``FUSED_STE_IMPL``), backward = the straight-through estimator
    ``dx = g @ (wq * s)^T``.

    This is the fused-kernel counterpart of ``ops/int8_ste.int8_linear_ste``
    — same STE semantics (quant∘dequant of the activation treated as
    identity, frozen weights so no dW), but the forward shares the row-quant
    pass across concatenated projections.  Used by ``--int8-base`` joint
    training (VERDICT r4 #1): at the training shape (batch 8 × seq 512 =
    4,096 rows) the per-projection path re-quantizes the same rows for each
    of q/k/v (and gate/up), which this removes.

    ``x`` must satisfy ``supports_fused_qwen3(rows, d)`` — callers guard.
    """
    if FUSED_STE_IMPL == "xla":
        x32 = x.astype(jnp.float32)
        absmax = jnp.maximum(
            jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-6
        )
        xq = jnp.round(x32 * (127.0 / absmax)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            acc.astype(jnp.float32) * (absmax / 127.0)
            * s.reshape(1, -1).astype(jnp.float32)
        ).astype(x.dtype)
    interpret = jax.default_backend() != "tpu"
    return qkv_int8(x, wq, s, interpret=interpret)


def _fused_ste_fwd(x, wq, s):
    return int8_linear_fused_ste(x, wq, s), (wq, s)


def _fused_ste_bwd(res, g):
    import numpy as np

    wq, s = res
    # dx through the dequantized weight W_eff[k, n] = wq[k, n] * s[n]; XLA
    # fuses the int8 cast + column scale into the matmul prologue.
    w_eff = wq.astype(g.dtype) * s.reshape(1, -1).astype(g.dtype)
    dx = jax.lax.dot_general(g, w_eff, (((g.ndim - 1,), (1,)), ((), ())))
    return (
        dx,
        np.zeros(wq.shape, dtype=jax.dtypes.float0),  # int8: no tangent
        jnp.zeros_like(s),
    )


int8_linear_fused_ste.defvjp(_fused_ste_fwd, _fused_ste_bwd)


def _mlp_kernel(x_ref, wgu_ref, sgu_ref, wd_ref, sd_ref, o_ref, *, inter):
    """[T, D] normed rows -> [T, D] MLP output (no residual):
    silu(x@Wg) * (x@Wu) @ Wd with every intermediate in VMEM."""
    x_q, rs = _row_quant(x_ref[...].astype(jnp.float32))
    gu = _mm_q(x_q, rs, wgu_ref, sgu_ref)  # [T, 2I] fp32
    g, u = gu[:, :inter], gu[:, inter:]
    h = g * jax.nn.sigmoid(g) * u  # silu(g) * u, fp32
    h_q, hrs = _row_quant(h)
    o_ref[...] = _mm_q(h_q, hrs, wd_ref, sd_ref).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def swiglu_mlp_int8(
    x: jax.Array,      # [rows, D] normed hidden
    wgu_q: jax.Array,   # [D, 2I] int8 (concat of gate|up kernels)
    sgu: jax.Array,     # [2I]
    wdown_q: jax.Array,  # [I, D] int8
    sdown: jax.Array,    # [D]
    interpret: bool = False,
) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d = x.shape
    inter = wdown_q.shape[0]
    assert wgu_q.shape[1] == 2 * inter
    assert rows % _TILE_ROWS == 0, rows
    kernel = functools.partial(_mlp_kernel, inter=inter)
    return pl.pallas_call(
        kernel,
        grid=(rows // _TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 2 * inter), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * inter), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_ROWS, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        # [T, 2I] int32 accumulator (12 MB at I=3072) + fp32 gu (24 MB
        # transient) dominate; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, wgu_q, sgu.reshape(1, -1).astype(jnp.float32),
      wdown_q, sdown.reshape(1, -1).astype(jnp.float32))
