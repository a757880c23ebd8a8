"""Standalone fused W8A8 linear kernel (serving Qwen3 projections).

VERDICT r2 weak #3 / next #5: int8 SERVING at batch 32 ran 37.2 users/s vs
79.0 bf16 because the XLA ``dot_general(int8, int8)`` at [batch*seq, D] >=
16k rows picks a pathological layout/fusion on this stack (BASELINE.md
round 3), and the shipped remedy was a batch<=16 clamp.  This kernel routes
the same math — per-row activation quantization, int8xint8 MXU matmul with
int32 accumulation, per-row x per-column dequantization — through one
Pallas kernel per projection, the style measured at ~176 TOP/s in
``ops/fused_qformer_int8.py``.  The activation never round-trips HBM as
int8 and the quantize/dequantize fuse into the tile loop.

Used by ``models/qwen3.LoRADense`` (the ``qweights`` inference collection)
on TPU; off-TPU and at non-tileable shapes the XLA path remains.  Weight
layout matches ``quantize_qwen3_weights``: kq [in, out] int8 + per-column
scales.  Inference-only (no VJP) — the int8 path has no gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


_ROW_TILE = 512   # [512, K<=3072] bf16 x-tile = 3 MB VMEM; fp32 accum 1 MB
_COL_TILE = 512
# Engage only where the XLA int8 dot is pathological: at 8k rows/chip
# (serving batch 16) XLA wins — it fuses the dequant multiply into
# neighbors (115.8 vs 81.3 users/s through HTTP, BASELINE.md round 6);
# the measured cliff is at >=16k rows/chip (serving batch 32).
_MIN_ROWS = 16384


def _kernel(x_ref, w_ref, s_ref, o_ref):
    """One [bm, K] x [K, bn] tile: quantize rows, int8 matmul, dequantize.

    Row quantization is recomputed per column tile — ~3 VPU ops per input
    element vs 2*bn MXU ops per element of matmul work (bn >= 128), <2%
    overhead, and it keeps the kernel single-pass (no int8 activation
    buffer in HBM).
    """
    x32 = x_ref[...].astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-6)
    rs = absmax / 127.0
    xq = jnp.clip(jnp.round(x32 * (127.0 / absmax)), -127, 127).astype(
        jnp.int8
    )
    acc = jax.lax.dot_general(
        xq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        acc.astype(jnp.float32) * rs * s_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def supports_int8_linear(m: int, k: int, n: int,
                         min_rows: int = _MIN_ROWS) -> bool:
    """Tileability + size guard: row/col tiles must divide the operand
    evenly, and the kernel only engages at row counts where the XLA int8
    dot is the measured-slow path (see _MIN_ROWS).  Odd shapes and small
    batches fall back to the XLA dot."""
    return (m >= min_rows and m % _ROW_TILE == 0 and n % _COL_TILE == 0
            and k % 128 == 0)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_linear(
    x: jax.Array,        # [M, K] bf16/fp32 activations
    kq: jax.Array,       # [K, N] int8 weight
    ks: jax.Array,       # [N] or [1, N] fp32 per-column scales
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """(quantize rows ∘ int8 matmul ∘ dequantize)(x) -> [M, N]."""
    m, k = x.shape
    n = kq.shape[1]
    ks2 = ks.reshape(1, -1).astype(jnp.float32)
    grid = (m // _ROW_TILE, n // _COL_TILE)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, _COL_TILE), lambda i, j: (0, j)),
            pl.BlockSpec((1, _COL_TILE), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, _COL_TILE), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(x, kq, ks2)
