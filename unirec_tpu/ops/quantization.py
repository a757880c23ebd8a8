"""Int8 catalog quantization + quantized retrieval.

A serving-scale feature beyond the reference (which ranks 100-candidate pools
in fp32): the item catalog is stored as int8 rows with per-row scales — 4x
less HBM and 4x less catalog-stream traffic through VMEM, which is where
retrieval's time goes (the scan is memory-bound: the whole catalog crosses
HBM per call while the [BU, BN] score matmul is tiny).  The kernel dequantizes
catalog blocks to fp32 in VMEM and scores on the fp32 MXU path — an
int8xint8 dot would need the users quantized too and buys nothing when the
matmul is not the bottleneck.  Cosine ranking is scale-invariant per user, so
per-row dequantization reduces to one multiply on the [B, N] scores.

Kernels follow the quantization patterns of the Pallas guide (stochastic
rounding optional for training-time quantization; deterministic round-to-
nearest default for serving snapshots).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unirec_tpu.ops.losses import l2_normalize


def quantize_rows(
    x: jax.Array, axis: int = -1
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization: returns (values int8, scales).

    x is L2-normalized first (catalog rows are compared by cosine), so scales
    stay well-conditioned.
    """
    x = l2_normalize(x, axis=axis).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def dequantize_rows(q: jax.Array, scales: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scales[..., None]


def quantized_scores(
    user_emb: jax.Array,  # [B, D] (any float dtype)
    catalog_q: jax.Array,  # [N, D] int8
    catalog_scales: jax.Array,  # [N]
) -> jax.Array:
    """[B, N] cosine scores against an int8 catalog (XLA path)."""
    u = l2_normalize(user_emb).astype(jnp.float32)
    s = jnp.einsum(
        "bd,nd->bn", u, catalog_q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return s * catalog_scales[None, :]


def quantized_top_k(
    user_emb: jax.Array,
    catalog_q: jax.Array,
    catalog_scales: jax.Array,
    k: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    scores = quantized_scores(user_emb, catalog_q, catalog_scales)
    return jax.lax.top_k(scores, k)


# ---------------------------------------------------------------------------
# Pallas blocked int8 retrieval (catalog streamed through VMEM)
# ---------------------------------------------------------------------------


def _q_retrieval_kernel(
    u_ref,  # [BU, D] fp32
    c_ref,  # [BN, D] int8
    s_ref,  # [BN, 128] fp32 scales (broadcast into lanes)
    s_out,  # [BU, K_LANES]
    i_out,  # [BU, K_LANES]
    s_scratch,
    i_scratch,
    *,
    k: int,
    block_n: int,
    num_n_blocks: int,
    n_valid: int,
):
    import jax.experimental.pallas as pl

    from unirec_tpu.ops.ranking import merge_running_topk

    n_idx = pl.program_id(1)

    @pl.when(n_idx == 0)
    def _init():
        s_scratch[...] = jnp.full_like(s_scratch, -jnp.inf)
        i_scratch[...] = jnp.zeros_like(i_scratch)

    u = u_ref[...]
    c = c_ref[...].astype(jnp.float32)
    scores = jax.lax.dot_general(
        u, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BU, BN]
    scores = scores * s_ref[:, 0][None, :]
    base = n_idx * block_n
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # mask padded catalog rows in-kernel (score 0 could evict real items)
    scores = jnp.where(col_ids < n_valid, scores, -jnp.inf)
    merge_running_topk(s_scratch, i_scratch, scores, col_ids, k)

    @pl.when(n_idx == num_n_blocks - 1)
    def _done():
        s_out[...] = s_scratch[...]
        i_out[...] = i_scratch[...]


def retrieve_top_k_int8(
    user_emb: jax.Array,  # [B, D]
    catalog_q: jax.Array,  # [N, D] int8
    catalog_scales: jax.Array,  # [N]
    k: int = 10,
    *,
    block_u: int = 256,
    block_n: int = 2048,  # int8 catalog block: 2MB, double-buffers fine
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas blocked int8 retrieval; falls back to the XLA path off-TPU
    and for k > 32 (in-kernel top-k is k unrolled max-selection rounds)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if (jax.default_backend() != "tpu" and not interpret) or k > 32:
        return quantized_top_k(user_emb, catalog_q, catalog_scales, k)

    u = l2_normalize(user_emb).astype(jnp.float32)
    b, d = u.shape
    n = catalog_q.shape[0]
    k_pad = 128  # output lane width; first k lanes are live

    bu = min(block_u, max(8, ((b + 7) // 8) * 8))
    pad_b = (-b) % bu
    if pad_b:
        u = jnp.pad(u, ((0, pad_b), (0, 0)))
    bn = block_n
    pad_n = (-n) % bn
    c = catalog_q
    scales = catalog_scales.astype(jnp.float32)
    if pad_n:
        c = jnp.pad(c, ((0, pad_n), (0, 0)))
        scales = jnp.pad(scales, (0, pad_n))
    # scales as [N, 128] so the kernel reads a lane-aligned block
    scales2d = jnp.broadcast_to(scales[:, None], (scales.shape[0], 128))

    bp, np_ = u.shape[0], c.shape[0]
    num_n_blocks = np_ // bn
    grid = (bp // bu, num_n_blocks)

    kernel = functools.partial(
        _q_retrieval_kernel, k=k, block_n=bn, num_n_blocks=num_n_blocks,
        n_valid=n,
    )
    s_out, i_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bu, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bu, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((bp, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bu, k_pad), jnp.float32),
            pltpu.VMEM((bu, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(u, c, scales2d)

    s_out, i_out = s_out[:b], i_out[:b]
    valid = i_out < n
    s_out = jnp.where(valid, s_out, -jnp.inf)
    order = jnp.argsort(-s_out, axis=-1)
    return (
        jnp.take_along_axis(s_out, order, axis=-1)[:, :k],
        jnp.take_along_axis(i_out, order, axis=-1)[:, :k],
    )
