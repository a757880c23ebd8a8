"""Int8 (W8A8) fused Q-Former blocks: 2x MXU throughput on v5e.

Same block structure as ops/fused_qformer_layer.py (one Pallas kernel per
attention block + chunked FFN), but the projection and FFN matmuls — ~95% of
the forward FLOPs — run on the MXU's int8 path (394 TOPS on v5e vs 197
TFLOP/s bf16):

* weights are quantized per OUTPUT CHANNEL offline
  (``quantize_weight``: symmetric, scale = col_absmax/127);
* activations are quantized per ROW dynamically inside the kernel
  (symmetric, scale = row_absmax/127) — VPU work overlapped with MXU;
* accumulation is int32, rescaled to fp32 as ``acc * row_scale * col_scale``.

Numerics stay fp32 where it matters: attention scores/softmax (computed from
the dequantized q/k in bf16, fp32 softmax), LayerNorms, residuals, and the
FFN's fp32 accumulator.  The score (q·k) and context (p·v) matmuls are tiny
(<3% of FLOPs at K=32/F=14) and stay bf16.

Opt-in inference mode (``QFormerInference(precision="int8")``); the bf16
fused engine and the strict-parity fp32 XLA path are unchanged.  Measured
quality deltas vs fp32 tokens are recorded in BASELINE.md.

Reference hot loop this accelerates:
data_processing/generate_all_item_embeddings.py:148-346.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from unirec_tpu.ops.fused_qformer_layer import (
    _block_diag_bias,
    _group_attention,
    _group_items,
    _layer_norm_rows,
    _row2d,
)

NEG_INF = -1e9
# Tile-size audit (round 2, production config D=1024/FFN 4096/K=32/F=14):
# with the input tile cached as an int8 scratch (instead of the earlier
# fp32 re-quant per chunk), 512-row tiles now COMPILE and WIN for the FFN
# (8.44 vs 9.13 ms) and the cross block (7.43 vs 7.58).  Round-7 update:
# the SELF block moves to 512 too — its [T, 3D] qkv intermediate needed
# the scoped-VMEM limit raised (48 MB; v5e has 128 MB physical), and the
# Mosaic matmul bench showed the 256-row [256,1024]x[1024,1024]
# out-projection shape is pathological (36.7 TOP/s vs 142+ at 512 rows);
# measured block time 7.12 -> 6.46 ms (scripts/profile_int8_blocks.py).
_TILE_ROWS = 512          # self block
_CROSS_TILE_ROWS = 512
_FFN_TILE_ROWS = 512


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[in, out] fp weight -> (int8 weight, [1, out] fp32 col scales)."""
    w = w.astype(jnp.float32)
    col_max = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-8)
    scale = col_max / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _row_quant(x32):
    """fp32 [T, D] -> (int8 values, [T, 1] fp32 row scales)."""
    absmax = jnp.maximum(
        jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-6
    )
    rscale = absmax / 127.0
    # divide per ROW (127/absmax), broadcast-multiply over D columns —
    # x32 / rscale was a [T, D] fp32 divide (multi-op per lane on the VPU).
    # No clip pass: |x| <= absmax so |x * fl(127/absmax)| <= 127*(1+eps)^2
    # < 127.5, which rounds to at most +-127 — round-6 VPU diet.
    q = jnp.round(x32 * (127.0 / absmax)).astype(jnp.int8)
    return q, rscale


def _mm_q(x_q, rscale, w_ref, s_ref):
    """int8 x int8 -> fp32: (x_q @ w) * row_scale * col_scale."""
    acc = jax.lax.dot_general(
        x_q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * rscale * s_ref[...].astype(jnp.float32)


def _self_block_kernel_q(
    x_ref,       # [T, D] input rows (bf16/fp32)
    wqkv_ref,    # [D, 3D] int8
    sqkv_ref,    # [1, 3D] fp32 col scales
    bqkv_ref,    # [1, 3D]
    wo_ref,      # [D, D] int8
    so_ref,      # [1, D]
    bo_ref,      # [1, D]
    gamma_ref,
    beta_ref,
    o_ref,       # [T, D]
    ctx_ref,     # [T, D] VMEM scratch (bf16)
    *,
    num_heads: int,
    n_q: int,
    sm_scale: float,
    ln_eps: float,
):
    t, d = x_ref.shape
    x = x_ref[...]
    x_q, rs = _row_quant(x.astype(jnp.float32))
    qkv = (
        _mm_q(x_q, rs, wqkv_ref, sqkv_ref)
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(jnp.bfloat16)  # [T, 3D]

    # lane-packed groups: softmax/exp area shrinks from [T, T] to
    # n_g x [g, g] (2x at the production tile) — see _group_attention
    items = t // n_q
    p_g = _group_items(items, n_q)
    n_g = items // p_g
    g = p_g * n_q
    bias = jnp.broadcast_to(
        _block_diag_bias(g, g, n_q, n_q, NEG_INF)[None], (n_g, g, g)
    )
    _group_attention(
        qkv[:, :d], qkv[:, d:], d, bias, num_heads, ctx_ref, sm_scale
    )

    c_q, crs = _row_quant(ctx_ref[...].astype(jnp.float32))
    out = _mm_q(c_q, crs, wo_ref, so_ref) + bo_ref[...].astype(jnp.float32)
    y = _layer_norm_rows(
        out + x.astype(jnp.float32),
        gamma_ref[...].astype(jnp.float32),
        beta_ref[...].astype(jnp.float32),
        ln_eps,
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _cross_block_kernel_q(
    x_ref,       # [T, D] query rows
    mem_ref,     # [T_m, D] memory rows
    wq_ref, sq_ref, bq_ref,
    wkv_ref, skv_ref, bkv_ref,
    wo_ref, so_ref, bo_ref,
    gamma_ref, beta_ref,
    kbias_ref,   # [1, T_m]
    o_ref,
    ctx_ref,
    *,
    num_heads: int,
    n_q: int,
    n_kv: int,
    sm_scale: float,
    ln_eps: float,
):
    t, d = x_ref.shape
    x = x_ref[...]
    x_q, xrs = _row_quant(x.astype(jnp.float32))
    q_all = (
        _mm_q(x_q, xrs, wq_ref, sq_ref) + bq_ref[...].astype(jnp.float32)
    ).astype(jnp.bfloat16)
    m_q, mrs = _row_quant(mem_ref[...].astype(jnp.float32))
    kv = (
        _mm_q(m_q, mrs, wkv_ref, skv_ref) + bkv_ref[...].astype(jnp.float32)
    ).astype(jnp.bfloat16)  # [T_m, 2D]

    # lane-packed groups over [T, T_m]; cross-item block mask strictly
    # below the key mask (-2e9 < -1e9) so all-masked items stay within
    # their own block (see fused_qformer_layer.py).  The key bias arrives
    # pre-grouped [n_g, 1, g_keys] from the wrapper — Mosaic cannot
    # reshape across the lane dim in-kernel (224 -> 2x112 rejected).
    n_g, g_keys = kbias_ref.shape[1], kbias_ref.shape[3]
    p_g = g_keys // n_kv
    g_rows = p_g * n_q
    bias = (
        _block_diag_bias(g_rows, g_keys, n_q, n_kv, 2.0 * NEG_INF)[None]
        + kbias_ref[0].astype(jnp.float32)
    )
    _group_attention(q_all, kv, d, bias, num_heads, ctx_ref, sm_scale)

    c_q, crs = _row_quant(ctx_ref[...].astype(jnp.float32))
    out = _mm_q(c_q, crs, wo_ref, so_ref) + bo_ref[...].astype(jnp.float32)
    y = _layer_norm_rows(
        out + x.astype(jnp.float32),
        gamma_ref[...].astype(jnp.float32),
        beta_ref[...].astype(jnp.float32),
        ln_eps,
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _ffn_kernel_q(
    x_ref,       # [T, D]
    w1_ref,      # [D, C] int8 chunk
    s1_ref,      # [1, C]
    b1_ref,      # [1, C]
    w2_ref,      # [C, D] int8 chunk
    s2_ref,      # [1, D]
    b2_ref,      # [1, D]
    gamma_ref,
    beta_ref,
    o_ref,
    acc_ref,     # [T, D] fp32 scratch
    xq_ref,      # [T, D] int8 scratch: the tile quantized ONCE
    xs_ref,      # [T, _LANES] fp32 scratch: row scales (lane-broadcast)
    *,
    num_chunks: int,
    ln_eps: float,
):
    import jax.experimental.pallas as pl

    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # quantize the input tile once for all chunks — re-quantizing per
        # chunk was pure VPU overhead (~16x an absmax/div/round/clip pass
        # over [T, D]); the engine is VPU-bound, not MXU-bound
        x_q, rs = _row_quant(x_ref[...].astype(jnp.float32))
        xq_ref[...] = x_q
        xs_ref[...] = jnp.broadcast_to(rs, xs_ref.shape)

    h = (
        _mm_q(xq_ref[...], xs_ref[:, :1], w1_ref, s1_ref)
        + b1_ref[...].astype(jnp.float32)
    )
    # bf16-engine dtype rule: tanh-approx gelu (inference/fused_qformer._ffn)
    h = jax.nn.gelu(h, approximate=True)
    h_q, hrs = _row_quant(h)
    # defer the (constant) per-column w2 scale out of the chunk loop: the
    # accumulator holds sum_c (h_q @ w2_c) * row_scale; s2 applies once at
    # the end instead of a [T, D] fp32 multiply per chunk
    acc2 = jax.lax.dot_general(
        h_q, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] += acc2.astype(jnp.float32) * hrs

    @pl.when(c_idx == num_chunks - 1)
    def _done():
        y = _layer_norm_rows(
            acc_ref[...] * s2_ref[...].astype(jnp.float32)
            + b2_ref[...].astype(jnp.float32)
            + x_ref[...].astype(jnp.float32),
            gamma_ref[...].astype(jnp.float32),
            beta_ref[...].astype(jnp.float32),
            ln_eps,
        )
        o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "n_q", "ln_eps", "interpret", "tile_rows"),
)
def fused_self_attention_block_q(
    x, wqkv_q, sqkv, bqkv, wo_q, so, bo, ln_gamma, ln_beta,
    *, num_heads: int, n_q: int, ln_eps: float = 1e-12,
    interpret: bool = False, tile_rows: int = None,
):
    """Int8 LayerNorm(x + W_o·SelfAttn(x)); x [B, K, D].

    ``tile_rows`` overrides the 512-row default (``_TILE_ROWS``; needs the
    scoped-VMEM limit raised to 48 MB for its [T, 3D] qkv intermediate —
    v5e has 128 MB physical): the Mosaic matmul bench (BASELINE.md round 6)
    measured the [256,1024]x[1024,1024] int8 out-projection shape at a
    pathological 36.7 TOP/s vs 142+ at 512 rows — bigger tiles amortize
    the per-step MXU pipeline latency."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    assert k == n_q and d % num_heads == 0
    rows_cfg = tile_rows or _TILE_ROWS
    tile = rows_cfg if rows_cfg % n_q == 0 else n_q
    rows = b * k
    pad_rows = (-rows) % tile
    xf = x.reshape(rows, d)
    if pad_rows:
        xf = jnp.pad(xf, ((0, pad_rows), (0, 0)))
    n_tiles = xf.shape[0] // tile

    kernel = functools.partial(
        _self_block_kernel_q,
        num_heads=num_heads,
        n_q=n_q,
        sm_scale=1.0 / (d // num_heads) ** 0.5,
        ln_eps=ln_eps,
    )
    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.bfloat16)],
        # [tile, 3D] int32 qkv accumulator dominates; 512-row tiles need
        # the scoped limit above the 16MB default (v5e: 128MB physical);
        # probe tiles beyond 512 scale the row-proportional part with a
        # ceil so non-multiples (e.g. 768) are not under-provisioned
        # (ADVICE r4); never below the measured 48MB 512-tile floor
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100, max(48, (48 * tile + 511) // 512))
            * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, wqkv_q, _row2d(sqkv), _row2d(bqkv), wo_q, _row2d(so), _row2d(bo),
      _row2d(ln_gamma), _row2d(ln_beta))
    return out[:rows].reshape(b, k, d)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "n_q", "n_kv", "ln_eps", "interpret", "tile_rows",
    ),
)
def fused_cross_attention_block_q(
    x, mem, key_bias,
    wq_q, sq, bq, wkv_q, skv, bkv, wo_q, so, bo, ln_gamma, ln_beta,
    *, num_heads: int, n_q: int, n_kv: int, ln_eps: float = 1e-12,
    interpret: bool = False, tile_rows: int = None,
):
    """Int8 LayerNorm(x + W_o·CrossAttn(x -> mem)).

    ``tile_rows`` overrides the 512-row default: the 512 tile sits within
    ~2%% of the 16 MB scoped-VMEM limit, and sharing a step with the
    trainable fused kernels (train item --fused-anchor) pushes it over —
    the trainer passes 256 there (ops/fused_qformer_vjp.py note)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    f, dm = mem.shape[1], mem.shape[2]
    assert k == n_q and f == n_kv
    rows_cfg = tile_rows or _CROSS_TILE_ROWS
    tile = rows_cfg if rows_cfg % n_q == 0 else n_q
    p_items = tile // n_q
    pad_b = (-b) % p_items
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        mem = jnp.pad(mem, ((0, pad_b), (0, 0), (0, 0)))
        key_bias = jnp.pad(
            key_bias, ((0, pad_b), (0, 0)), constant_values=NEG_INF
        )
    bp = x.shape[0]
    n_tiles = bp // p_items
    xf = x.reshape(bp * k, d)
    memf = mem.reshape(bp * f, dm)
    # pre-grouped for _group_attention: [tiles, n_g, 1, g_keys]
    p_g = _group_items(p_items, n_kv)
    n_g = p_items // p_g
    kbias = key_bias.reshape(n_tiles, n_g, 1, p_g * f)

    kernel = functools.partial(
        _cross_block_kernel_q,
        num_heads=num_heads,
        n_q=n_q,
        n_kv=n_kv,
        sm_scale=1.0 / (d // num_heads) ** 0.5,
        ln_eps=ln_eps,
    )
    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (p_items * f, dm), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n_g, 1, p_g * f), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.bfloat16)],
        # the 512-row tile with grouped attention sits ~2% over the 16MB
        # scoped-VMEM default (group temporaries pad 112->128 lanes);
        # v5e has 128MB physical VMEM — raise the scoped limit instead of
        # shrinking the tile (256-row tiles measured 2% slower, round 2)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, memf, wq_q, _row2d(sq), _row2d(bq), wkv_q, _row2d(skv),
      _row2d(bkv), wo_q, _row2d(so), _row2d(bo), _row2d(ln_gamma),
      _row2d(ln_beta), kbias)
    return out[: bp * k].reshape(bp, k, d)[:b]


@functools.partial(
    jax.jit, static_argnames=("ln_eps", "interpret", "tile_rows", "chunk")
)
def fused_ffn_block_q(
    x, w1_q, s1, b1, w2_q, s2, b2, ln_gamma, ln_beta,
    *, ln_eps: float = 1e-12, interpret: bool = False,
    tile_rows: int = None, chunk: int = None,
):
    """Int8 LayerNorm(x + W2·gelu(W1·x)), W1/W2 streamed in chunks.

    ``tile_rows``/``chunk`` override the 512-row / auto-chunk defaults for
    shape probing (scripts/profile_int8_blocks.py)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from unirec_tpu.ops.fused_qformer_layer import ffn_chunk_size

    b, k, d = x.shape
    inter = w1_q.shape[1]
    if chunk is None and inter <= 4096 and inter % 128 == 0:
        # whole-intermediate residency: W1+W2 int8 at the production shape
        # are 8 MB — a constant index_map keeps them in VMEM across all
        # grid steps, dropping the per-step chunk re-DMA (~2 GB/block) and
        # 4x of the grid steps.  Measured 8.79 -> 8.46 ms (round-8 sweep,
        # scripts/probe_ffn_chunks.py) — the re-DMA was mostly hidden, but
        # the win is free.  Larger intermediates fall back to chunking.
        chunk = inter
    chunk = chunk or ffn_chunk_size(inter)
    assert chunk and inter % chunk == 0, \
        f"no lane-aligned chunk divides intermediate dim {inter}"
    num_chunks = inter // chunk
    tile = tile_rows or _FFN_TILE_ROWS
    rows = b * k
    pad_rows = (-rows) % tile
    xf = x.reshape(rows, d)
    if pad_rows:
        xf = jnp.pad(xf, ((0, pad_rows), (0, 0)))
    n_tiles = xf.shape[0] // tile

    kernel = functools.partial(
        _ffn_kernel_q, num_chunks=num_chunks, ln_eps=ln_eps
    )
    const = lambda i, c: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, chunk), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, d), jnp.float32),
            pltpu.VMEM((tile, d), jnp.int8),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
        # scoped-VMEM sizing: [tile, chunk] fp32 h + its int8 requant and
        # the [tile, d] fp32/int32 accumulators dominate; weight chunks
        # (2*chunk*d int8) go resident when num_chunks == 1.  v5e has
        # 128 MB physical — cap at 100.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100,
                24
                + (tile * chunk * 8) // (1024 * 1024)
                + (tile * d * 12) // (1024 * 1024)
                + (2 * chunk * d) // (1024 * 1024),
            )
            * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, w1_q, _row2d(s1), _row2d(b1), w2_q, _row2d(s2), _row2d(b2),
      _row2d(ln_gamma), _row2d(ln_beta))
    return out[:rows].reshape(b, k, d)
