"""Fused Q-Former transformer blocks as single Pallas TPU kernels.

The item Q-Former's attention is K=32 queries over itself (self) or over
F=14 field vectors (cross) — per-item matmuls far below one 128x128 MXU
tile.  Round 1 showed that a packed attention-core kernel wins in isolation
but loses in-model because the ``pallas_call`` boundary breaks XLA's fusion
with the surrounding projections (ops/packed_attention.py).  The fix, per
that finding, is to grow the kernel until the boundary lands on a natural
HBM cut: one kernel per *attention block* —

    y = LayerNorm(x + W_o · Attention(W_q x, W_k m, W_v m))

covering the QKV projections, the per-item attention (items packed into
full MXU tiles with a static block-diagonal mask, exact), the output
projection, the residual and the LayerNorm, with every intermediate living
in VMEM.  Between blocks only the [rows, hidden] activations touch HBM —
the score matrices, per-head layouts, and projection outputs never do, and
the head split/merge transposes disappear entirely (heads are column
ranges of one [rows, 3·hidden] VMEM buffer).

Inference-only (no VJP): training stays on the XLA path where dropout and
autodiff live.  Reference semantics mirrored: additive -1e9 masking and
post-attention residual LayerNorm (reference: models/qformer.py:204-346).

Layouts (wrappers pad rows):
  self block:  x [R, D] rows = batch*K item-major; weights wqkv [D, 3D]
               (concat of W_q|W_k|W_v), wo [D, D].
  cross block: x [R, D] queries, mem [B*F, D] field-major, additive key
               bias [B, F] (0 valid / -1e9 missing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e9

# rows per grid step; must be a multiple of K (items never straddle tiles).
# 256 rows with input-dtype (bf16) qkv/ctx buffers fits the whole block
# (weights 8MB + activations) under the 16MB VMEM budget at production
# width D=1024.  Round-8 tile sweep (scripts/probe_attn_tiles.py): the
# SELF block wins at 512 rows with the scoped limit raised (10.05 ->
# 9.30 ms; 1024 regresses), the cross block is exactly neutral at 512 —
# so self gets its own default and cross/FFN-chunked keep 256.
_TILE_ROWS = 256
_SELF_TILE_ROWS = 512


def _layer_norm_rows(x32, gamma, beta, eps):
    """Row-wise LayerNorm in fp32 over the lane (feature) axis."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * gamma + beta


def _group_items(items: int, keys_per_item: int, target: int = 128) -> int:
    """Items per attention group: the largest divisor of ``items`` whose
    packed key rows fit in ``target`` lanes (always >= 1).  Chosen at trace
    time — all shapes static under jit."""
    cap = max(target // keys_per_item, 1)
    p = 1
    for c in range(1, min(items, cap) + 1):
        if items % c == 0:
            p = c
    return p


def _group_attention(q_all, kv, v_off, bias, num_heads, out_ref, sm_scale):
    """Lane-packed block-diagonal attention into ``out_ref`` (the ctx
    scratch).

    ``q_all`` [T, D], ``kv`` [T_m, D_kv] with keys at
    column 0 and values at ``v_off``; both are reshaped per head into
    GROUPS — [n_g, g_rows, hd] x [n_g, g_keys, hd] batched ``dot_general``s
    — so softmax runs on [n_g, g_rows, g_keys] instead of the full-tile
    [T, T_m].  With g_keys = 128 lanes stay full while the exp/max/sum area
    halves (the round-6 block profile measured the attention blocks at
    26-36%% MXU efficiency — the gap was exactly this VPU area).  ``bias``
    is [n_g, g_rows, g_keys] and carries the per-item block mask (and,
    for cross, the key-validity mask).  The softmax normalizer is applied
    AFTER the attention-value matmul — [.., g_rows, hd] is cheaper to scale
    than [.., g_rows, g_keys].
    """
    t, d = q_all.shape
    hd = d // num_heads
    n_g = bias.shape[0]
    for h in range(num_heads):
        q = q_all[:, h * hd : (h + 1) * hd].reshape(n_g, -1, hd) * sm_scale
        k = kv[:, h * hd : (h + 1) * hd].reshape(n_g, -1, hd)
        v = kv[:, v_off + h * hd : v_off + (h + 1) * hd].reshape(n_g, -1, hd)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        c = jax.lax.dot_general(
            e.astype(q_all.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        c = c * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        out_ref[:, h * hd : (h + 1) * hd] = c.reshape(t, hd).astype(
            out_ref.dtype
        )


def _block_diag_bias(g_rows, g_keys, n_q, n_kv, neg):
    """[g_rows, g_keys] additive bias: 0 where query row and key column
    belong to the same item (row // n_q == col // n_kv), ``neg`` elsewhere."""
    qi = jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_keys), 0) // n_q
    ki = jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_keys), 1) // n_kv
    return jnp.where(qi == ki, 0.0, neg).astype(jnp.float32)


def _self_block_kernel(
    x_ref,       # [T, D] input rows (bf16/fp32)
    wqkv_ref,    # [D, 3D]
    bqkv_ref,    # [1, 3D]
    wo_ref,      # [D, D]
    bo_ref,      # [1, D]
    gamma_ref,   # [1, D]
    beta_ref,    # [1, D]
    o_ref,       # [T, D]
    ctx_ref,     # [T, D] VMEM scratch, input dtype (per-head ctx assembly)
    *,
    num_heads: int,
    n_q: int,
    sm_scale: float,
    ln_eps: float,
):
    t, d = x_ref.shape
    x = x_ref[...]
    qkv = (
        jax.lax.dot_general(
            x, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(x.dtype)  # [T, 3D]; bf16 mode halves VMEM so tile=256 fits

    # lane-packed groups (rows are item-major, item = row // K): softmax/
    # exp area shrinks from [T, T] to n_g x [g, g] — see _group_attention
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

    out = (
        jax.lax.dot_general(
            ctx_ref[...].astype(x.dtype), wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[...].astype(jnp.float32)
    )
    y = _layer_norm_rows(
        out + x.astype(jnp.float32),
        gamma_ref[...].astype(jnp.float32),
        beta_ref[...].astype(jnp.float32),
        ln_eps,
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _cross_block_kernel(
    x_ref,       # [T, D] query rows
    mem_ref,     # [T_m, D] memory rows (field-major)
    wq_ref,      # [D, D]
    bq_ref,      # [1, D]
    wkv_ref,     # [D, 2D] concat of W_k|W_v (from encoder width D)
    bkv_ref,     # [1, 2D]
    wo_ref,      # [D, D]
    bo_ref,      # [1, D]
    gamma_ref,   # [1, D]
    beta_ref,    # [1, D]
    kbias_ref,   # [1, T_m] additive key-validity bias
    o_ref,       # [T, D]
    ctx_ref,     # [T, D] VMEM scratch, input dtype
    *,
    num_heads: int,
    n_q: int,
    n_kv: int,
    sm_scale: float,
    ln_eps: float,
):
    t, d = x_ref.shape
    x = x_ref[...]
    mem = mem_ref[...]
    q_all = (
        jax.lax.dot_general(
            x, wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bq_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    kv = (
        jax.lax.dot_general(
            mem, wkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[...].astype(jnp.float32)
    ).astype(x.dtype)  # [T_m, 2D]

    # lane-packed groups over [T, T_m]; cross-ITEM block mask strictly
    # below the per-key mask (-2e9 < -1e9): for an item with ZERO valid
    # fields, softmax then spreads uniformly over its OWN masked keys —
    # matching the per-item XLA path — instead of leaking attention onto
    # other items packed in the same tile.  The key bias arrives
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

    out = (
        jax.lax.dot_general(
            ctx_ref[...].astype(x.dtype), wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[...].astype(jnp.float32)
    )
    y = _layer_norm_rows(
        out + x.astype(jnp.float32),
        gamma_ref[...].astype(jnp.float32),
        beta_ref[...].astype(jnp.float32),
        ln_eps,
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _row2d(b):
    return b.reshape(1, -1)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "n_q", "ln_eps", "interpret", "tile_rows"),
)
def fused_self_attention_block(
    x: jax.Array,          # [B, K, D]
    wqkv: jax.Array,       # [D, 3D]
    bqkv: jax.Array,       # [3D]
    wo: jax.Array,         # [D, D]
    bo: jax.Array,         # [D]
    ln_gamma: jax.Array,   # [D]
    ln_beta: jax.Array,    # [D]
    *,
    num_heads: int,
    n_q: int,
    ln_eps: float = 1e-12,
    interpret: bool = False,
    tile_rows: int = None,
) -> jax.Array:
    """LayerNorm(x + W_o·SelfAttn(x)) with items packed into MXU tiles.

    Queries are never masked in the item Q-Former
    (reference: models/qformer_utils.py:43), so the only mask is the static
    per-item block diagonal.  ``tile_rows`` overrides the 256-row default
    (probing; larger tiles need the scoped-VMEM limit scaled below).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    assert k == n_q and d % num_heads == 0
    rows_cfg = tile_rows or _SELF_TILE_ROWS
    tile = rows_cfg if rows_cfg % n_q == 0 else n_q
    rows = b * k
    pad_rows = (-rows) % tile
    xf = x.reshape(rows, d)
    if pad_rows:
        xf = jnp.pad(xf, ((0, pad_rows), (0, 0)))
    n_tiles = xf.shape[0] // tile

    kernel = functools.partial(
        _self_block_kernel,
        num_heads=num_heads,
        n_q=n_q,
        sm_scale=1.0 / (d // num_heads) ** 0.5,
        ln_eps=ln_eps,
    )
    const = lambda i: (0, 0)  # noqa: E731  weights stay VMEM-resident
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * max(1, tile // 256) * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, wqkv, _row2d(bqkv), wo, _row2d(bo), _row2d(ln_gamma),
      _row2d(ln_beta))
    return out[:rows].reshape(b, k, d)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "n_q", "n_kv", "ln_eps", "interpret", "tile_rows",
    ),
)
def fused_cross_attention_block(
    x: jax.Array,          # [B, K, D] queries
    mem: jax.Array,        # [B, F, D] field memory
    key_bias: jax.Array,   # [B, F] additive (0 valid / -1e9 missing)
    wq: jax.Array,
    bq: jax.Array,
    wkv: jax.Array,        # [D, 2D] concat W_k|W_v
    bkv: jax.Array,        # [2D]
    wo: jax.Array,
    bo: jax.Array,
    ln_gamma: jax.Array,
    ln_beta: jax.Array,
    *,
    num_heads: int,
    n_q: int,
    n_kv: int,
    ln_eps: float = 1e-12,
    interpret: bool = False,
    tile_rows: int = None,
) -> jax.Array:
    """LayerNorm(x + W_o·CrossAttn(x -> mem)) with packed items.

    ``tile_rows`` overrides the 256-row default (probing)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    f, dm = mem.shape[1], mem.shape[2]
    assert k == n_q and f == n_kv
    rows_cfg = tile_rows or _TILE_ROWS
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
        _cross_block_kernel,
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
            pl.BlockSpec((dm, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((tile, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * max(1, tile // 256) * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, memf, wq, _row2d(bq), wkv, _row2d(bkv), wo, _row2d(bo),
      _row2d(ln_gamma), _row2d(ln_beta), kbias)
    return out[: bp * k].reshape(bp, k, d)[:b]


def _ffn_kernel(
    x_ref,       # [T, D]
    w1_ref,      # [D, C] one chunk of the intermediate dim
    b1_ref,      # [1, C]
    w2_ref,      # [C, D]
    b2_ref,      # [1, D]
    gamma_ref,   # [1, D]
    beta_ref,    # [1, D]
    o_ref,       # [T, D]
    acc_ref,     # [T, D] fp32 scratch accumulator
    *,
    num_chunks: int,
    ln_eps: float,
    approx_gelu: bool,
):
    import jax.experimental.pallas as pl

    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    h = (
        jax.lax.dot_general(
            x, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...].astype(jnp.float32)
    )
    h = jax.nn.gelu(h, approximate=approx_gelu).astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c_idx == num_chunks - 1)
    def _done():
        y = _layer_norm_rows(
            acc_ref[...] + b2_ref[...].astype(jnp.float32)
            + x.astype(jnp.float32),
            gamma_ref[...].astype(jnp.float32),
            beta_ref[...].astype(jnp.float32),
            ln_eps,
        )
        o_ref[...] = y.astype(o_ref.dtype)


def ffn_chunk_size(intermediate: int) -> int:
    """Largest lane-aligned chunk (<=1024, multiple of 128) dividing the
    intermediate dim; 0 if none exists (caller must fall back to XLA)."""
    for c in range(min(1024, intermediate), 0, -128):
        if intermediate % c == 0 and c % 128 == 0:
            return c
    return 0


@functools.partial(
    jax.jit, static_argnames=("ln_eps", "interpret", "tile_rows", "chunk")
)
def fused_ffn_block(
    x: jax.Array,          # [B, K, D]
    w1: jax.Array,         # [D, I]
    b1: jax.Array,         # [I]
    w2: jax.Array,         # [I, D]
    b2: jax.Array,         # [D]
    ln_gamma: jax.Array,
    ln_beta: jax.Array,
    *,
    ln_eps: float = 1e-12,
    interpret: bool = False,
    tile_rows: int = None,
    chunk: int = None,
) -> jax.Array:
    """LayerNorm(x + W2·gelu(W1·x)): the intermediate [rows, I] activation
    never touches HBM — W1/W2 stream through VMEM in I-chunks accumulated
    in fp32.  gelu follows the engine's dtype rule (bf16 -> tanh approx,
    fp32 -> exact erf; see inference/fused_qformer._ffn).

    Chunking mirrors the int8 block (round 8): for ``inter <= 4096`` in
    bf16 the whole W1+W2 (16 MB) go VMEM-resident via a constant
    index_map — no per-step chunk re-DMA; ``tile_rows``/``chunk``
    override for probing (scripts/probe_ffn_chunks.py --bf16)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    inter = w1.shape[1]
    if chunk is None and inter <= 4096 and inter % 128 == 0 \
            and x.dtype == jnp.bfloat16:
        chunk = inter
    chunk = chunk or ffn_chunk_size(inter)
    assert chunk, f"no lane-aligned chunk divides intermediate dim {inter}"
    num_chunks = inter // chunk
    # the FFN is purely row-wise: no item-alignment constraint on the tile.
    # Whole-residency runs 512-row tiles (round-8 sweep: 256:1024 14.43 ->
    # 512:4096 13.01 ms, +11%); the chunked fallback keeps the engine's
    # 256-row default.
    tile = tile_rows or (512 if num_chunks == 1 else _TILE_ROWS)
    rows = b * k
    pad_rows = (-rows) % tile
    xf = x.reshape(rows, d)
    if pad_rows:
        xf = jnp.pad(xf, ((0, pad_rows), (0, 0)))
    n_tiles = xf.shape[0] // tile

    kernel = functools.partial(
        _ffn_kernel,
        num_chunks=num_chunks,
        ln_eps=ln_eps,
        approx_gelu=x.dtype == jnp.bfloat16,
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
            pl.BlockSpec((chunk, d), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
        # resident weights (2 * d * chunk at the input dtype) + the
        # [tile, chunk] fp32 h transient dominate; 16 MB default only
        # covers the chunked configuration
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100,
                16
                + (tile * chunk * 4) // (1024 * 1024)
                + (2 * chunk * d * x.dtype.itemsize) // (1024 * 1024),
            )
            * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, w1, _row2d(b1), w2, _row2d(b2), _row2d(ln_gamma), _row2d(ln_beta))
    return out[:rows].reshape(b, k, d)
