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
# width D=1024.
_TILE_ROWS = 256


def _layer_norm_rows(x32, gamma, beta, eps):
    """Row-wise LayerNorm in fp32 over the lane (feature) axis."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * gamma + beta


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
    hd = d // num_heads
    x = x_ref[...]
    qkv = (
        jax.lax.dot_general(
            x, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(x.dtype)  # [T, 3D]; bf16 mode halves VMEM so tile=256 fits

    # static block-diagonal mask: rows are item-major, item = row // K
    qi = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0) // n_q
    ki = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) // n_q
    block_bias = jnp.where(qi == ki, 0.0, NEG_INF).astype(jnp.float32)

    for h in range(num_heads):
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
            + block_bias
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # divide [T,1] once, broadcast-multiply (VPU: divide is multi-op)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        c = jax.lax.dot_general(
            p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, hd]
        ctx_ref[:, h * hd : (h + 1) * hd] = c.astype(ctx_ref.dtype)

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
    t_m = mem_ref.shape[0]
    hd = d // num_heads
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

    qi = jax.lax.broadcasted_iota(jnp.int32, (t, t_m), 0) // n_q
    ki = jax.lax.broadcasted_iota(jnp.int32, (t, t_m), 1) // n_kv
    # cross-ITEM block mask strictly below the per-key mask (-2e9 < -1e9):
    # for an item with ZERO valid fields, softmax then spreads uniformly
    # over its OWN masked keys — matching the per-item XLA path — instead
    # of leaking attention onto other items packed in the same tile
    bias = jnp.where(qi == ki, 0.0, 2.0 * NEG_INF).astype(jnp.float32)
    bias = bias + kbias_ref[0].astype(jnp.float32)  # [1, T_m] broadcast

    for h in range(num_heads):
        q = q_all[:, h * hd : (h + 1) * hd]
        k = kv[:, h * hd : (h + 1) * hd]
        v = kv[:, d + h * hd : d + (h + 1) * hd]
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
            + bias
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # divide [T,1] once, broadcast-multiply (VPU: divide is multi-op)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        c = jax.lax.dot_general(
            p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ctx_ref[:, h * hd : (h + 1) * hd] = c.astype(ctx_ref.dtype)

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
    jax.jit, static_argnames=("num_heads", "n_q", "ln_eps", "interpret")
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
) -> jax.Array:
    """LayerNorm(x + W_o·SelfAttn(x)) with items packed into MXU tiles.

    Queries are never masked in the item Q-Former
    (reference: models/qformer_utils.py:43), so the only mask is the static
    per-item block diagonal.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    assert k == n_q and d % num_heads == 0
    tile = _TILE_ROWS if _TILE_ROWS % n_q == 0 else n_q
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
        interpret=interpret,
    )(xf, wqkv, _row2d(bqkv), wo, _row2d(bo), _row2d(ln_gamma),
      _row2d(ln_beta))
    return out[:rows].reshape(b, k, d)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "n_q", "n_kv", "ln_eps", "interpret"),
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
) -> jax.Array:
    """LayerNorm(x + W_o·CrossAttn(x -> mem)) with packed items."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    f, dm = mem.shape[1], mem.shape[2]
    assert k == n_q and f == n_kv
    tile = _TILE_ROWS if _TILE_ROWS % n_q == 0 else n_q
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
    kbias = key_bias.reshape(n_tiles, 1, p_items * f)

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
                (1, 1, p_items * f), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, d), x.dtype)],
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
    jax.jit, static_argnames=("ln_eps", "interpret")
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
) -> jax.Array:
    """LayerNorm(x + W2·gelu(W1·x)): the intermediate [rows, I] activation
    never touches HBM — W1/W2 stream through VMEM in I-chunks accumulated
    in fp32.  gelu follows the engine's dtype rule (bf16 -> tanh approx,
    fp32 -> exact erf; see inference/fused_qformer._ffn)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, d = x.shape
    inter = w1.shape[1]
    chunk = ffn_chunk_size(inter)
    assert chunk, f"no lane-aligned chunk divides intermediate dim {inter}"
    num_chunks = inter // chunk
    # the FFN is purely row-wise: no item-alignment constraint on the tile
    tile = _TILE_ROWS
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
        interpret=interpret,
    )(xf, w1, _row2d(b1), w2, _row2d(b2), _row2d(ln_gamma), _row2d(ln_beta))
    return out[:rows].reshape(b, k, d)
