"""Sequence-parallel cross-attention == unsharded attention, on the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirec_tpu.configs import MeshConfig
from unirec_tpu.ops.attention import attention, make_additive_mask
from unirec_tpu.ops.sharded_attention import sequence_parallel_cross_attention
from unirec_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("tp", [2, 4])
def test_matches_unsharded(eight_devices, tp):
    mesh = make_mesh(MeshConfig(dp=8 // tp, tp=tp))
    rng = np.random.RandomState(0)
    b, h, lq, lkv, hd = 2, 4, 8, 64, 16
    q = jnp.asarray(rng.randn(b, h, lq, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, lkv, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, lkv, hd).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, lkv) > 0.3).astype(np.float32))
    bias = make_additive_mask(mask)

    ref = attention(q, k, v, bias)
    out = sequence_parallel_cross_attention(q, k, v, bias, mesh=mesh, axis="tp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_all_masked_shard(eight_devices):
    """A shard whose keys are entirely masked must not produce NaNs."""
    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    rng = np.random.RandomState(1)
    b, h, lq, lkv, hd = 1, 2, 4, 16, 8
    q = jnp.asarray(rng.randn(b, h, lq, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, lkv, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, lkv, hd).astype(np.float32))
    mask = np.ones((b, lkv), np.float32)
    mask[:, lkv // 2 :] = 0.0  # second shard fully masked
    bias = make_additive_mask(jnp.asarray(mask))
    ref = attention(q, k, v, bias)
    out = sequence_parallel_cross_attention(q, k, v, bias, mesh=mesh, axis="tp")
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_indivisible_length_raises(eight_devices):
    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    q = jnp.zeros((1, 2, 4, 8))
    k = jnp.zeros((1, 2, 15, 8))
    with pytest.raises(ValueError, match="not divisible"):
        sequence_parallel_cross_attention(q, k, k, mesh=mesh, axis="tp")
