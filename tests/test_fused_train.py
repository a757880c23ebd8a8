"""Trainable fused Q-Former attention blocks == XLA math, values AND grads.

ops/fused_qformer_vjp.py must match a pure-jnp reference (same packing-free
per-item attention the model's XLA path computes) through jax autodiff, in
interpret mode (CPU) — the real-TPU check runs via /verify drivers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirec_tpu.ops.fused_qformer_vjp import (
    NEG_INF,
    fused_cross_attention_train,
    fused_self_attention_train,
    supports_fused_train,
)

HEADS = 4
D = 128  # head_dim 32


def _attn_ref(q, k, v, bias):
    # q [B, Lq, D] merged-head; bias [B, Lkv] additive per-key
    b, lq, d = q.shape
    hd = d // HEADS
    qh = q.reshape(b, lq, HEADS, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, k.shape[1], HEADS, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, v.shape[1], HEADS, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / (hd ** 0.5)
    s = s + bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    c = jnp.einsum("bhqk,bhkd->bhqd", p, vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return c.transpose(0, 2, 1, 3).reshape(b, lq, d)


def _self_ref(x, kbias, wqkv, bqkv, wo, bo):
    qkv = x @ wqkv + bqkv
    d = x.shape[-1]
    ctx = _attn_ref(qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :],
                    kbias)
    return ctx @ wo + bo


def _cross_ref(x, mem, kbias, wq, bq, wkv, bkv, wo, bo):
    d = x.shape[-1]
    q = x @ wq + bq
    kv = mem @ wkv + bkv
    ctx = _attn_ref(q, kv[..., :d], kv[..., d:], kbias)
    return ctx @ wo + bo


def _params(rng, dm, d):
    return dict(
        wq=jnp.asarray(rng.randn(d, d) * 0.05, jnp.float32),
        bq=jnp.asarray(rng.randn(d) * 0.01, jnp.float32),
        wkv=jnp.asarray(rng.randn(dm, 2 * d) * 0.05, jnp.float32),
        bkv=jnp.asarray(rng.randn(2 * d) * 0.01, jnp.float32),
        wqkv=jnp.asarray(rng.randn(d, 3 * d) * 0.05, jnp.float32),
        bqkv=jnp.asarray(rng.randn(3 * d) * 0.01, jnp.float32),
        wo=jnp.asarray(rng.randn(d, d) * 0.05, jnp.float32),
        bo=jnp.asarray(rng.randn(d) * 0.01, jnp.float32),
    )


@pytest.mark.parametrize("b,k", [(8, 32), (5, 32), (16, 8)])
def test_self_block_matches_reference(b, k):
    rng = np.random.RandomState(0)
    p = _params(rng, D, D)
    x = jnp.asarray(rng.randn(b, k, D), jnp.float32)
    kbias = jnp.zeros((b, k), jnp.float32)
    ct = jnp.asarray(rng.randn(b, k, D), jnp.float32)

    def loss_fused(x, wqkv, bqkv, wo, bo):
        out = fused_self_attention_train(
            x, kbias, wqkv, bqkv, wo, bo, num_heads=HEADS, interpret=True
        )
        return jnp.sum(out * ct)

    def loss_ref(x, wqkv, bqkv, wo, bo):
        return jnp.sum(_self_ref(x, kbias, wqkv, bqkv, wo, bo) * ct)

    args = (x, p["wqkv"], p["bqkv"], p["wo"], p["bo"])
    vf, gf = jax.value_and_grad(loss_fused, argnums=tuple(range(5)))(*args)
    vr, gr = jax.value_and_grad(loss_ref, argnums=tuple(range(5)))(*args)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    for a, r, name in zip(gf, gr, ["x", "wqkv", "bqkv", "wo", "bo"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-4,
            err_msg=name,
        )


def test_cross_block_matches_reference_with_masks():
    rng = np.random.RandomState(1)
    b, k, f, dm = 9, 32, 14, 96
    p = _params(rng, dm, D)
    x = jnp.asarray(rng.randn(b, k, D), jnp.float32)
    mem = jnp.asarray(rng.randn(b, f, dm), jnp.float32)
    mask = (rng.rand(b, f) > 0.3).astype(np.float32)
    mask[0] = 0.0  # an item with ZERO valid fields must not leak
    kbias = jnp.asarray((1.0 - mask) * NEG_INF, jnp.float32)
    ct = jnp.asarray(rng.randn(b, k, D), jnp.float32)

    def loss_fused(x, mem, wq, bq, wkv, bkv, wo, bo):
        out = fused_cross_attention_train(
            x, mem, kbias, wq, bq, wkv, bkv, wo, bo,
            num_heads=HEADS, interpret=True,
        )
        return jnp.sum(out * ct)

    def loss_ref(x, mem, wq, bq, wkv, bkv, wo, bo):
        return jnp.sum(_cross_ref(x, mem, kbias, wq, bq, wkv, bkv, wo, bo)
                       * ct)

    args = (x, mem, p["wq"], p["bq"], p["wkv"], p["bkv"], p["wo"], p["bo"])
    vf, gf = jax.value_and_grad(loss_fused, argnums=tuple(range(8)))(*args)
    vr, gr = jax.value_and_grad(loss_ref, argnums=tuple(range(8)))(*args)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    names = ["x", "mem", "wq", "bq", "wkv", "bkv", "wo", "bo"]
    for a, r, name in zip(gf, gr, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-4,
            err_msg=name,
        )


def test_zero_field_item_matches_xla_uniform_spread():
    """For an all-masked item the packed kernel must reproduce the XLA
    softmax-over-all-masked behaviour (uniform probs over OWN keys)."""
    rng = np.random.RandomState(2)
    b, k, f, dm = 3, 32, 7, D
    p = _params(rng, dm, D)
    x = jnp.asarray(rng.randn(b, k, D), jnp.float32)
    mem = jnp.asarray(rng.randn(b, f, dm), jnp.float32)
    kbias = jnp.full((b, f), NEG_INF, jnp.float32)
    out = fused_cross_attention_train(
        x, mem, kbias, p["wq"], p["bq"], p["wkv"], p["bkv"], p["wo"],
        p["bo"], num_heads=HEADS, interpret=True,
    )
    ref = _cross_ref(x, mem, kbias, p["wq"], p["bq"], p["wkv"], p["bkv"],
                     p["wo"], p["bo"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_item_qformer_fused_training_matches_xla():
    """ItemQFormer(fused_training=True) must reproduce the XLA path's
    forward AND gradients exactly (same params, dropout off)."""
    import dataclasses

    from unirec_tpu.configs import ItemQFormerConfig
    from unirec_tpu.models.item_qformer import ItemQFormer

    cfg = ItemQFormerConfig(
        hidden_size=D, num_hidden_layers=3, num_attention_heads=HEADS,
        intermediate_size=256, num_query_tokens=32, field_embedding_dim=D,
        num_fields=5, dropout=0.0,
    )
    cfg_fused = dataclasses.replace(cfg, fused_training=True)
    rng = np.random.RandomState(3)
    fields = jnp.asarray(rng.randn(6, 5, D), jnp.float32)
    mask = jnp.asarray((rng.rand(6, 5) > 0.3).astype(np.float32))
    m_x = ItemQFormer(cfg)
    m_f = ItemQFormer(cfg_fused)
    params = m_x.init(jax.random.PRNGKey(0), fields, mask)
    # identical param trees (the fused path creates the same modules)
    pf = m_f.init(jax.random.PRNGKey(0), fields, mask)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(pf)

    def loss(m):
        def f(p):
            out = m.apply(p, fields, mask, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(9)})
            return (
                jnp.mean(out["query_outputs"] ** 2)
                + jnp.mean(out["reconstructed_fields"] ** 2)
            )
        return f

    vx, gx = jax.value_and_grad(loss(m_x))(params)
    vf, gf = jax.value_and_grad(loss(m_f))(params)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, v in flat_x:
        np.testing.assert_allclose(
            np.asarray(flat_f[jax.tree_util.keystr(k)]), np.asarray(v),
            atol=3e-4, rtol=2e-4, err_msg=jax.tree_util.keystr(k),
        )


def test_user_qformer_fused_self_composes_with_flash():
    """UserQFormerConfig.fused_training engages the fused SELF blocks while
    the cross side (packed memory tile over VMEM) falls back — composed
    with flash_training, grads must match the plain XLA path."""
    import dataclasses

    from unirec_tpu.configs import UserQFormerConfig
    from unirec_tpu.models.user_qformer import UserQFormer

    base = UserQFormerConfig(
        hidden_size=D, num_hidden_layers=2, num_attention_heads=HEADS,
        intermediate_size=256, num_query_tokens=64, input_embedding_dim=D,
        num_item_tokens_to_predict=8, dropout=0.0,
    )
    both = dataclasses.replace(base, fused_training=True,
                               flash_training=True)
    # the cross memory is large enough that fused-cross must NOT engage
    rng = np.random.RandomState(4)
    L = 24 * 8  # 24 history items x 8 tokens
    seq = jnp.asarray(rng.randn(3, L, D), jnp.float32)
    mask = jnp.asarray((rng.rand(3, L) > 0.2).astype(np.float32))

    m1, m2 = UserQFormer(base), UserQFormer(both)
    params = m1.init(jax.random.PRNGKey(0), seq, mask)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(m2.init(jax.random.PRNGKey(0), seq,
                                             mask))

    def loss(m):
        return lambda p: jnp.mean(
            m.apply(p, seq, mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(7)}) ** 2
        )

    v1, g1 = jax.value_and_grad(loss(m1))(params)
    v2, g2 = jax.value_and_grad(loss(m2))(params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g2),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(k),
        )


def test_supports_fused_train_gate():
    assert supports_fused_train(32, 1024, 16, 14)
    assert supports_fused_train(8, 1024, 16, 14)
    assert not supports_fused_train(33, 1024, 16, 14)   # 256 % 33 != 0
    assert not supports_fused_train(32, 1000, 16, 14)   # heads don't split
    assert not supports_fused_train(1, 1024, 16, 1600)  # mem tile too big
    assert not supports_fused_train(32, 2048, 16, 14)   # weights over VMEM


def _item_trainer_cfg():
    import dataclasses

    from unirec_tpu.configs import ItemQFormerConfig

    return dataclasses.replace(
        ItemQFormerConfig(
            hidden_size=D, num_hidden_layers=2, num_attention_heads=HEADS,
            intermediate_size=256, num_query_tokens=32,
            field_embedding_dim=D, num_fields=5,
            dropout=0.0,  # dp shards draw independent dropout bits; exact
            # dp=4 == dp=1 comparison needs dropout off
        ),
        fused_training=True,
    )


def test_item_trainer_fused_dp_shard_map_matches_single_device(
    eight_devices,
):
    """The kernel-bearing item step routes through an explicit shard_map on
    dp meshes (GSPMD cannot partition pallas_call); with the pmean-count
    recon normalization, one dp=4 step must match dp=1 exactly even with
    NON-UNIFORM per-shard valid-field counts."""
    from unirec_tpu.configs import (
        MeshConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from unirec_tpu.train.item_qformer import ItemQFormerTrainer

    cfg = _item_trainer_cfg()
    rng = np.random.RandomState(5)
    b, f, d = 8, 5, D
    mask = (rng.rand(b, f) > 0.4).astype(np.float32)
    mask[:, 0] = 1.0  # no all-masked anchors
    batch = {
        "anchor_emb": jnp.asarray(rng.randn(b, f, d), jnp.float32),
        "anchor_mask": jnp.asarray(mask),
        "pos_emb": jnp.asarray(rng.randn(b, f, d), jnp.float32),
        "pos_mask": jnp.ones((b, f), jnp.float32),
        "neg_emb": jnp.asarray(rng.randn(b, f, d), jnp.float32),
        "neg_mask": jnp.ones((b, f), jnp.float32),
    }

    def run(dp):
        t = ItemQFormerTrainer(
            cfg,
            TrainConfig(batch_size=b, seed=3,
                        optimizer=OptimizerConfig(learning_rate=1e-3),
                        mesh=MeshConfig(dp=dp)),
            dtype="float32",  # exact comparison; kernels run interpret
            fused_reference_forwards=True,
        )
        state = t.init_state(seed=0)
        state, m = t._train_step(state, batch)
        return float(m["loss"]), float(m["recon"]), state

    l1, r1, s1 = run(1)
    l4, r4, s4 = run(4)
    np.testing.assert_allclose(l4, l1, rtol=1e-6)
    np.testing.assert_allclose(r4, r1, rtol=1e-6)
    leaf1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    leaf4 = np.asarray(jax.tree_util.tree_leaves(s4.params)[0])
    np.testing.assert_allclose(leaf4, leaf1, atol=1e-6)


def test_item_trainer_fused_refuses_tp(eight_devices):
    import pytest

    from unirec_tpu.configs import MeshConfig, TrainConfig
    from unirec_tpu.train.item_qformer import ItemQFormerTrainer

    with pytest.raises(ValueError, match="tp>1"):
        ItemQFormerTrainer(
            _item_trainer_cfg(),
            TrainConfig(batch_size=8, mesh=MeshConfig(dp=4, tp=2)),
            dtype="bfloat16",
        )


def _user_trainer_cfg():
    from unirec_tpu.configs import UserQFormerConfig

    return UserQFormerConfig(
        hidden_size=D, num_hidden_layers=2, num_attention_heads=HEADS,
        intermediate_size=256, num_query_tokens=64, input_embedding_dim=D,
        num_item_tokens_to_predict=8,
        dropout=0.0,  # dp shards draw independent dropout bits; the exact
        # dp=4 == dp=1 comparison needs hidden dropout off too
        fused_training=True, flash_training=True,
    )


def test_user_config_kernel_flags_zero_prob_dropout():
    """fused_training/flash_training must zero attention-PROB dropout in the
    derived QFormerConfig — the kernels only engage when the prob-dropout
    rng is absent, so leaving it at the configured rate would make the
    flags silently inert in training (hidden dropout stays configured)."""
    import dataclasses

    from unirec_tpu.configs import UserQFormerConfig

    base = UserQFormerConfig(dropout=0.1)
    assert base.qformer().attention_probs_dropout_prob == 0.1
    for flag in ("fused_training", "flash_training"):
        qc = dataclasses.replace(base, **{flag: True}).qformer()
        assert qc.attention_probs_dropout_prob == 0.0, flag
        assert qc.hidden_dropout_prob == 0.1, flag


def test_user_trainer_kernel_dp_shard_map_matches_single_device(
    eight_devices,
):
    """UserQFormerTrainer with kernel-bearing training flags routes dp
    meshes through an explicit shard_map (GSPMD cannot partition
    pallas_call); with the pmean'd weight-sum normalization, one dp=4 step
    must match dp=1 exactly even with NON-UNIFORM per-shard sample
    weights (including zero-weighted rows)."""
    from unirec_tpu.configs import (
        MeshConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from unirec_tpu.train.user_qformer import UserQFormerTrainer

    cfg = _user_trainer_cfg()
    rng = np.random.RandomState(11)
    b, s = 8, 12
    k, d = cfg.num_item_tokens_to_predict, cfg.input_embedding_dim
    batch = {
        "item_tokens": jnp.asarray(rng.randn(b, s, k, d), jnp.float32),
        "timestamps": jnp.asarray(rng.rand(b, s) * 1e9, jnp.float32),
        "coordinates": jnp.asarray(rng.randn(b, s, 2), jnp.float32),
        "seq_mask": jnp.ones((b, s), jnp.float32),
        "target_tokens": jnp.asarray(rng.randn(b, k, d), jnp.float32),
        # per-shard weight sums 2, 1, 2, 0 — exercises both the uneven
        # normalization and an all-zero shard (clamped globally)
        "sample_weight": jnp.asarray(
            [1, 1, 0, 1, 1, 1, 0, 0], jnp.float32
        ),
    }

    def run(dp):
        t = UserQFormerTrainer(
            cfg,
            TrainConfig(batch_size=b, seed=3,
                        optimizer=OptimizerConfig(learning_rate=1e-3),
                        mesh=MeshConfig(dp=dp)),
            dtype="float32",  # exact comparison; kernels run interpret
        )
        state = t.init_state(seed=0)
        state, m = t._train_step(state, batch)
        return float(m["loss"]), state

    l1, s1 = run(1)
    l4, s4 = run(4)
    np.testing.assert_allclose(l4, l1, rtol=1e-6)
    leaf1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    leaf4 = np.asarray(jax.tree_util.tree_leaves(s4.params)[0])
    np.testing.assert_allclose(leaf4, leaf1, atol=1e-6)


def test_masked_recon_pmean_degenerate_count(eight_devices):
    """0 < global valid-field count C < n_shards must still match dp=1:
    the all-empty clamp applies to the GLOBAL count (max(C,1)/S), not the
    per-shard pmean (which is C/S < 1 and must NOT be clamped to 1)."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from unirec_tpu.ops.losses import masked_reconstruction_mse

    rng = np.random.RandomState(0)
    b, f, d = 8, 3, 4
    recon = jnp.asarray(rng.randn(b, f, d), jnp.float32)
    target = jnp.asarray(rng.randn(b, f, d), jnp.float32)
    mask = np.zeros((b, f), np.float32)
    mask[0, 0] = 1.0
    mask[5, 2] = 1.0  # C=2 valid fields over S=4 shards
    mask = jnp.asarray(mask)

    mesh = Mesh(np.array(eight_devices[:4]), ("dp",))

    def sharded_loss(r, t, m):
        return jax.lax.pmean(
            masked_reconstruction_mse(r, t, m, axis_name="dp"), "dp"
        )

    run = jax.jit(jax.shard_map(
        sharded_loss, mesh=mesh, in_specs=(P("dp"), P("dp"), P("dp")),
        out_specs=P(), check_vma=False,
    ))
    full = masked_reconstruction_mse(recon, target, mask)
    np.testing.assert_allclose(float(run(recon, target, mask)),
                               float(full), rtol=1e-6)

    # all-masked batch: the clamp guards div-by-zero, loss stays 0
    zmask = jnp.zeros((b, f))
    assert float(run(recon, target, zmask)) == 0.0
    assert float(masked_reconstruction_mse(recon, target, zmask)) == 0.0


def test_user_trainer_kernel_refuses_tp(eight_devices):
    import pytest

    from unirec_tpu.configs import MeshConfig, TrainConfig
    from unirec_tpu.train.user_qformer import UserQFormerTrainer

    with pytest.raises(ValueError, match="tp>1"):
        UserQFormerTrainer(
            _user_trainer_cfg(),
            TrainConfig(batch_size=8, mesh=MeshConfig(dp=4, tp=2)),
            dtype="bfloat16",
        )
