"""Ranking ops: rank computation, metrics, full-catalog retrieval kernel."""

import jax.numpy as jnp
import numpy as np

from unirec_tpu.ops.losses import info_nce_loss
from unirec_tpu.ops.ranking import (
    rank_of_positive,
    ranking_metrics,
    retrieve_top_k,
    top_k_items,
)


def _embed(vals):
    return jnp.asarray(np.array(vals, np.float32))


def test_rank_of_positive_exact():
    user = _embed([[1.0, 0.0]])
    pos = _embed([[1.0, 0.0]])  # sim 1.0
    negs = _embed([[[0.9, 0.1], [0.0, 1.0], [-1.0, 0.0]]])  # sims < 1
    ranks = rank_of_positive(user, pos, negs)
    assert int(ranks[0]) == 1

    pos2 = _embed([[0.0, 1.0]])  # sim 0; neg sims ~ [0.995, 0, -1]
    # only the 0.995 neg strictly beats it; the sim-0 neg ties and the
    # positive wins ties -> rank 2
    ranks2 = rank_of_positive(user, pos2, negs)
    assert int(ranks2[0]) == 2


def test_rank_with_negative_mask():
    user = _embed([[1.0, 0.0]])
    pos = _embed([[0.0, 1.0]])
    negs = _embed([[[1.0, 0.0], [1.0, 0.0]]])
    # unmasked: both negs beat pos -> rank 3; masked: rank 1
    assert int(rank_of_positive(user, pos, negs)[0]) == 3
    mask = jnp.asarray([[0.0, 0.0]])
    assert int(rank_of_positive(user, pos, negs, mask)[0]) == 1


def test_ranking_metrics_values():
    # 2 users: one ranks 1, one ranks 3 (of 1+3 candidates)
    user = _embed([[1.0, 0.0], [1.0, 0.0]])
    pos = _embed([[1.0, 0.0], [0.05, 1.0]])
    negs = _embed(
        [
            [[0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]],
            [[0.9, 0.1], [0.8, 0.2], [-1.0, 0.0]],
        ]
    )
    m = ranking_metrics(user, pos, negs, ks=(1, 2, 10))
    ranks = rank_of_positive(user, pos, negs)
    np.testing.assert_array_equal(np.asarray(ranks), [1, 3])
    np.testing.assert_allclose(float(m["mrr"]), (1.0 + 1.0 / 3) / 2, rtol=1e-6)
    np.testing.assert_allclose(float(m["recall@1"]), 0.5)
    np.testing.assert_allclose(float(m["recall@10"]), 1.0)
    np.testing.assert_allclose(
        float(m["ndcg@10"]), (1.0 + 1.0 / np.log2(4)) / 2, rtol=1e-6
    )


def test_top_k_items_xla():
    rng = np.random.RandomState(0)
    users = _embed(rng.randn(4, 16))
    catalog = _embed(rng.randn(50, 16))
    scores, idx = top_k_items(users, catalog, k=5)
    assert scores.shape == (4, 5) and idx.shape == (4, 5)
    # brute force check
    u = np.asarray(users) / np.linalg.norm(users, axis=1, keepdims=True)
    c = np.asarray(catalog) / np.linalg.norm(catalog, axis=1, keepdims=True)
    full = u @ c.T
    np.testing.assert_array_equal(
        np.asarray(idx), np.argsort(-full, axis=1)[:, :5]
    )


def test_retrieve_top_k_pallas_interpret():
    """Pallas blocked retrieval == XLA top-k (interpret mode on CPU)."""
    rng = np.random.RandomState(1)
    users = _embed(rng.randn(10, 32))
    catalog = _embed(rng.randn(300, 32))
    s_ref, i_ref = top_k_items(users, catalog, k=7)
    s_pl, i_pl = retrieve_top_k(
        users, catalog, k=7, block_u=8, block_n=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), atol=1e-5)


def test_info_nce_matches_manual():
    rng = np.random.RandomState(2)
    u = rng.randn(3, 8).astype(np.float32)
    p = rng.randn(3, 8).astype(np.float32)
    n = rng.randn(3, 5, 8).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 0, 0, 0, 0]], np.float32)

    loss = float(info_nce_loss(jnp.asarray(u), jnp.asarray(p), jnp.asarray(n),
                               jnp.asarray(mask)))

    # manual per-sample computation mirroring the reference loop
    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    un, pn, nn = norm(u), norm(p), norm(n)
    t = 0.07
    losses = []
    for i in range(3):
        pos = float(un[i] @ pn[i]) / t
        negs = (nn[i] @ un[i]) / t
        valid = negs[mask[i] > 0]
        allv = np.concatenate([[pos], valid])
        m = allv.max()
        lse = m + np.log(np.exp(allv - m).sum())
        losses.append(-pos + lse)
    np.testing.assert_allclose(loss, np.mean(losses), rtol=1e-5)


def test_retrieve_top_k_negative_scores_with_padded_catalog():
    """Padded catalog rows (cosine 0) must not evict real items whose
    similarity is negative (code-review r2 finding)."""
    import jax

    from unirec_tpu.ops.ranking import retrieve_top_k, top_k_items

    rng = np.random.RandomState(0)
    n = 1030  # not a multiple of any block size -> padding in the last block
    base = rng.randn(1024).astype(np.float32)
    # catalog anti-aligned with the user -> ALL similarities negative
    catalog = -np.abs(rng.rand(n, 1)).astype(np.float32) * base[None, :]
    catalog += rng.randn(n, 1024).astype(np.float32) * 1e-3
    users = np.tile(base, (4, 1)).astype(np.float32)

    s_ref, i_ref = top_k_items(jnp.asarray(users), jnp.asarray(catalog), k=10)
    s_p, i_p = retrieve_top_k(
        jnp.asarray(users), jnp.asarray(catalog), k=10,
        block_n=256, interpret=True,
    )
    assert np.isfinite(np.asarray(s_p)).all()
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_ref), atol=1e-5)
