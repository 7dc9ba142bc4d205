"""Pooling ops vs numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_geometric_tpu import nn as tnn
from tf_geometric_tpu.nn.pool.topk_pool import topk_pool_fixed
from tests.conftest import dense_adj


def make_batch(rng, graphs=3, nodes_per=6, f=4, edges_per=10):
    ngi = np.repeat(np.arange(graphs), nodes_per).astype(np.int32)
    n = graphs * nodes_per
    x = rng.normal(size=(n, f)).astype(np.float32)
    eis = []
    for g in range(graphs):
        base = g * nodes_per
        e = rng.integers(base, base + nodes_per, size=(2, edges_per))
        eis.append(e)
    ei = np.concatenate(eis, axis=1).astype(np.int32)
    ew = rng.uniform(0.5, 1.5, size=ei.shape[1]).astype(np.float32)
    return x, ei, ew, ngi


def test_topk_pool_matches_manual(rng):
    src = np.array([0, 0, 0, 1, 1, 2], np.int32)
    score = np.array([0.5, 0.9, 0.1, 0.3, 0.7, 0.2], np.float32)
    out = tnn.topk_pool(src, score, k=2)
    np.testing.assert_array_equal(out, [1, 0, 4, 3, 5])
    out_ratio = tnn.topk_pool(src, score, ratio=0.5)
    np.testing.assert_array_equal(out_ratio, [1, 0, 4, 5])


def test_topk_pool_fixed_matches_dynamic(rng):
    src = rng.integers(0, 4, size=25).astype(np.int32)
    score = rng.normal(size=25).astype(np.float32)
    dyn = tnn.topk_pool(src, score, k=3)
    idx, valid = jax.jit(topk_pool_fixed, static_argnums=(2, 3))(
        jnp.asarray(src), jnp.asarray(score), 4, 3)
    fixed = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(np.sort(fixed), np.sort(dyn))


def test_cluster_pool_oracle(rng):
    n, c, f = 8, 3, 4
    x = rng.normal(size=(n, f)).astype(np.float32)
    ei = rng.integers(0, n, size=(2, 20)).astype(np.int32)
    ew = rng.uniform(0.5, 1.5, size=20).astype(np.float32)
    # hard assignment
    assign = rng.integers(0, c, size=n).astype(np.int32)
    a_ei = np.stack([np.arange(n, dtype=np.int32), assign], axis=0)
    a_w = rng.uniform(0.5, 1.0, size=n).astype(np.float32)

    pooled_x, pei, pew = tnn.cluster_pool(jnp.asarray(x), jnp.asarray(ei),
                                          jnp.asarray(ew), jnp.asarray(a_ei),
                                          jnp.asarray(a_w), c, num_nodes=n)
    S = np.zeros((n, c), np.float32)
    S[np.arange(n), assign] = a_w
    A = dense_adj(ei, ew, n)
    expected_adj = S.T @ A @ S
    got = np.zeros((c, c), np.float32)
    np.add.at(got, (np.asarray(pei[0]), np.asarray(pei[1])), np.asarray(pew))
    np.testing.assert_allclose(got, expected_adj, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled_x), S.T @ x, rtol=1e-4, atol=1e-4)


def test_diff_pool_coarsen_oracle(rng):
    x, ei, ew, ngi = make_batch(rng)
    n = x.shape[0]
    c = 2
    assign = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)))
    px, pei, pew, pngi = tnn.diff_pool_coarsen(jnp.asarray(x), jnp.asarray(ei),
                                               jnp.asarray(ew), jnp.asarray(ngi),
                                               assign, num_graphs=3)
    S_np = np.asarray(assign)
    A = dense_adj(ei, ew, n)
    # big block-diagonal S
    S_big = np.zeros((n, 3 * c), np.float32)
    for i in range(n):
        S_big[i, ngi[i] * c:(ngi[i] + 1) * c] = S_np[i]
    expected_adj = S_big.T @ A @ S_big
    got = np.zeros((3 * c, 3 * c), np.float32)
    np.add.at(got, (np.asarray(pei[0]), np.asarray(pei[1])), np.asarray(pew))
    np.testing.assert_allclose(got, expected_adj, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(px), S_big.T @ x, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pngi), np.repeat(np.arange(3), c))


def test_min_cut_losses_finite_and_reasonable(rng):
    x, ei, ew, ngi = make_batch(rng)
    n = x.shape[0]
    c = 2
    assign = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)))
    cut, orth = tnn.min_cut_pool_compute_losses(jnp.asarray(ei), jnp.asarray(ew),
                                                jnp.asarray(ngi), assign,
                                                num_graphs=3)
    assert np.isfinite(float(cut)) and np.isfinite(float(orth))
    assert -1.0 <= float(cut) <= 0.0  # normalized cut ratio in [-1, 0]
    assert 0.0 <= float(orth) <= 2.0

    # perfect 1-cluster assignment → orth deviation = 0 when C=1
    assign1 = jnp.ones((n, 1))
    _, orth1 = tnn.min_cut_pool_compute_losses(jnp.asarray(ei), jnp.asarray(ew),
                                               jnp.asarray(ngi), assign1,
                                               num_graphs=3)
    np.testing.assert_allclose(float(orth1), 0.0, atol=1e-5)


def test_min_cut_pool_end_to_end(rng):
    x, ei, ew, ngi = make_batch(rng)

    def fake_gnn(units):
        w = rng.normal(size=(x.shape[1], units)).astype(np.float32)
        def fn(inputs, training=None, cache=None):
            return jnp.asarray(inputs[0]) @ jnp.asarray(w)
        return fn

    outputs, (cut, orth) = tnn.min_cut_pool(
        jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew), jnp.asarray(ngi),
        feature_gnn=fake_gnn(5), assign_gnn=fake_gnn(2), num_clusters=2,
        return_losses=True, num_graphs=3)
    ph, pei, pew, pngi = outputs
    assert ph.shape == (6, 5)
    # pooled self-loops zeroed
    loops = np.asarray(pei[0]) == np.asarray(pei[1])
    np.testing.assert_allclose(np.asarray(pew)[loops], 0.0, atol=1e-6)


def test_sag_and_sort_pool(rng):
    x, ei, ew, ngi = make_batch(rng)

    def score_gnn(inputs, training=None, cache=None):
        return jnp.sum(jnp.asarray(inputs[0]), axis=-1, keepdims=True)

    px, pei, pew, pngi = tnn.sag_pool(jnp.asarray(x), ei, jnp.asarray(ew), ngi,
                                      score_gnn, k=3,
                                      score_activation=jax.nn.sigmoid)
    assert px.shape == (9, 4)  # 3 graphs × 3 kept
    assert pngi.shape == (9,)
    assert (np.asarray(pei) <= 9).all()  # 9 = padded-edge sentinel (capacity)

    px2, pei2, pew2, pngi2 = tnn.sort_pool(jnp.asarray(x), ei, jnp.asarray(ew),
                                           ngi, k=2)
    assert px2.shape == (6, 4)
    # gradient flows through sag_pool x scaling
    def loss(xx):
        out = tnn.sag_pool(xx, ei, jnp.asarray(ew), ngi, score_gnn, k=3,
                           score_activation=jax.nn.sigmoid)[0]
        return jnp.sum(out ** 2)
    g = jax.grad(loss)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_asap_runs(rng):
    x, ei, ew, ngi = make_batch(rng, graphs=2, nodes_per=5, f=6, edges_per=8)
    f, units = 6, 4
    w = lambda *s: jnp.asarray(rng.normal(scale=0.3, size=s).astype(np.float32))
    out = tnn.asap(jnp.asarray(x), ei, ew, ngi,
                   attention_gcn_kernel=w(f, units), attention_gcn_bias=jnp.zeros(units),
                   attention_query_kernel=w(units, units), attention_query_bias=jnp.zeros(units),
                   attention_score_kernel=w(2 * units, 1), attention_score_bias=jnp.zeros(1),
                   le_conv_self_kernel=w(f, 1), le_conv_self_bias=jnp.zeros(1),
                   le_conv_aggr_self_kernel=w(f, 1), le_conv_aggr_self_bias=jnp.zeros(1),
                   le_conv_aggr_neighbor_kernel=w(f, 1), le_conv_aggr_neighbor_bias=jnp.zeros(1),
                   ratio=0.5)
    px, pei, pew, pngi = out
    assert px.shape[1] == f
    assert np.isfinite(np.asarray(px)).all()
    assert pngi.shape[0] == px.shape[0]


def test_set2set(rng):
    x, ei, ew, ngi = make_batch(rng)
    f = x.shape[1]

    def fake_lstm(h, state):
        # linear "lstm": out = h @ W, carry nothing
        return h[:, :f], state

    out = tnn.set2set(jnp.asarray(x), jnp.asarray(ngi), fake_lstm,
                      num_iterations=2, num_graphs=3)
    assert out.shape == (3, 2 * f)
    assert np.isfinite(np.asarray(out)).all()


def test_topk_pool_rejects_k_and_ratio():
    import pytest
    import tf_geometric_tpu as tfg
    with pytest.raises(ValueError, match="not both"):
        tfg.nn.topk_pool(jnp.zeros(4, jnp.int32), jnp.ones(4), k=2, ratio=0.5)
