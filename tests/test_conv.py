"""Conv-family numerical parity vs dense oracles built from SURVEY §2.2 formulas."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_geometric_tpu import nn as tnn
from tf_geometric_tpu.sparse import SparseMatrix
from tests.conftest import dense_adj, random_graph


def gcn_norm_dense(adj, add_self_loop=True, renorm=True, improved=False):
    """Dense oracle for gcn_norm_adj (norm='both', sym)."""
    a = adj.copy()
    fill = 2.0 if improved else 1.0
    if add_self_loop and renorm:
        a = a + fill * np.eye(a.shape[0])
    deg = a.sum(axis=1)
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    normed = dinv[:, None] * a * dinv[None, :]
    if add_self_loop and not renorm:
        normed = normed + fill * np.eye(a.shape[0])
    return normed


@pytest.mark.parametrize("renorm,improved", [(True, False), (False, False), (True, True)])
def test_gcn_matches_dense(rng, renorm, improved):
    x, ei, ew = random_graph(rng, 20, 60, 8)
    n = 20
    w = rng.normal(size=(8, 5)).astype(np.float32)
    b = rng.normal(size=5).astype(np.float32)
    adj = SparseMatrix(ei, ew, (n, n))
    out = tnn.gcn(jnp.asarray(x), adj, jnp.asarray(w), jnp.asarray(b),
                  activation=jax.nn.relu, renorm=renorm, improved=improved)
    normed = gcn_norm_dense(dense_adj(ei, ew, n), renorm=renorm, improved=improved)
    expected = np.maximum(normed @ (x @ w) + b, 0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_gcn_cache_hits(rng):
    x, ei, ew = random_graph(rng, 15, 40, 6)
    adj = SparseMatrix(ei, ew, (15, 15))
    cache = {}
    w = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    out1 = tnn.gcn(jnp.asarray(x), adj, w, cache=cache)
    # one normalization entry + its ELL-compiled twin
    assert len([k for k in cache if not k.endswith(":ell")]) == 1
    out2 = tnn.gcn(jnp.asarray(x), adj, w, cache=cache)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_gat_oracle_single_head(rng):
    n, f, units = 12, 6, 4
    x, ei, _ = random_graph(rng, n, 30, f)
    wq = rng.normal(size=(f, units)).astype(np.float32)
    wk = rng.normal(size=(f, units)).astype(np.float32)
    wv = rng.normal(size=(f, units)).astype(np.float32)
    bq = rng.normal(size=units).astype(np.float32)
    bk = rng.normal(size=units).astype(np.float32)

    out = tnn.gat(jnp.asarray(x), jnp.asarray(ei),
                  jnp.asarray(wq), jnp.asarray(bq), jax.nn.relu,
                  jnp.asarray(wk), jnp.asarray(bk), jax.nn.relu,
                  jnp.asarray(wv), num_heads=1)

    # dense oracle with self-loops appended
    ei_sl = np.concatenate([ei, np.tile(np.arange(n), (2, 1))], axis=1)
    Q = np.maximum(x @ wq + bq, 0)
    K = np.maximum(x @ wk + bk, 0)
    V = x @ wv
    scores = (Q[ei_sl[0]] * K[ei_sl[1]]).sum(-1) / np.sqrt(units)
    expected = np.zeros((n, units), np.float32)
    for i in range(n):
        mask = ei_sl[0] == i
        att = np.exp(scores[mask] - scores[mask].max())
        att = att / (att.sum() + 1e-8)
        expected[i] = (att[:, None] * V[ei_sl[1][mask]]).sum(0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-4)


def test_gat_multihead_shapes(rng):
    n, f = 10, 8
    x, ei, _ = random_graph(rng, n, 25, f)
    heads, units = 4, 12  # total feature dims divisible by heads
    wq = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    wv = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    zq = jnp.zeros(units)
    concat = tnn.gat(jnp.asarray(x), jnp.asarray(ei), wq, zq, None, wk, zq, None,
                     wv, num_heads=heads, split_value_heads=True)
    assert concat.shape == (n, units)
    mean = tnn.gat(jnp.asarray(x), jnp.asarray(ei), wq, zq, None, wk, zq, None,
                   wv, num_heads=heads, split_value_heads=False)
    assert mean.shape == (n, units // heads)


def test_sgc_appnp_ssgc_tagcn_oracles(rng):
    n, f, c = 14, 5, 3
    x, ei, ew = random_graph(rng, n, 40, f)
    normed = gcn_norm_dense(dense_adj(ei, ew, n))
    w = rng.normal(size=(f, c)).astype(np.float32)

    # SGC: A^k (x w)
    out = tnn.sgc(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew), k=2,
                  kernel=jnp.asarray(w))
    expected = normed @ (normed @ (x @ w))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)

    # APPNP with single dense layer, no dropout
    out = tnn.appnp(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew),
                    [jnp.asarray(w)], [None], k=3, alpha=0.2)
    h = x @ w
    o = h.copy()
    for _ in range(3):
        o = 0.8 * (normed @ o) + 0.2 * h
    np.testing.assert_allclose(np.asarray(out), o, rtol=1e-4, atol=1e-4)

    # SSGC
    out = tnn.ssgc(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew),
                   [jnp.asarray(w)], [None], k=4, alpha=0.1)
    h = x @ w
    o = 0.1 * h
    cur = h
    for _ in range(4):
        cur = normed @ cur
        o = o + 0.9 * cur / 4
    np.testing.assert_allclose(np.asarray(out), o, rtol=1e-4, atol=1e-4)

    # TAGCN (renorm=False default)
    w_tag = rng.normal(size=(f * 3, c)).astype(np.float32)
    out = tnn.tagcn(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew), k=2,
                    kernel=jnp.asarray(w_tag))
    normed_nr = gcn_norm_dense(dense_adj(ei, ew, n), renorm=False)
    xs = [x, normed_nr @ x, normed_nr @ (normed_nr @ x)]
    expected = np.concatenate(xs, axis=-1) @ w_tag
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_chebynet_oracle(rng):
    n, f, c, k = 12, 4, 3, 3
    x, ei, ew = random_graph(rng, n, 30, f)
    kernels = [jnp.asarray(rng.normal(size=(f, c)).astype(np.float32)) for _ in range(k)]
    out = tnn.chebynet(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew), k, kernels)

    # dense oracle: self-loops removed first, then the reference's
    # (non-negated) "laplacian": Â + I (reference graph_utils.py:571-582)
    keep = ei[0] != ei[1]
    ei2, ew2 = ei[:, keep], ew[keep]
    a = dense_adj(ei2, ew2, n)
    deg = a.sum(1)
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    lap = np.eye(n) + dinv[:, None] * a * dinv[None, :]
    lap_scaled = 2.0 * lap / 2.0
    t0, t1 = x, lap_scaled @ x
    expected = t0 @ np.asarray(kernels[0]) + t1 @ np.asarray(kernels[1])
    t2 = 2 * lap_scaled @ t1 - t0
    expected = expected + t2 @ np.asarray(kernels[2])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-4)


def test_gin_oracle(rng):
    n, f = 10, 6
    x, ei, _ = random_graph(rng, n, 25, f)
    out = tnn.gin(jnp.asarray(x), jnp.asarray(ei), lambda h, training=None: h * 2.0,
                  eps=0.5)
    a = dense_adj(ei, np.ones(ei.shape[1], np.float32), n)
    expected = (x * 1.5 + a @ x) * 2.0
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_le_conv_oracle(rng):
    n, f, u = 9, 5, 3
    x, ei, ew = random_graph(rng, n, 20, f)
    ws = rng.normal(size=(3, f, u)).astype(np.float32)
    out = tnn.le_conv(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew),
                      jnp.asarray(ws[0]), None, jnp.asarray(ws[1]), None,
                      jnp.asarray(ws[2]), None)
    self_h = x @ ws[0]
    diff = (x @ ws[1] - x @ ws[2])[ei[1]] * ew[:, None]
    agg = np.zeros((n, u), np.float32)
    np.add.at(agg, ei[0], diff)
    np.testing.assert_allclose(np.asarray(out), self_h + agg, rtol=1e-4, atol=1e-4)


def test_graph_sage_variants(rng):
    n, f, u = 11, 6, 4
    x, ei, ew = random_graph(rng, n, 30, f)
    ws = jnp.asarray(rng.normal(size=(f, u)).astype(np.float32))
    wn = jnp.asarray(rng.normal(size=(f, u)).astype(np.float32))

    out = tnn.mean_graph_sage(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew), ws, wn)
    # oracle
    msg = x[ei[1]] * ew[:, None]
    mean_agg = np.zeros((n, f), np.float32)
    cnt = np.zeros(n, np.float32)
    np.add.at(mean_agg, ei[0], msg)
    np.add.at(cnt, ei[0], 1.0)
    mean_agg /= np.maximum(cnt, 1.0)[:, None]
    expected = np.concatenate([x @ np.asarray(ws), mean_agg @ np.asarray(wn)], axis=1)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)

    out_sum = tnn.sum_graph_sage(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew),
                                 ws, wn, concat=False, normalize=True)
    assert out_sum.shape == (n, u)
    norms = np.linalg.norm(np.asarray(out_sum), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    # gcn variant keeps user weights (reference bug fixed)
    out_gcn = tnn.gcn_graph_sage(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew),
                                 kernel=ws)
    assert np.isfinite(np.asarray(out_gcn)).all()

    wm = jnp.asarray(rng.normal(size=(f, u)).astype(np.float32))
    wn2 = jnp.asarray(rng.normal(size=(u, u)).astype(np.float32))
    for fn in (tnn.mean_pool_graph_sage, tnn.max_pool_graph_sage):
        out_p = fn(jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew),
                   ws, wm, wn2, activation=jax.nn.relu)
        assert out_p.shape == (n, 2 * u)
        assert np.isfinite(np.asarray(out_p)).all()


def test_lstm_graph_sage_mean_aggregator_path(rng):
    n, f, u = 8, 4, 3
    x, ei, _ = random_graph(rng, n, 20, f)
    ws = jnp.asarray(rng.normal(size=(f, u)).astype(np.float32))
    wn = jnp.asarray(rng.normal(size=(f, u)).astype(np.float32))
    # identity "lstm": output = input; mean over neighbor slots includes
    # zero-padding rows (reference semantics: mean over max-degree slots)
    out = tnn.lstm_graph_sage(jnp.asarray(x), jnp.asarray(ei), lambda h: h, ws, wn)
    assert out.shape == (n, 2 * u)
    assert np.isfinite(np.asarray(out)).all()


def test_drop_edge_masks_edges(rng):
    x, ei, ew = random_graph(rng, 10, 40, 4)
    out = tnn.drop_edge([jnp.asarray(ei), jnp.asarray(ew)], rate=0.5,
                        training=True, key=jax.random.PRNGKey(0), num_nodes=10)
    new_ei, new_ew = out
    assert new_ei.shape == ei.shape  # static shape preserved
    dropped = np.asarray(new_ei[0]) == 10
    assert 0 < dropped.sum() < 40
    np.testing.assert_array_equal(np.asarray(new_ew)[dropped], 0.0)
    # not training → identity
    same = tnn.drop_edge([jnp.asarray(ei), jnp.asarray(ew)], rate=0.5, training=False)
    assert same[0] is not None and same[0].shape == ei.shape


def test_drop_edge_force_undirected(rng):
    # build an undirected edge list
    base = rng.integers(0, 12, size=(2, 20))
    base = base[:, base[0] != base[1]]
    und = np.concatenate([base, base[::-1]], axis=1).astype(np.int32)
    out = tnn.drop_edge([jnp.asarray(und)], rate=0.5, force_undirected=True,
                        training=True, key=jax.random.PRNGKey(3), num_nodes=12)
    new_ei = np.asarray(out[0])
    # both directions must share fate
    kept = {}
    for e in range(new_ei.shape[1]):
        r, c = int(und[0, e]), int(und[1, e])
        key_ = (min(r, c), max(r, c))
        is_kept = new_ei[0, e] != 12
        if key_ in kept:
            assert kept[key_] == is_kept
        kept[key_] = is_kept


def test_common_pools(rng):
    x = rng.normal(size=(12, 5)).astype(np.float32)
    ngi = np.repeat(np.arange(3), 4).astype(np.int32)
    from tf_geometric_tpu.nn import mean_pool, sum_pool, max_pool, min_pool
    for fn, op in [(mean_pool, np.mean), (sum_pool, np.sum),
                   (max_pool, np.max), (min_pool, np.min)]:
        out = np.asarray(fn(jnp.asarray(x), jnp.asarray(ngi), 3))
        expected = np.stack([op(x[ngi == g], axis=0) for g in range(3)])
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_precomputed_propagation_matches_gcn(rng):
    from tf_geometric_tpu.nn.conv.gcn import (gcn, precompute_propagated_features)
    x, ei, ew = random_graph(rng, 18, 50, 8)
    adj = SparseMatrix(ei, ew, (18, 18))
    w = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    direct = gcn(jnp.asarray(x), adj, w)
    cache = {}
    px = precompute_propagated_features(jnp.asarray(x), adj, cache=cache)
    assert any(k.endswith(":propagated") for k in cache)
    via_precompute = px @ w
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_precompute),
                               rtol=1e-3, atol=1e-4)
    # second call hits the cache
    px2 = precompute_propagated_features(jnp.asarray(x), adj, cache=cache)
    np.testing.assert_allclose(np.asarray(px), np.asarray(px2), rtol=1e-6)


def test_gat_ell_cache_matches_plain(rng):
    n, f, units = 14, 6, 4
    x, ei, _ = random_graph(rng, n, 35, f)
    wq = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    wv = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    z = jnp.zeros(units)
    plain = tnn.gat(jnp.asarray(x), jnp.asarray(ei), wq, z, jax.nn.relu,
                    wk, z, jax.nn.relu, wv, num_heads=2)
    cache = {}
    fast = tnn.gat(jnp.asarray(x), jnp.asarray(ei), wq, z, jax.nn.relu,
                   wk, z, jax.nn.relu, wv, num_heads=2, cache=cache)
    assert any(k.startswith("gat_edges_") for k in cache)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain),
                               rtol=1e-3, atol=1e-4)
    # second call reuses the cache, jit-compatible, grads flow
    @jax.jit
    def loss(w):
        out = tnn.gat(jnp.asarray(x), jnp.asarray(ei), wq, z, jax.nn.relu,
                      wk, z, jax.nn.relu, w, num_heads=2, cache=cache)
        return jnp.sum(out ** 2)
    g = jax.grad(loss)(wv)
    g_plain = jax.grad(lambda w: jnp.sum(tnn.gat(
        jnp.asarray(x), jnp.asarray(ei), wq, z, jax.nn.relu,
        wk, z, jax.nn.relu, w, num_heads=2) ** 2))(wv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_plain),
                               rtol=1e-3, atol=1e-4)


def test_gcn_single_node_no_edges():
    """Degenerate graph: 1 node, 0 edges — self-loop renorm still yields xW."""
    import tf_geometric_tpu as tfg
    from tf_geometric_tpu.sparse import SparseMatrix
    x = jnp.ones((1, 4))
    adj = SparseMatrix(np.zeros((2, 0), np.int32), np.zeros(0, np.float32),
                       (1, 1))
    out = tfg.nn.gcn(x, adj, jnp.ones((4, 2)))
    np.testing.assert_allclose(np.asarray(out), [[4.0, 4.0]])


def test_gcn_cache_override_invalidates_derived_entries(rng):
    """override=True must drop the :ell / :propagated twins or forwards keep
    aggregating with the OLD adjacency."""
    from tf_geometric_tpu.nn.conv.gcn import (compute_cache_key, gcn,
                                              gcn_build_cache_by_adj,
                                              maybe_compile_ell,
                                              precompute_propagated_features)
    from tf_geometric_tpu.sparse import SparseMatrix
    x = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    ei1 = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    ei2 = np.array([[0, 4, 5], [5, 3, 1]], np.int32)
    adj1 = SparseMatrix(ei1, None, (6, 6))
    adj2 = SparseMatrix(ei2, None, (6, 6))

    cache = gcn_build_cache_by_adj(adj1)
    key = compute_cache_key("both", True, True, True, False)
    # materialize both derived entries
    maybe_compile_ell(SparseMatrix(*cache[key]), cache, key)
    precompute_propagated_features(x, adj1, cache=cache)
    assert (key + ":ell") in cache and (key + ":propagated") in cache

    gcn_build_cache_by_adj(adj2, override=True, cache=cache)
    assert cache.get(key + ":ell") is None
    assert cache.get(key + ":propagated") is None
    out_cached = gcn(x, adj2, k, cache=cache)
    out_fresh = gcn(x, adj2, k)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_fresh),
                               rtol=1e-5, atol=1e-6)


def test_gcn_sparse_x_no_kernel_with_cache(rng):
    """kernel=None + SparseMatrix x must not hit the ELL twin (it cannot
    consume a sparse operand)."""
    from tf_geometric_tpu.nn.conv.gcn import gcn, gcn_build_cache_by_adj
    from tf_geometric_tpu.sparse import SparseMatrix
    dense = np.where(rng.random((6, 4)) > 0.5, 1.0, 0.0).astype(np.float32)
    sx = SparseMatrix.from_dense(dense)
    ei = np.array([[0, 1, 2, 4], [1, 2, 3, 5]], np.int32)
    adj = SparseMatrix(ei, None, (6, 6))
    cache = gcn_build_cache_by_adj(adj)
    out_cached = gcn(sx, adj, None, cache=cache)  # sparse@sparse chain
    out_plain = gcn(np.asarray(dense), adj, None)
    np.testing.assert_allclose(np.asarray(out_cached.to_dense()),
                               np.asarray(out_plain), rtol=1e-5, atol=1e-6)


def test_chebynet_cache_key_includes_lambda_mode(rng):
    from tf_geometric_tpu.nn.conv.chebynet import chebynet_norm_edge
    _, ei, ew = __import__("tests.conftest", fromlist=["random_graph"]) \
        .random_graph(rng, 8, 20, 1)
    cache = {}
    _, w_static = chebynet_norm_edge(ei, 8, ew, cache=cache,
                                     use_dynamic_lambda_max=False)
    _, w_dyn = chebynet_norm_edge(ei, 8, ew, cache=cache,
                                  use_dynamic_lambda_max=True)
    assert len(cache) == 2  # separate entries — no silent stale reuse
    assert not np.allclose(np.asarray(w_static), np.asarray(w_dyn))


def test_gat_rejects_partial_layout_args(rng):
    import pytest
    from tf_geometric_tpu.nn.conv.gat import gat
    x = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
    ei = np.array([[0, 1], [1, 2]], np.int32)
    w = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    with pytest.raises(ValueError, match="together"):
        gat(x, ei, w, jnp.zeros(4), None, w, jnp.zeros(4), None, w,
            sorted_edge_index=jnp.asarray(ei))


def test_adj_norm_edge_does_not_cache_tracers(rng):
    from tf_geometric_tpu.utils.graph_utils import adj_norm_edge
    ei = np.array([[0, 1, 2], [1, 2, 0]], np.int32)
    cache = {}

    @jax.jit
    def f(w):
        _, normed = adj_norm_edge(ei, 3, w, cache=cache)
        return normed.sum()

    f(jnp.ones(3))
    assert cache == {}  # nothing stored under trace
    adj_norm_edge(ei, 3, np.ones(3, np.float32), cache=cache)
    assert len(cache) == 1  # eager call caches fine


def test_gcn_edge_dropout_requires_key(rng):
    """Training with edge_drop_rate > 0 and no PRNG key must raise — a
    silent skip would train unregularized (same contract as drop_edge and
    gat_attention_ell)."""
    x, ei, ew = random_graph(rng, 12, 30, 4)
    adj = SparseMatrix(ei, ew, (12, 12))
    w = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="PRNG key"):
        tnn.gcn(jnp.asarray(x), adj, w, edge_drop_rate=0.5, training=True)
    # with a key (or at inference) it runs
    out = tnn.gcn(jnp.asarray(x), adj, w, edge_drop_rate=0.5, training=True,
                  dropout_key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    out = tnn.gcn(jnp.asarray(x), adj, w, edge_drop_rate=0.5, training=False)
    assert np.isfinite(np.asarray(out)).all()
