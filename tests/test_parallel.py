"""Multi-device graph parallelism: sharded step ≡ single-device math."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
from tf_geometric_tpu.parallel.partition import (bandwidth_reduction_order,
                                                 partition_edges_by_row)
from tf_geometric_tpu.parallel.sharded import build_mesh, make_graph_parallel_gcn_step
from tf_geometric_tpu.sparse import SparseMatrix


def _setup(num_nodes=96, num_edges=400, f=12, num_classes=5, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(num_nodes, f)).astype(np.float32)
    ei = rng.integers(0, num_nodes, size=(2, num_edges)).astype(np.int32)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    normed = gcn_norm_adj(SparseMatrix(ei, None, (num_nodes, num_nodes)))
    return x, np.asarray(normed.index), np.asarray(normed.value), y


def test_partition_covers_all_edges():
    x, index, value, y = _setup()
    part = partition_edges_by_row(index, value, x.shape[0], 4, pad_multiple=16)
    # every real edge appears exactly once across shards
    total_real = (part.local_row < part.nodes_per_part).sum()
    assert total_real == index.shape[1]
    np.testing.assert_allclose(part.value.sum(), value.sum(), rtol=1e-5)


def test_sharded_step_matches_single_device():
    num_classes, hidden = 5, 8
    x, index, value, y = _setup()
    num_nodes, f = x.shape

    part = partition_edges_by_row(index, value, num_nodes, 4, pad_multiple=16)
    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    mesh = build_mesh({"data": 2, "graph": 4})
    step, optimizer = make_graph_parallel_gcn_step(
        mesh, hidden=hidden, num_classes=num_classes)

    rng = np.random.default_rng(0)
    params = [
        (jnp.asarray(rng.normal(scale=0.1, size=(f, hidden)), jnp.float32),
         jnp.zeros(hidden)),
        (jnp.asarray(rng.normal(scale=0.1, size=(hidden, num_classes)), jnp.float32),
         jnp.zeros(num_classes)),
    ]
    opt_state = optimizer.init(params)
    rows, cols, vals = (part.local_row.reshape(-1), part.global_col.reshape(-1),
                        part.value.reshape(-1))
    with mesh:
        new_params, _, loss_sharded = step(
            params, opt_state, jnp.asarray(x_p), jnp.asarray(rows),
            jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(y_p), jnp.asarray(mask))

    # single-device oracle: same math with one dense-equivalent SpMM
    adj = SparseMatrix(index, value, (num_nodes, num_nodes))

    def forward(p, xx):
        h = adj.matmul(xx @ p[0][0]) + p[0][1]
        h = jax.nn.relu(h)
        return adj.matmul(h @ p[1][0]) + p[1][1]

    def loss_fn(p):
        logits = forward(p, jnp.asarray(x))
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, jnp.asarray(y))
        return ce.mean()

    loss_single, grads_single = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-4, atol=1e-5)

    updates, _ = optimizer.update(grads_single, optimizer.init(params), params)
    params_single = optax.apply_updates(params, updates)
    for (w_s, b_s), (w_o, b_o) in zip(new_params, params_single):
        np.testing.assert_allclose(np.asarray(w_s), np.asarray(w_o),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_o),
                                   rtol=1e-3, atol=1e-4)


def test_bandwidth_reduction_order_is_permutation():
    _, index, _, _ = _setup()
    perm = bandwidth_reduction_order(index, 96)
    assert sorted(perm.tolist()) == list(range(96))


def test_halo_exchange_matches_all_gather():
    from tf_geometric_tpu.parallel.halo import build_halo_spec

    num_classes, hidden = 5, 8
    x, index, value, y = _setup(num_nodes=96, num_edges=400)
    num_nodes, f = x.shape

    part = partition_edges_by_row(index, value, num_nodes, 4, pad_multiple=16)
    spec = build_halo_spec(part, capacity_multiple=16)
    assert spec.halo_fraction > 0  # tiny random graphs may exceed 1.0

    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    mesh = build_mesh({"graph": 4})
    rng = np.random.default_rng(0)
    params = [
        (jnp.asarray(rng.normal(scale=0.1, size=(f, hidden)), jnp.float32),
         jnp.zeros(hidden)),
        (jnp.asarray(rng.normal(scale=0.1, size=(hidden, num_classes)), jnp.float32),
         jnp.zeros(num_classes)),
    ]

    step_ag, opt_ag = make_graph_parallel_gcn_step(
        mesh, hidden=hidden, num_classes=num_classes)
    opt_state = opt_ag.init(params)
    with mesh:
        p_ag, _, loss_ag = step_ag(
            params, opt_state, jnp.asarray(x_p),
            jnp.asarray(part.local_row.reshape(-1)),
            jnp.asarray(part.global_col.reshape(-1)),
            jnp.asarray(part.value.reshape(-1)),
            jnp.asarray(y_p), jnp.asarray(mask))
    loss_ag = float(loss_ag)

    step_halo, opt_halo = make_graph_parallel_gcn_step(
        mesh, hidden=hidden, num_classes=num_classes, halo_spec=spec)
    opt_state = opt_halo.init(params)
    with mesh:
        p_halo, _, loss_halo = step_halo(
            params, opt_state, jnp.asarray(x_p), jnp.asarray(y_p),
            jnp.asarray(mask))
    loss_halo = float(loss_halo)

    np.testing.assert_allclose(loss_halo, loss_ag, rtol=1e-5, atol=1e-6)
    for (w_h, b_h), (w_a, b_a) in zip(p_halo, p_ag):
        np.testing.assert_allclose(np.asarray(w_h), np.asarray(w_a),
                                   rtol=1e-4, atol=1e-5)


def test_partition_order_blocks_and_halo():
    """partition_order: valid permutation, exact block alignment, and a
    strictly smaller halo plan than community_order on an SBM."""
    from tf_geometric_tpu.parallel.halo import build_halo_spec
    from tf_geometric_tpu.parallel.partition import (community_order,
                                                     partition_order)
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_citation_graph

    N, Pn = 2000, 4
    g = synthetic_citation_graph(num_nodes=N, num_features=8, num_classes=12,
                                 avg_degree=6, seed=2)
    ei = np.asarray(g.edge_index, np.int64)
    perm = partition_order(ei, N, Pn)
    assert sorted(perm.tolist()) == list(range(N))
    # exact block alignment: part p owns precisely its capacity of new ids
    from tf_geometric_tpu.parallel.partition import nodes_per_part
    npp = nodes_per_part(N, Pn)
    caps = [max(0, min(npp, N - p * npp)) for p in range(Pn)]
    fills = np.bincount(np.minimum(perm // npp, Pn - 1), minlength=Pn)
    np.testing.assert_array_equal(fills, caps)

    def halo_frac(p):
        part = partition_edges_by_row(p[ei], None, N, Pn)
        return build_halo_spec(part, capacity_multiple=16).halo_fraction

    assert halo_frac(perm) < halo_frac(community_order(ei, N))


def test_halo_split_covers_all_edges():
    """Every real edge lands in exactly one of the local/remote shards."""
    from tf_geometric_tpu.parallel.halo import build_halo_spec
    x, index, value, y = _setup()
    part = partition_edges_by_row(index, value, x.shape[0], 4, pad_multiple=16)
    spec = build_halo_spec(part, capacity_multiple=16)
    n_loc = (spec.loc_row < spec.nodes_per_part).sum()
    n_rem = (spec.rem_row < spec.nodes_per_part).sum()
    assert n_loc + n_rem == index.shape[1]
    np.testing.assert_allclose(spec.loc_val.sum() + spec.rem_val.sum(),
                               value.sum(), rtol=1e-5)


def test_community_order_improves_locality():
    from tf_geometric_tpu.parallel.partition import community_order
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_citation_graph

    g = synthetic_citation_graph(num_nodes=2000, num_features=8, num_classes=10,
                                 avg_degree=6, seed=1)
    ei = np.asarray(g.edge_index, np.int64)
    perm = community_order(ei, 2000)
    assert sorted(perm.tolist()) == list(range(2000))
    # locality: same-block fraction beats the unpermuted baseline
    P = 4
    npp = -(-2000 // P)
    base = ((ei[0] // npp) == (ei[1] // npp)).mean()
    pe = perm[ei]
    ordered = ((pe[0] // npp) == (pe[1] // npp)).mean()
    assert ordered > base + 0.1


def test_sharded_gat_matches_single_device():
    """Edge-partitioned multi-head GAT step ≡ single-device oracle (same
    score/softmax/aggregation formulas, reference nn/conv/gat.py:49-89)."""
    from tf_geometric_tpu.parallel.halo import build_halo_spec
    from tf_geometric_tpu.parallel.sharded import make_graph_parallel_gat_step
    from tf_geometric_tpu.utils.graph_utils import add_self_loop_edge

    H, d, num_classes = 2, 4, 5
    num_nodes, f = 96, 12
    rng = np.random.default_rng(7)
    x = rng.normal(size=(num_nodes, f)).astype(np.float32)
    ei = rng.integers(0, num_nodes, size=(2, 300)).astype(np.int32)
    ei = np.unique(ei, axis=1)  # dense oracle can't express duplicate edges
    ei = ei[:, ei[0] != ei[1]]
    ei, _ = add_self_loop_edge(ei, num_nodes)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)

    part = partition_edges_by_row(np.asarray(ei), None, num_nodes, 4,
                                  pad_multiple=16)
    spec = build_halo_spec(part, capacity_multiple=16)
    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    params = (
        (jnp.asarray(rng.normal(scale=0.2, size=(f, H * d)), jnp.float32),
         jnp.asarray(rng.normal(scale=0.1, size=(H * d,)), jnp.float32),
         jnp.asarray(rng.normal(scale=0.2, size=(f, H * d)), jnp.float32),
         jnp.asarray(rng.normal(scale=0.1, size=(H * d,)), jnp.float32),
         jnp.asarray(rng.normal(scale=0.2, size=(f, H * d)), jnp.float32),
         jnp.zeros(H * d)),
        (jnp.asarray(rng.normal(scale=0.2, size=(H * d, num_classes)),
                     jnp.float32),
         jnp.zeros(num_classes)),
    )
    mesh = build_mesh({"graph": 4})
    step, opt = make_graph_parallel_gat_step(mesh, spec, num_heads=H, units=d,
                                             num_classes=num_classes)
    opt_state = opt.init(params)
    with mesh:
        new_params, _, loss_sharded = step(
            params, opt_state, jnp.asarray(x_p), jnp.asarray(y_p),
            jnp.asarray(mask))
    loss_sharded = float(loss_sharded)

    # single-device oracle: dense per-head attention (reference formulas —
    # relu'd biased Q/K projections, nn/conv/gat.py:49-66)
    def oracle_loss(p):
        (wq, bq, wk, bk, wv, bias), (w_out, b_out) = p
        xx = jnp.asarray(x)
        Q = jax.nn.relu(xx @ wq + bq).reshape(num_nodes, H, d)
        K = jax.nn.relu(xx @ wk + bk).reshape(num_nodes, H, d)
        V = (xx @ wv).reshape(num_nodes, H, d)
        s = jnp.full((H, num_nodes, num_nodes), -jnp.inf)
        r, c = jnp.asarray(ei[0]), jnp.asarray(ei[1])
        scores = jnp.einsum("ehd,ehd->eh", Q[r], K[c]) / (d ** 0.5)
        s = s.at[:, r, c].set(scores.T)
        a = jax.nn.softmax(s, axis=-1)
        a = jnp.where(jnp.isfinite(s).any(-1, keepdims=True), a, 0.0)
        h = jnp.einsum("hnm,mhd->nhd", a, V).reshape(num_nodes, H * d) + bias
        logits = jax.nn.elu(h) @ w_out + b_out
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y))
        return ce.mean()

    loss_single, grads_single = jax.value_and_grad(oracle_loss)(params)
    np.testing.assert_allclose(loss_sharded, float(loss_single),
                               rtol=1e-4, atol=1e-5)
    updates, _ = opt.update(grads_single, opt.init(params), params)
    params_single = optax.apply_updates(params, updates)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(params_single)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-4)


def test_sharded_mincut_step_matches_single_device():
    """Edge-partitioned hierarchical pooling (BASELINE config 5): the
    shard_map MinCutPool step must reproduce a single-device dense oracle —
    loss, aux losses, and one full Adam update."""
    import optax
    from tf_geometric_tpu.parallel.sharded import make_graph_parallel_mincut_step
    from tf_geometric_tpu.utils.graph_utils import adj_norm_edge

    num_classes, hidden, C = 5, 8, 6
    rng = np.random.default_rng(7)
    num_nodes, f = 90, 12
    x = rng.normal(size=(num_nodes, f)).astype(np.float32)
    ei = rng.integers(0, num_nodes, size=(2, 360)).astype(np.int32)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    # MinCut semantics: sym-normalized adjacency WITHOUT self-loops drives
    # both the encoder GNNs and the losses (reference min_cut_pool.py:163)
    index, value = adj_norm_edge(ei, num_nodes, None, add_self_loop=False)
    index, value = np.asarray(index), np.asarray(value)

    part = partition_edges_by_row(index, value, num_nodes, 4, pad_multiple=16)
    n_pad = 4 * part.nodes_per_part
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0
    valid = np.zeros(n_pad, np.float32); valid[:num_nodes] = 1.0

    params = (
        (jnp.asarray(rng.normal(scale=0.1, size=(f, hidden)), jnp.float32),
         jnp.zeros(hidden)),
        (jnp.asarray(rng.normal(scale=0.1, size=(f, C)), jnp.float32),
         jnp.zeros(C)),
        (jnp.asarray(rng.normal(scale=0.1, size=(hidden, hidden)), jnp.float32),
         jnp.zeros(hidden)),
        (jnp.asarray(rng.normal(scale=0.1, size=(2 * hidden, num_classes)),
                     jnp.float32),
         jnp.zeros(num_classes)),
    )

    mesh = build_mesh({"data": 2, "graph": 4})
    step, opt = make_graph_parallel_mincut_step(
        mesh, num_clusters=C, hidden=hidden, num_classes=num_classes)
    opt_state = opt.init(params)
    with mesh:
        new_params, _, (loss_sh, ce_sh, cut_sh, orth_sh) = step(
            params, opt_state, jnp.asarray(x_p),
            jnp.asarray(part.local_row.reshape(-1)),
            jnp.asarray(part.global_col.reshape(-1)),
            jnp.asarray(part.value.reshape(-1)),
            jnp.asarray(y_p), jnp.asarray(mask), jnp.asarray(valid))

    # single-device dense oracle over the REAL (unpadded) graph
    adense = np.zeros((num_nodes, num_nodes), np.float32)
    np.add.at(adense, (index[0], index[1]), value)  # duplicates accumulate
    A = jnp.asarray(adense)

    def oracle_loss(p):
        (w0, b0), (wa, ba), (wc, bc), (wo, bo) = p
        xx = jnp.asarray(x)
        h1 = jax.nn.relu(A @ (xx @ w0) + b0)
        S = jax.nn.softmax(A @ (xx @ wa) + ba)
        pooled_x = S.T @ h1
        pooled_adj = S.T @ A @ S
        intra = jnp.trace(pooled_adj)
        deg = A.sum(axis=1)
        all_sum = jnp.sum(deg * jnp.sum(S * S, axis=-1))
        cut = -intra / (all_sum + 1e-8)
        sts = S.T @ S
        sts_n = sts / (jnp.sqrt(jnp.sum(sts * sts)) + 1e-8)
        dev = sts_n - jnp.eye(C) / jnp.sqrt(jnp.float32(C))
        orth = jnp.sqrt(jnp.sum(dev * dev))
        pooled_adj = pooled_adj * (1.0 - jnp.eye(C))
        coarse = jax.nn.relu(pooled_adj @ (pooled_x @ wc) + bc)
        h2 = S @ coarse
        logits = jnp.concatenate([h1, h2], axis=-1) @ wo + bo
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y)).mean()
        return ce + cut + orth, (ce, cut, orth)

    (loss_single, (ce_s, cut_s, orth_s)), grads_single = jax.value_and_grad(
        oracle_loss, has_aux=True)(params)
    np.testing.assert_allclose(float(loss_sh), float(loss_single),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(ce_sh), float(ce_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(cut_sh), float(cut_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(orth_sh), float(orth_s), rtol=1e-4, atol=1e-5)
    updates, _ = opt.update(grads_single, opt.init(params), params)
    params_single = optax.apply_updates(params, updates)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(params_single)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-4)


def test_sharded_diffpool_variant_runs_and_ignores_losses():
    from tf_geometric_tpu.parallel.sharded import make_graph_parallel_mincut_step

    num_classes, hidden, C = 3, 4, 4
    rng = np.random.default_rng(11)
    num_nodes, f = 40, 6
    x = rng.normal(size=(num_nodes, f)).astype(np.float32)
    ei = rng.integers(0, num_nodes, size=(2, 120)).astype(np.int32)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    part = partition_edges_by_row(ei, None, num_nodes, 4, pad_multiple=16)
    n_pad = 4 * part.nodes_per_part
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    params = (
        (jnp.asarray(rng.normal(scale=0.1, size=(f, hidden)), jnp.float32),
         jnp.zeros(hidden)),
        (jnp.asarray(rng.normal(scale=0.1, size=(f, C)), jnp.float32),
         jnp.zeros(C)),
        (jnp.asarray(rng.normal(scale=0.1, size=(hidden, hidden)), jnp.float32),
         jnp.zeros(hidden)),
        (jnp.asarray(rng.normal(scale=0.1, size=(2 * hidden, num_classes)),
                     jnp.float32),
         jnp.zeros(num_classes)),
    )
    mesh = build_mesh({"graph": 4})
    step, opt = make_graph_parallel_mincut_step(
        mesh, num_clusters=C, hidden=hidden, num_classes=num_classes,
        variant="diff")
    opt_state = opt.init(params)
    with mesh:
        _, _, (loss, ce, cut, orth) = step(
            params, opt_state, jnp.asarray(x_p),
            jnp.asarray(part.local_row.reshape(-1)),
            jnp.asarray(part.global_col.reshape(-1)),
            jnp.asarray(part.value.reshape(-1)),
            jnp.asarray(y_p), jnp.asarray(mask), jnp.asarray(mask))
    assert float(cut) == 0.0 and float(orth) == 0.0
    assert np.isfinite(float(loss)) and float(loss) == pytest.approx(float(ce))


def test_batch_2d_step_matches_single_device():
    """TRUE 2-D parallelism (VERDICT r2 #8): the data axis splits a batch of
    graphs, the graph axis edge-partitions each sub-batch; loss must equal
    the single-device computation of the same batch."""
    from tf_geometric_tpu.parallel.sharded import (build_mesh,
                                                   make_batch_2d_step,
                                                   pack_batch_2d)
    rng = np.random.default_rng(7)
    D, Pg, G = 2, 4, 4
    num_classes, hidden, f = 5, 8, 6
    graphs = []
    for g in range(D * G):
        n = int(rng.integers(5, 12))
        e = int(rng.integers(8, 25))
        xg = rng.normal(size=(n, f)).astype(np.float32)
        eig = rng.integers(0, n, size=(2, e)).astype(np.int32)
        graphs.append((xg, eig, int(rng.integers(0, num_classes))))

    nodes_per_cell, edges_per_cell = 16, 64
    x, rows, cols, vals, ngi, y, gmask = pack_batch_2d(
        graphs, D, Pg, G, nodes_per_cell, edges_per_cell)

    mesh = build_mesh({"data": D, "graph": Pg})
    step, optimizer = make_batch_2d_step(mesh, hidden=hidden,
                                         num_classes=num_classes,
                                         graphs_per_data_shard=G)
    prng = np.random.default_rng(0)
    params = (jnp.asarray(prng.normal(scale=0.1, size=(f, hidden)), jnp.float32),
              jnp.zeros(hidden),
              jnp.asarray(prng.normal(scale=0.1, size=(hidden, num_classes)),
                          jnp.float32),
              jnp.zeros(num_classes))
    with mesh:
        _, _, loss = step(params, optimizer.init(params), jnp.asarray(x),
                          jnp.asarray(rows), jnp.asarray(cols),
                          jnp.asarray(vals), jnp.asarray(ngi),
                          jnp.asarray(y), jnp.asarray(gmask))

    # single-device oracle over the original (unpacked) graphs
    w0, b0, wd, bd = (np.asarray(a) for a in params)
    ces = []
    for (xg, eig, yg) in graphs:
        n = xg.shape[0]
        deg = np.zeros(n) + 1e-6
        agg = np.zeros((n, hidden), np.float32)
        hw = xg @ w0
        np.add.at(deg, eig[0], 1.0)
        np.add.at(agg, eig[0], hw[eig[1]])
        h = np.maximum(agg / deg[:, None] + b0, 0.0)
        logits = h.mean(axis=0) @ wd + bd
        logits = logits - logits.max()
        ces.append(-np.log(np.exp(logits[yg]) / np.exp(logits).sum()))
    np.testing.assert_allclose(float(loss), np.mean(ces), rtol=1e-4, atol=1e-5)


def test_halo_ell_matches_coo():
    """The packed (ELL) halo plan must reproduce the COO halo step exactly —
    same loss, same updated params (the sharded runtime runs the production
    scatter-free kernel of ops/ell.py; VERDICT r3 item 2)."""
    from tf_geometric_tpu.parallel.halo import HaloSpecEll, build_halo_spec

    num_classes, hidden = 5, 8
    x, index, value, y = _setup(num_nodes=96, num_edges=400)
    num_nodes, f = x.shape
    part = partition_edges_by_row(index, value, num_nodes, 4, pad_multiple=16)
    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    mesh = build_mesh({"graph": 4})
    rng = np.random.default_rng(0)
    params = [
        (jnp.asarray(rng.normal(scale=0.1, size=(f, hidden)), jnp.float32),
         jnp.zeros(hidden)),
        (jnp.asarray(rng.normal(scale=0.1, size=(hidden, num_classes)),
                     jnp.float32),
         jnp.zeros(num_classes)),
    ]
    results = {}
    for layout in ("coo", "ell"):
        spec = build_halo_spec(part, capacity_multiple=16, layout=layout)
        if layout == "ell":
            assert isinstance(spec, HaloSpecEll)
            # every edge lands in exactly one packed slot across blocks
            real_slots = int((spec.local.slots_val != 0).sum()
                             + (spec.local.tail_val != 0).sum()
                             + (spec.local.diag_val != 0).sum()
                             + (spec.remote.slots_val != 0).sum()
                             + (spec.remote.tail_val != 0).sum())
            assert real_slots == index.shape[1]
        step, opt = make_graph_parallel_gcn_step(
            mesh, hidden=hidden, num_classes=num_classes, halo_spec=spec)
        with mesh:
            p, _, loss = step(params, opt.init(params), jnp.asarray(x_p),
                              jnp.asarray(y_p), jnp.asarray(mask))
        results[layout] = (float(loss), jax.tree.leaves(p))
    np.testing.assert_allclose(results["ell"][0], results["coo"][0],
                               rtol=1e-5, atol=1e-6)
    for got, want in zip(results["ell"][1], results["coo"][1]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_gat_fused_matches_segment_path():
    """The fused-attention sharded GAT (rectangular ELL over the local‖halo
    source space) must match the segment-path sharded GAT step — which is
    itself oracle-tested above (reference nn/conv/gat.py:49-89)."""
    from tf_geometric_tpu.parallel.halo import (build_gat_halo_spec,
                                                build_halo_spec)
    from tf_geometric_tpu.parallel.sharded import (
        make_graph_parallel_gat_fused_step, make_graph_parallel_gat_step)
    from tf_geometric_tpu.utils.graph_utils import add_self_loop_edge

    H, d, num_classes = 2, 4, 5
    num_nodes, f = 96, 12
    rng = np.random.default_rng(11)
    x = rng.normal(size=(num_nodes, f)).astype(np.float32)
    ei = rng.integers(0, num_nodes, size=(2, 300)).astype(np.int32)
    ei, _ = add_self_loop_edge(ei, num_nodes)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)

    part = partition_edges_by_row(np.asarray(ei), None, num_nodes, 4,
                                  pad_multiple=16)
    spec = build_halo_spec(part, capacity_multiple=16)
    gspec = build_gat_halo_spec(part, capacity_multiple=16)
    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    layer = (jnp.asarray(rng.normal(scale=0.2, size=(f, H * d)), jnp.float32),
             jnp.asarray(rng.normal(scale=0.1, size=(H * d,)), jnp.float32),
             jnp.asarray(rng.normal(scale=0.2, size=(f, H * d)), jnp.float32),
             jnp.asarray(rng.normal(scale=0.1, size=(H * d,)), jnp.float32),
             jnp.asarray(rng.normal(scale=0.2, size=(f, H * d)), jnp.float32),
             jnp.zeros(H * d))
    head = (jnp.asarray(rng.normal(scale=0.2, size=(H * d, num_classes)),
                        jnp.float32),
            jnp.zeros(num_classes))
    mesh = build_mesh({"graph": 4})

    step_seg, opt_seg = make_graph_parallel_gat_step(
        mesh, spec, num_heads=H, units=d, num_classes=num_classes)
    with mesh:
        p_seg, _, loss_seg = step_seg((layer, head),
                                      opt_seg.init((layer, head)),
                                      jnp.asarray(x_p), jnp.asarray(y_p),
                                      jnp.asarray(mask))

    fused_params = ([layer], head)
    step_f, opt_f = make_graph_parallel_gat_fused_step(
        mesh, gspec, layer_dims=((H, d),), num_classes=num_classes)
    with mesh:
        p_f, _, loss_f = step_f(fused_params, opt_f.init(fused_params),
                                jax.random.PRNGKey(0), jnp.asarray(x_p),
                                jnp.asarray(y_p), jnp.asarray(mask))
    np.testing.assert_allclose(float(loss_f), float(loss_seg),
                               rtol=1e-5, atol=1e-6)
    for got, want in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_seg)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_gat_fused_two_layer_dropout_trains():
    """Reference-shaped sharded GAT (two attention layers, 8 heads, feature
    + attention dropout — demo/demo_gat.py:14-23, VERDICT r3 item 7): the
    fused step must run and reduce the loss over a few steps."""
    from tf_geometric_tpu.parallel.halo import build_gat_halo_spec
    from tf_geometric_tpu.parallel.sharded import \
        make_graph_parallel_gat_fused_step
    from tf_geometric_tpu.utils.graph_utils import add_self_loop_edge

    num_classes = 5
    num_nodes, f = 128, 16
    H0, d0, H1, d1 = 8, 8, 1, 32
    rng = np.random.default_rng(5)
    x = rng.normal(size=(num_nodes, f)).astype(np.float32)
    ei = rng.integers(0, num_nodes, size=(2, 500)).astype(np.int32)
    ei, _ = add_self_loop_edge(ei, num_nodes)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    part = partition_edges_by_row(np.asarray(ei), None, num_nodes, 4,
                                  pad_multiple=16)
    gspec = build_gat_halo_spec(part, capacity_multiple=16)
    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    def glorot(shape):
        return jnp.asarray(rng.normal(scale=0.2, size=shape), jnp.float32)

    dims = ((H0, d0), (H1, d1))
    layers, fin = [], f
    for (h, dd) in dims:
        hd = h * dd
        layers.append((glorot((fin, hd)), jnp.zeros(hd), glorot((fin, hd)),
                       jnp.zeros(hd), glorot((fin, hd)), jnp.zeros(hd)))
        fin = hd
    params = (layers, (glorot((fin, num_classes)), jnp.zeros(num_classes)))

    mesh = build_mesh({"graph": 4})
    step, opt = make_graph_parallel_gat_fused_step(
        mesh, gspec, layer_dims=dims, num_classes=num_classes,
        edge_drop_rate=0.6, feat_drop_rate=0.6, learning_rate=5e-3)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)
    losses = []
    with mesh:
        for i in range(8):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub,
                                           jnp.asarray(x_p), jnp.asarray(y_p),
                                           jnp.asarray(mask))
            losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert min(losses[-3:]) < losses[0]
