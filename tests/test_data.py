"""Graph containers, padding, samplers, graph utils, metrics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_geometric_tpu.data.graph import (BatchGraph, Graph, HeteroBatchGraph,
                                         HeteroGraph)
from tf_geometric_tpu.data.padding import PaddingSpec, bucket_size, pad_batch_graph, pad_graph
from tf_geometric_tpu.utils import graph_utils as gu
from tf_geometric_tpu.utils import metrics
from tests.conftest import random_graph


def make_graph(rng, n=10, e=25, f=4):
    x, ei, ew = random_graph(rng, n, e, f)
    y = rng.integers(0, 3, n).astype(np.int32)
    return Graph(x, ei, y, ew)


def test_graph_basics(rng):
    g = make_graph(rng)
    assert g.num_nodes == 10 and g.num_edges == 25 and g.num_features == 4
    adj = g.adj()
    assert adj.shape == (10, 10)
    g.convert_data_to_tensor()
    assert isinstance(g.x, jax.Array)
    g.convert_data_to_numpy()
    assert isinstance(g.x, np.ndarray)


def test_graph_lazy_x(rng):
    x = rng.normal(size=(6, 3)).astype(np.float32)
    g = Graph(lambda: x, np.array([[0, 1], [1, 0]]))
    np.testing.assert_array_equal(np.asarray(g.x), x)


def test_graph_to_directed(rng):
    ei = np.array([[0, 1, 2, 2], [1, 0, 3, 3]])
    ew = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    g = Graph(rng.normal(size=(4, 2)).astype(np.float32), ei, None, ew)
    g.to_directed(merge_mode="sum")
    pairs = {(int(r), int(c)): None for r, c in g.edge_index.T}
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (2, 3) in pairs and (3, 2) in pairs
    # duplicate (2,3) merged by sum → weight 7
    w = dict(zip(map(tuple, g.edge_index.T.tolist()), g.edge_weight.tolist()))
    assert abs(w[(2, 3)] - 7.0) < 1e-6


def test_graph_pytree_roundtrip(rng):
    g = make_graph(rng).convert_data_to_tensor()
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(g2, Graph)
    np.testing.assert_array_equal(np.asarray(g2.edge_index),
                                  np.asarray(g.edge_index))


def test_subgraph_sampling(rng):
    g = make_graph(rng, n=12, e=40)
    sub = g.sample_new_graph_by_node_index([0, 3, 5, 7])
    assert sub.num_nodes == 4
    assert sub.x.shape == (4, 4)
    if sub.num_edges:
        assert int(np.max(sub.edge_index)) < 4


def test_batch_graph_roundtrip(rng):
    graphs = [make_graph(rng, n=5 + i, e=10 + i) for i in range(3)]
    batch = BatchGraph.from_graphs(graphs)
    assert batch.num_graphs == 3
    assert batch.num_nodes == sum(g.num_nodes for g in graphs)
    assert batch.num_edges == sum(g.num_edges for g in graphs)
    back = batch.to_graphs()
    for orig, rec in zip(graphs, back):
        np.testing.assert_allclose(np.asarray(orig.x), np.asarray(rec.x))
        np.testing.assert_array_equal(np.asarray(orig.edge_index),
                                      np.asarray(rec.edge_index))


def test_padding(rng):
    graphs = [make_graph(rng, n=5, e=10), make_graph(rng, n=7, e=12)]
    batch = BatchGraph.from_graphs(graphs)
    spec = PaddingSpec(num_nodes=32, num_edges=64, num_graphs=4)
    padded = pad_batch_graph(batch, spec)
    assert padded.x.shape == (32, 4)
    assert padded.edge_index.shape == (2, 64)
    # padded edges out of range, padded nodes map to sentinel graph id
    assert (np.asarray(padded.edge_index)[:, batch.num_edges:] == 32).all()
    assert (np.asarray(padded.node_graph_index)[batch.num_nodes:] == 4).all()
    assert bucket_size(100) == 128
    assert bucket_size(129) % 128 == 0 and bucket_size(129) >= 129


def test_hetero_graph_and_batch(rng):
    def hg(seed):
        r = np.random.default_rng(seed)
        return HeteroGraph(
            x_dict={"a": r.normal(size=(4, 3)).astype(np.float32),
                    "b": r.normal(size=(6, 2)).astype(np.float32)},
            edge_index_dict={("a", "r", "b"):
                             # repo convention: ei[0] = src-typed ("a", 4
                             # nodes), ei[1] = dst-typed ("b", 6 nodes)
                             r.integers(0, 24, size=(2, 8)).astype(np.int64) %
                             np.array([[4], [6]])},
            y_dict={"a": r.integers(0, 2, 4)},
        )
    g = hg(0)
    assert set(g.node_types) == {"a", "b"}
    g.add_reversed_edges()
    assert ("b", "r.r", "a") in g.edge_index_dict

    batch = HeteroBatchGraph.from_graphs([hg(0), hg(1)])
    assert batch.num_graphs == 2
    assert batch.x_dict["a"].shape == (8, 3)
    assert batch.x_dict["b"].shape == (12, 2)
    ei = batch.edge_index_dict[("a", "r", "b")]
    assert ei.shape[1] == 16
    # offsets applied per endpoint TYPE: src ids stay < 8, dst ids < 12,
    # and the second graph's edges land in the second graph's id ranges
    assert ei[0].max() < 8 and ei[1].max() < 12
    assert (ei[0, 8:] >= 4).all() and (ei[1, 8:] >= 6).all()
    # class-preserving non-inplace reversal keeps batch bookkeeping
    rev = batch.add_reversed_edges(inplace=False)
    assert isinstance(rev, HeteroBatchGraph)
    assert rev.num_graphs == 2
    assert ("b", "r.r", "a") in rev.edge_index_dict
    assert ("b", "r.r", "a") not in batch.edge_index_dict


def test_random_neighbor_sampler_padding(rng):
    _, ei, ew = random_graph(rng, 10, 40, 1)
    sampler = gu.RandomNeighborSampler(ei, ew, rng=0)
    sei, sew = sampler.sample(k=4, padding=True)
    counts = np.bincount(sei[0], minlength=10)
    assert set(counts[counts > 0].tolist()) == {4}
    # restricted + reindexed
    sei, sew = sampler.sample(k=3, sampled_node_index=[1, 4, 7])
    if sei.size:
        assert sei.max() < 3


def test_negative_sampling_excludes_edges(rng):
    ei = np.array([[0, 1, 2], [1, 2, 0]])
    neg = gu.negative_sampling(10, 6, edge_index=ei, rng=0)
    existing = set(map(tuple, ei.T.tolist())) | set(map(tuple, ei[::-1].T.tolist()))
    for r, c in neg.T:
        assert (int(r), int(c)) not in existing
        assert r != c


def test_edge_train_test_split(rng):
    _, ei, _ = random_graph(rng, 15, 60, 1)
    tr, te, _, _ = gu.edge_train_test_split(ei, test_size=0.3, random_state=0)
    assert tr.shape[0] == 2 and te.shape[0] == 2
    assert tr.shape[1] + te.shape[1] > 0


def test_laplacian_modes(rng):
    _, ei, ew = random_graph(rng, 8, 20, 1)
    for norm_type in (None, "sym", "rw"):
        li, lw = gu.get_laplacian(jnp.asarray(ei), 8, jnp.asarray(ew), norm_type)
        assert li.shape[1] == 20 + 8
        assert np.isfinite(np.asarray(lw)).all()


def test_metrics():
    assert float(metrics.accuracy(np.array([1, 2, 3]), np.array([1, 2, 0]))) \
        == pytest.approx(2 / 3)
    assert metrics.micro_f1(np.array([[1, 0], [1, 1]]),
                            np.array([[1, 0], [0, 1]])) == pytest.approx(0.8)
    auc = metrics.binary_auc(np.array([0.9, 0.8, 0.3, 0.1]),
                             np.array([1, 1, 0, 0]))
    assert auc == pytest.approx(1.0)
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(0)
    scores = rng.random(60)
    labels = rng.integers(0, 2, 60)
    assert metrics.binary_auc(scores, labels) == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-9)
    acc = metrics.Accumulator()
    acc.update(1.0, 2)
    acc.update(0.0, 2)
    assert acc.result() == pytest.approx(0.5)


def test_convert_edge_utils(rng):
    ei = np.array([[3, 1, 1], [1, 3, 2]])
    directed, _ = gu.convert_edge_to_directed(ei)
    pairs = set(map(tuple, directed.T.tolist()))
    assert (1, 3) in pairs and (3, 1) in pairs and (1, 2) in pairs and (2, 1) in pairs
    # dedupe kept one (1,3) pair
    assert directed.shape[1] == 4

    dense = np.array([[0, 2.0], [0, 0]])
    dei, dew = gu.convert_dense_adj_to_edge(dense)
    np.testing.assert_array_equal(dei, [[0], [1]])
    np.testing.assert_allclose(dew, [2.0])

    mask = gu.compute_edge_mask_by_node_index(jnp.asarray(ei), jnp.asarray([1, 2]),
                                              num_nodes=4)
    np.testing.assert_array_equal(np.asarray(mask), [False, False, True])


def test_sparse_x_subgraph(rng):
    from tf_geometric_tpu.sparse import SparseMatrix
    x_dense = (rng.random((8, 5)) > 0.6).astype(np.float32)
    x_sparse = SparseMatrix.from_dense(x_dense)
    ei = rng.integers(0, 8, size=(2, 20)).astype(np.int32)
    g = Graph(x_sparse, ei)
    sub = g.sample_new_graph_by_node_index([1, 3, 6])
    from tf_geometric_tpu.sparse import SparseMatrix as SM
    assert isinstance(sub.x, SM)
    np.testing.assert_allclose(np.asarray(sub.x.to_dense()),
                               x_dense[[1, 3, 6]], rtol=1e-6)


def test_sparse_features_through_gcn(rng):
    from tf_geometric_tpu.sparse import SparseMatrix, eye
    from tf_geometric_tpu import nn as tnn
    n = 10
    ei = rng.integers(0, n, size=(2, 30)).astype(np.int32)
    adj = SparseMatrix(ei, None, (n, n))
    w = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    out_sparse = tnn.gcn(eye(n), adj, w)
    out_dense = tnn.gcn(jnp.eye(n), adj, w)
    np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(out_dense),
                               rtol=1e-4, atol=1e-4)


def test_batch_graph_conversions_preserve_class(rng):
    x, ei, ew = random_graph(rng, 6, 12, 3)
    g1 = Graph(x, ei, rng.integers(0, 2, 1), ew)
    g2 = Graph(x, ei, rng.integers(0, 2, 1), ew)
    b = BatchGraph.from_graphs([g1, g2])
    t = b.convert_data_to_tensor(inplace=False)
    assert isinstance(t, BatchGraph) and t.num_graphs == 2
    n = t.convert_data_to_numpy(inplace=False)
    assert isinstance(n, BatchGraph) and n.num_graphs == 2


def test_from_graphs_rejects_mixed_labels(rng):
    import pytest
    x, ei, ew = random_graph(rng, 6, 12, 3)
    labeled = Graph(x, ei, np.int32(1), ew)
    unlabeled = Graph(x, ei, None, ew)
    with pytest.raises(ValueError, match="mixed labeling"):
        BatchGraph.from_graphs([labeled, unlabeled])
    with pytest.raises(ValueError, match="mixed labeling"):
        BatchGraph.from_graphs([unlabeled, labeled])
    b = BatchGraph.from_graphs([unlabeled, unlabeled])
    assert b.y is None


def test_from_graphs_edgeless_graph(rng):
    x, ei, ew = random_graph(rng, 6, 12, 3)
    b = BatchGraph.from_graphs([Graph(x, ei, None, ew), Graph(x)])
    assert b.num_edges == 12
    assert b.num_nodes == 12
    gs = b.to_graphs()
    assert gs[1].num_edges == 0


def test_to_graphs_sparse_x_roundtrip(rng):
    from tf_geometric_tpu.sparse import SparseMatrix
    x, ei, ew = random_graph(rng, 5, 10, 4)
    sx = SparseMatrix.from_dense(np.where(np.abs(x) > 0.5, x, 0.0))
    g = Graph(sx, ei, None, ew)
    b = BatchGraph.from_graphs([g, g])
    gs = b.to_graphs()
    assert len(gs) == 2
    for sub in gs:
        np.testing.assert_allclose(np.asarray(sub.x.to_dense()),
                                   np.asarray(sx.to_dense()), rtol=1e-6)
        np.testing.assert_array_equal(sub.edge_index, ei)


def test_to_graphs_interleaved_node_graph_index():
    # legal via the public constructor: nodes of the two graphs interleaved
    x = np.arange(8, dtype=np.float32).reshape(4, 2)
    ngi = np.array([0, 1, 0, 1], np.int32)
    # graph 0 owns global nodes {0, 2} (local 0, 1); edge 0->2 is local 0->1
    ei = np.array([[0], [2]], np.int32)
    egi = np.array([0], np.int32)
    b = BatchGraph(x=x, edge_index=ei, node_graph_index=ngi,
                   edge_graph_index=egi, edge_weight=np.ones(1, np.float32))
    g0, g1 = b.to_graphs()
    np.testing.assert_array_equal(g0.edge_index, [[0], [1]])
    np.testing.assert_array_equal(g0.x, x[[0, 2]])
    assert g1.num_edges == 0


def test_negative_sampling_with_start_node_raises_when_saturated():
    import pytest
    from tf_geometric_tpu.utils import graph_utils as gu2
    ei = np.array([[0], [1]])
    with pytest.raises(ValueError, match="non-neighbor"):
        gu2.negative_sampling_with_start_node([0], 2, edge_index=ei, rng=0)


def test_convert_edge_to_nx_graph_properties_and_directed():
    from tf_geometric_tpu.utils import graph_utils as gu2
    ei = np.array([[0, 1], [1, 2]])
    w = np.array([0.5, 2.0], np.float32)
    g = gu2.convert_edge_to_nx_graph(ei, edge_properties=[w],
                                     convert_to_directed=True)
    assert g.is_directed()
    assert g.edges[0, 1]["p_0"] == np.float32(0.5)
    assert g.edges[1, 0]["p_0"] == np.float32(0.5)  # to_directed mirrors


def test_convert_x_to_3d_pad_false_caps_k(rng):
    from tf_geometric_tpu.utils import graph_utils as gu2
    x = rng.normal(size=(4, 2)).astype(np.float32)
    src = np.array([0, 0, 1, 1])
    out = gu2.convert_x_to_3d(x, src, k=5, pad=False)
    assert out.shape == (2, 2, 2)
    out_padded = gu2.convert_x_to_3d(x, src, k=5, pad=True)
    assert out_padded.shape == (2, 5, 2)
