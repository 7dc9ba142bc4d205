"""Direct unit tests for utils/graph_utils — the reference's largest module
(graph_utils.py, 973 LoC). Semantics oracles follow SURVEY.md §2.5."""
import numpy as np
import jax.numpy as jnp
import pytest

from tf_geometric_tpu.utils import graph_utils as gu


def test_convert_edge_to_directed_mirrors_and_merges():
    # duplicate undirected edge (0,1)+(1,0) with weights to merge by max
    ei = np.array([[0, 1, 2, 2], [1, 0, 2, 3]], np.int32)
    w = np.array([1.0, 3.0, 5.0, 2.0], np.float32)
    out_ei, (out_w,) = gu.convert_edge_to_directed(ei, [w], ["max"])
    out_ei, out_w = np.asarray(out_ei), np.asarray(out_w)
    pairs = {(int(r), int(c)): float(v)
             for r, c, v in zip(out_ei[0], out_ei[1], out_w)}
    assert pairs[(0, 1)] == 3.0 and pairs[(1, 0)] == 3.0  # merged + mirrored
    assert pairs[(2, 2)] == 5.0                            # self-loop NOT mirrored
    assert pairs[(2, 3)] == 2.0 and pairs[(3, 2)] == 2.0
    assert len(pairs) == 5


def test_remove_and_add_self_loop():
    ei = np.array([[0, 1, 1], [0, 2, 1]], np.int32)
    w = np.array([1.0, 2.0, 3.0], np.float32)
    out_ei, out_w = gu.remove_self_loop_edge(ei, w)
    assert np.asarray(out_ei).shape[1] == 1
    assert float(np.asarray(out_w)[0]) == 2.0
    ei2, w2 = gu.add_self_loop_edge(out_ei, 3, out_w, fill_weight=0.5)
    ei2, w2 = np.asarray(ei2), np.asarray(w2)
    assert ei2.shape[1] == 4
    assert (w2[-3:] == 0.5).all()
    assert (ei2[0][-3:] == ei2[1][-3:]).all()


def test_get_laplacian_sym_oracle():
    ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]], np.int32)
    lap_ei, lap_w = gu.get_laplacian(ei, 3, normalization_type="sym")
    dense = np.zeros((3, 3), np.float32)
    lap_ei, lap_w = np.asarray(lap_ei), np.asarray(lap_w)
    for r, c, v in zip(lap_ei[0], lap_ei[1], lap_w):
        dense[r, c] += v
    # oracle: the reference's get_laplacian does NOT negate the adjacency —
    # "sym" returns D^-1/2 A D^-1/2 + I (reference graph_utils.py:571-582,
    # pinned by tests/test_reference_parity.py::graph_utils)
    a = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], np.float32)
    d = np.diag(1.0 / np.sqrt(a.sum(1)))
    expected = np.eye(3) + d @ a @ d
    np.testing.assert_allclose(dense, expected, rtol=1e-5, atol=1e-6)


def test_laplacian_max_eigenvalue():
    ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]], np.int32)
    lam = gu.LaplacianMaxEigenvalue(ei, 3)(normalization_type="sym")
    # sym-normalized Laplacian of a bipartite path graph has lambda_max = 2
    assert abs(float(lam) - 2.0) < 1e-4


def test_negative_sampling_avoids_positives():
    rng = np.random.default_rng(0)
    n = 20
    ei = np.stack([rng.integers(0, n, 60), rng.integers(0, n, 60)]).astype(np.int32)
    neg = np.asarray(gu.negative_sampling(40, n, edge_index=ei))
    assert neg.shape == (2, 40)
    pos = set(zip(ei[0].tolist(), ei[1].tolist()))
    for r, c in zip(neg[0], neg[1]):
        assert (int(r), int(c)) not in pos
        assert int(r) != int(c)


def test_negative_sampling_with_start_node():
    n = 15
    ei = np.array([[0, 0, 1], [1, 2, 2]], np.int32)
    starts = np.array([0, 0, 1, 2], np.int32)
    neg = np.asarray(gu.negative_sampling_with_start_node(starts, n, edge_index=ei))
    assert neg.shape == (2, 4)
    np.testing.assert_array_equal(neg[0], starts)
    pos = set(zip(ei[0].tolist(), ei[1].tolist()))
    for r, c in zip(neg[0], neg[1]):
        assert (int(r), int(c)) not in pos


def test_edge_train_test_split_undirected_roundtrip():
    rng = np.random.default_rng(1)
    n = 30
    row, col = np.triu_indices(n, k=1)
    keep = rng.random(len(row)) < 0.3
    ei = np.stack([row[keep], col[keep]]).astype(np.int32)
    ei_full = np.concatenate([ei, ei[::-1]], axis=1)
    (train_ei, test_ei, train_w, test_w) = gu.edge_train_test_split(
        ei_full, test_size=0.25)
    train_ei, test_ei = np.asarray(train_ei), np.asarray(test_ei)
    num_unique = ei.shape[1]
    assert train_ei.shape[1] + test_ei.shape[1] == num_unique
    assert test_ei.shape[1] == int(round(num_unique * 0.25))
    # no overlap between splits (as undirected pairs)
    as_pairs = lambda e: {tuple(sorted(p)) for p in zip(e[0].tolist(), e[1].tolist())}
    assert not (as_pairs(train_ei) & as_pairs(test_ei))


def test_compute_edge_mask_by_node_index():
    ei = np.array([[0, 1, 2, 3], [1, 2, 3, 0]], np.int32)
    mask = np.asarray(gu.compute_edge_mask_by_node_index(ei, np.array([0, 1, 2])))
    np.testing.assert_array_equal(mask, [True, True, False, False])


def test_reindex_sampled_edge_index():
    sampled_nodes = np.array([5, 9, 2], np.int32)
    ei = np.array([[5, 9, 2], [9, 2, 5]], np.int32)
    out = np.asarray(gu.reindex_sampled_edge_index(ei, sampled_nodes))
    np.testing.assert_array_equal(out, [[0, 1, 2], [1, 2, 0]])


def test_convert_x_to_3d_pads():
    x = np.arange(12, dtype=np.float32).reshape(6, 2)
    src = np.array([0, 0, 0, 2, 2, 5], np.int32)
    out = np.asarray(gu.convert_x_to_3d(x, src, k=3))
    # reference semantics (graph_utils.py:226-227): leading dim = max(src)+1
    assert out.shape == (6, 3, 2)
    # source 2 has two targets -> third slot zero-padded; source 1 all-zero
    assert (out[2, 2] == 0).all()
    assert (out[1] == 0).all()
    np.testing.assert_array_equal(out[0], x[:3])


def test_random_neighbor_sampler_padding_fixed_k():
    rng = np.random.default_rng(3)
    n = 25
    ei = np.stack([rng.integers(0, n, 200), rng.integers(0, n, 200)]).astype(np.int32)
    sampler = gu.RandomNeighborSampler(ei, rng=np.random.default_rng(0))
    s_ei, s_w = sampler.sample(k=4, padding=True)
    s_ei = np.asarray(s_ei)
    assert s_ei.shape[1] == n * 4  # exactly k per source (with replacement)
    # every sampled edge exists in the original adjacency (or is a self pad
    # for isolated sources)
    adj = set(zip(ei[0].tolist(), ei[1].tolist()))
    sources_with_neighbors = set(ei[0].tolist())
    for r, c in zip(s_ei[0], s_ei[1]):
        if int(r) in sources_with_neighbors:
            assert (int(r), int(c)) in adj


def test_uniform_neighbor_sampler_probability():
    rng = np.random.default_rng(4)
    n = 50
    e = 4000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    sampler = gu.UniformNeighborSampler(ei, rng=np.random.default_rng(1))
    s_ei, _ = sampler.sample(p=0.3)
    frac = np.asarray(s_ei).shape[1] / e
    assert 0.25 < frac < 0.35


def test_extract_unique_edge_undirected():
    ei = np.array([[0, 1, 2, 0], [1, 0, 0, 2]], np.int32)
    out_ei, _ = gu.extract_unique_edge(ei)
    out = np.asarray(out_ei)
    pairs = {tuple(sorted(p)) for p in zip(out[0].tolist(), out[1].tolist())}
    assert pairs == {(0, 1), (0, 2)}
    assert out.shape[1] == 2


def test_to_scipy_and_nx_roundtrip():
    ei = np.array([[0, 1], [1, 2]], np.int32)
    w = np.array([2.0, 3.0], np.float32)
    sp = gu.to_scipy_sparse_matrix(ei, w, 3)
    assert sp.shape == (3, 3) and sp[0, 1] == 2.0 and sp[1, 2] == 3.0
    g = gu.convert_edge_to_nx_graph(ei)
    assert g.number_of_edges() == 2
