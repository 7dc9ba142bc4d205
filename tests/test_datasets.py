"""Dataset loaders against synthetic on-disk fixtures (no network)."""
import os
import pickle

import numpy as np
import pytest

from tf_geometric_tpu.datasets import FakePlanetoidDataset, TUDataset, CSRNPZDataset
from tf_geometric_tpu.datasets.planetoid import PlanetoidDataset
from tf_geometric_tpu.datasets.synthetic import (LCCDataset, LimitsOneDataset,
                                                 LimitsTwoDataset, TrianglesDataset)


def test_fake_planetoid_contract():
    graph, (train, valid, test) = FakePlanetoidDataset("cora").load_data()
    assert graph.num_nodes == 2708
    assert graph.num_features == 1433
    assert len(train) == 140 and len(valid) == 500 and len(test) == 1000
    # directed-symmetric edges
    ei = np.asarray(graph.edge_index)
    pairs = set(map(tuple, ei.T.tolist()))
    assert all((c, r) in pairs for r, c in list(pairs)[:50])


def _write_tu_fixture(root, name="FAKETU"):
    d = os.path.join(root, name, "raw", name)
    os.makedirs(d, exist_ok=True)
    # 2 graphs: 3 nodes + 2 nodes
    with open(os.path.join(d, f"{name}_graph_indicator.txt"), "w") as f:
        f.write("1\n1\n1\n2\n2\n")
    with open(os.path.join(d, f"{name}_A.txt"), "w") as f:
        f.write("1, 2\n2, 1\n2, 3\n3, 2\n4, 5\n5, 4\n")
    with open(os.path.join(d, f"{name}_graph_labels.txt"), "w") as f:
        f.write("5\n7\n")
    with open(os.path.join(d, f"{name}_node_labels.txt"), "w") as f:
        f.write("10\n11\n10\n11\n10\n")
    return os.path.join(root, name)


def test_tu_dataset_parsing(tmp_path):
    root = _write_tu_fixture(str(tmp_path))
    ds = TUDataset("FAKETU", dataset_root_path=root)
    graphs = ds.load_data()
    assert len(graphs) == 2
    g0, g1 = graphs
    assert g0["num_nodes"] == 3 and g1["num_nodes"] == 2
    np.testing.assert_array_equal(g0["edge_index"],
                                  [[0, 1, 1, 2], [1, 0, 2, 1]])
    np.testing.assert_array_equal(g1["edge_index"], [[0, 1], [1, 0]])
    np.testing.assert_array_equal(g0["graph_label"], [0])
    np.testing.assert_array_equal(g1["graph_label"], [1])
    np.testing.assert_array_equal(g0["node_labels"], [0, 1, 0])
    np.testing.assert_array_equal(g0["degrees"], [1, 2, 1])
    # second load hits the pickle cache
    graphs2 = ds.load_data()
    assert len(graphs2) == 2


def test_csr_npz_parsing(tmp_path):
    import scipy.sparse as sp
    root = str(tmp_path / "fake-npz")
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    n = 6
    rng = np.random.default_rng(0)
    attr = sp.csr_matrix(rng.random((n, 4)) > 0.5, dtype=np.float32)
    adj = sp.csr_matrix(np.triu(rng.random((n, n)) > 0.6, 1), dtype=np.float32)
    np.savez(os.path.join(raw, "data.npz"),
             attr_data=attr.data, attr_indices=attr.indices,
             attr_indptr=attr.indptr, attr_shape=attr.shape,
             adj_data=adj.data, adj_indices=adj.indices,
             adj_indptr=adj.indptr, adj_shape=adj.shape,
             labels=rng.integers(0, 3, n))
    ds = CSRNPZDataset("fake-npz", download_urls=None, cache_name=None,
                       dataset_root_path=root)
    graph = ds.load_data()
    assert graph.num_nodes == n
    x = np.asarray(graph.x)
    assert set(np.unique(x)).issubset({0.0, 1.0})
    ei = np.asarray(graph.edge_index)
    assert (ei[0] != ei[1]).all()  # self-loops removed


def _write_planetoid_fixture(root, name="cora"):
    """Tiny Kipf-format fixture: 8 nodes, 5 train / 2 allx-extra / 3 test."""
    import scipy.sparse as sp
    d = os.path.join(root, name, "raw")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    F, C = 6, 3
    x = sp.csr_matrix(rng.random((5, F)).astype(np.float32))       # train feats
    allx = sp.csr_matrix(rng.random((5, F)).astype(np.float32))    # train+unlabeled
    tx = sp.csr_matrix(rng.random((3, F)).astype(np.float32))      # test feats
    y = np.eye(C)[rng.integers(0, C, 5)]
    ally = np.eye(C)[rng.integers(0, C, 5)]
    ty = np.eye(C)[rng.integers(0, C, 3)]
    graph = {i: [int(j) for j in rng.integers(0, 8, 2)] for i in range(8)}
    parts = dict(x=x, y=y, tx=tx, ty=ty, allx=allx, ally=ally, graph=graph)
    for k, v in parts.items():
        with open(os.path.join(d, f"ind.{name}.{k}"), "wb") as f:
            pickle.dump(v, f)
    with open(os.path.join(d, f"ind.{name}.test.index"), "w") as f:
        f.write("\n".join(str(i) for i in [7, 5, 6]))
    return os.path.join(root, name)


def test_planetoid_parsing(tmp_path):
    root = _write_planetoid_fixture(str(tmp_path))
    ds = PlanetoidDataset("cora", dataset_root_path=root)
    graph, (train, valid, test) = ds.process()
    assert graph.num_nodes == 8
    assert graph.num_features == 6
    assert list(train) == [0, 1, 2, 3, 4]
    assert list(test) == [5, 6, 7]
    # row-normalized features
    sums = np.asarray(graph.x).sum(axis=1)
    nonzero = sums > 0
    np.testing.assert_allclose(sums[nonzero], 1.0, atol=1e-5)


def test_synthetic_dropgnn_datasets():
    for cls in (LimitsOneDataset, LimitsTwoDataset):
        x, ei, y, node_ids, ports = cls().load_data()
        assert x.shape[0] == 16 and ei.shape[0] == 2
        assert sorted(node_ids.tolist()) == list(range(16))
        assert len(ports) == ei.shape[1]
    graphs = LCCDataset().load_data()
    assert len(graphs) == 6
    assert all(set(g) >= {"x", "edge_index", "y", "ports", "node_ids"}
               for g in graphs)
    x, ei, y, node_ids, ports = TrianglesDataset().load_data()
    assert x.shape[0] == 60
    assert set(np.unique(y)).issubset({0, 1})
