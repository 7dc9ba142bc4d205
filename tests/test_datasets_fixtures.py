"""Fixture-parse tests for the dataset loaders whose formats come from
external downloads (no egress here): each test writes a tiny synthetic file
in the exact upstream format to tmp_path, runs ``process()``/``load_data()``,
and asserts the Graph contract.

Formats mirrored from the reference loaders:
reddit npz (datasets/reddit.py:25-66), PPI npy/json (ppi.py:15-66),
OGB preprocessed npz (ogb.py:10-48), BlogCatalog .mat (blog_catalog.py),
fraud .mat (abnormal.py:22-55), HGB text (hgb.py:10-225),
NARS ACM .mat (nars_academic.py), ModelNet OFF meshes (model_net.py:12-135).
"""
import json
import os

import numpy as np
import pytest
import scipy.sparse as sp


# ---------------------------------------------------------------- reddit

def _write_reddit_fixture(root):
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(0)
    n, f = 10, 4
    node_types = np.array([1, 1, 1, 1, 2, 2, 3, 3, 3, 0], np.int64)
    np.savez(os.path.join(raw, "reddit_data.npz"),
             feature=rng.normal(size=(n, f)).astype(np.float32),
             label=rng.integers(0, 5, n).astype(np.int64),
             node_types=node_types)
    dense = (rng.random((n, n)) > 0.7).astype(np.float32)
    np.fill_diagonal(dense, 0)
    sp.save_npz(os.path.join(raw, "reddit_graph.npz"), sp.csr_matrix(dense))
    return dense


def test_reddit_transductive_parsing(tmp_path):
    from tf_geometric_tpu.datasets.reddit import TransductiveRedditDataset
    dense = _write_reddit_fixture(str(tmp_path))
    ds = TransductiveRedditDataset(dataset_root_path=str(tmp_path))
    graph, (train, valid, test) = ds.load_data()
    assert graph.num_nodes == 10 and graph.num_features == 4
    assert list(train) == [0, 1, 2, 3]
    assert list(valid) == [4, 5]
    assert list(test) == [6, 7, 8]
    assert graph.num_edges == int(dense.sum())
    # second load hits the pickle cache
    graph2, _ = ds.load_data()
    assert graph2.num_nodes == 10


def test_reddit_inductive_parsing(tmp_path):
    from tf_geometric_tpu.datasets.reddit import InductiveRedditDataset
    _write_reddit_fixture(str(tmp_path))
    ds = InductiveRedditDataset(dataset_root_path=str(tmp_path))
    g_train, g_valid, g_test = ds.load_data()
    assert g_train.num_nodes == 4
    assert g_valid.num_nodes == 2
    assert g_test.num_nodes == 3
    # induced edges stay inside the subgraph's relabeled id space
    for g in (g_train, g_valid, g_test):
        ei = np.asarray(g.edge_index)
        if ei.size:
            assert ei.max() < g.num_nodes


# ------------------------------------------------------------------- ppi

def test_ppi_parsing(tmp_path):
    import networkx as nx
    from tf_geometric_tpu.datasets.ppi import PPIDataset
    raw = os.path.join(str(tmp_path), "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(1)
    f, num_labels = 3, 2
    for split in ("train", "valid", "test"):
        # two graphs: nodes {0,1,2} (gid 1) and {3,4} (gid 2)
        graph_ids = np.array([1, 1, 1, 2, 2], np.int64)
        np.save(os.path.join(raw, f"{split}_graph_id.npy"), graph_ids)
        np.save(os.path.join(raw, f"{split}_feats.npy"),
                rng.normal(size=(5, f)).astype(np.float32))
        np.save(os.path.join(raw, f"{split}_labels.npy"),
                rng.integers(0, 2, size=(5, num_labels)).astype(np.int64))
        g = nx.DiGraph()
        g.add_nodes_from(range(5))
        g.add_edges_from([(0, 1), (1, 2), (3, 4)])
        with open(os.path.join(raw, f"{split}_graph.json"), "w",
                  encoding="utf-8") as fh:
            json.dump(nx.json_graph.node_link_data(g), fh)
    out = PPIDataset(dataset_root_path=str(tmp_path)).load_data()
    assert len(out) == 3
    for graphs in out:
        assert len(graphs) == 2
        g0, g1 = graphs
        assert g0.num_nodes == 3 and g0.num_features == f
        assert g1.num_nodes == 2
        assert np.asarray(g0.y).shape == (3, num_labels)
        # edges are relabeled to the subgraph and symmetrized
        ei1 = np.asarray(g1.edge_index)
        assert set(map(tuple, ei1.T.tolist())) == {(0, 1), (1, 0)}


# ------------------------------------------------------------------- ogb

def test_ogb_npz_parsing(tmp_path):
    from tf_geometric_tpu.datasets.ogb import OGBNodePropPredDataset
    raw = os.path.join(str(tmp_path), "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(2)
    n, f = 6, 4
    np.savez(os.path.join(raw, "graph.npz"),
             x=rng.normal(size=(n, f)).astype(np.float32),
             edge_index=np.array([[0, 1, 2, 3], [1, 2, 3, 4]], np.int64),
             y=rng.integers(0, 3, size=(n, 1)).astype(np.int64),
             train_index=np.arange(0, 3), valid_index=np.arange(3, 4),
             test_index=np.arange(4, 6))
    ds = OGBNodePropPredDataset("ogbn-arxiv", dataset_root_path=str(tmp_path))
    graph, (train, valid, test) = ds.load_data()
    assert graph.num_nodes == n and graph.num_features == f
    assert np.asarray(graph.y).ndim == 1  # flattened label column
    pairs = set(map(tuple, np.asarray(graph.edge_index).T.tolist()))
    assert all((c, r) in pairs for r, c in pairs)  # symmetrized
    assert len(train) == 3 and len(valid) == 1 and len(test) == 2


def test_ogb_missing_raises(tmp_path):
    from tf_geometric_tpu.datasets.ogb import OGBNodePropPredDataset
    ds = OGBNodePropPredDataset("ogbn-arxiv",
                                dataset_root_path=str(tmp_path / "none"))
    with pytest.raises(RuntimeError, match="graph.npz"):
        ds.process()


# ---------------------------------------------------------- blog_catalog

def test_blog_catalog_parsing(tmp_path):
    from scipy.io import savemat
    from tf_geometric_tpu.datasets.blog_catalog import MultiLabelBlogCatalogDataset
    raw = os.path.join(str(tmp_path), "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(3)
    n, num_groups = 8, 3
    network = sp.csr_matrix((rng.random((n, n)) > 0.6).astype(np.float64))
    group = sp.csr_matrix((rng.random((n, num_groups)) > 0.5).astype(np.float64))
    savemat(os.path.join(raw, "multi_label_blog_catalog.mat"),
            {"network": network, "group": group})
    ds = MultiLabelBlogCatalogDataset(dataset_root_path=str(tmp_path))
    edge_index, y = ds.load_data()
    assert edge_index.shape == (2, network.nnz)
    assert y.shape == (n, num_groups)
    assert set(np.unique(y)).issubset({0.0, 1.0})


# -------------------------------------------------------------- abnormal

def test_abnormal_mat_parsing(tmp_path):
    from scipy.io import savemat
    from tf_geometric_tpu.datasets.abnormal import FDYelpChiDataset
    raw = os.path.join(str(tmp_path), "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(4)
    n, f = 7, 5
    mats = {
        "features": sp.csr_matrix(rng.random((n, f)).astype(np.float64)),
        "label": rng.integers(0, 2, n).astype(np.float64),
        "net_rur": sp.csr_matrix((rng.random((n, n)) > 0.5).astype(np.float64)),
        "net_rtr": sp.csr_matrix((rng.random((n, n)) > 0.5).astype(np.float64)),
        "homo": sp.csr_matrix((rng.random((n, n)) > 0.5).astype(np.float64)),
    }
    savemat(os.path.join(raw, "fd_yelp_chi.mat"), mats)
    x, edge_index_dict, y = FDYelpChiDataset(
        dataset_root_path=str(tmp_path)).load_data()
    assert x.shape == (n, f)
    assert y.shape == (n,) and y.dtype == np.int64
    assert set(edge_index_dict) == {"net_rur", "net_rtr", "homo"}
    for key, mat in mats.items():
        if key in edge_index_dict:
            assert edge_index_dict[key].shape == (2, mat.nnz)


# ------------------------------------------------------------------- hgb

def _write_hgb_acm_fixture(root):
    """ACM-style JSON schema: paper(2 feats) + author, 2 relations."""
    raw = os.path.join(root, "raw", "acm")
    os.makedirs(raw, exist_ok=True)
    info = {
        "node.dat": {"node type": {"0": "paper", "1": "author"}},
        "link.dat": {"link type": {
            "0": {"start": "0", "end": "1", "meaning": "paper-author"},
            "1": {"start": "1", "end": "0", "meaning": "author-paper"},
        }},
        "label.dat": {"node type": {"0": ["theory", "systems", "ml"]}},
    }
    with open(os.path.join(raw, "info.dat"), "w", encoding="utf-8") as f:
        json.dump(info, f)
    # global ids: papers 0-2 (with 2-dim features), authors 3-4 (featureless)
    with open(os.path.join(raw, "node.dat"), "w", encoding="utf-8") as f:
        f.write("0\tp0\t0\t0.5,1.5\n1\tp1\t0\t2.0,0.0\n2\tp2\t0\t1.0,1.0\n"
                "3\ta0\t1\n4\ta1\t1\n")
    with open(os.path.join(raw, "link.dat"), "w", encoding="utf-8") as f:
        f.write("0\t3\t0\t1.0\n1\t4\t0\t1.0\n2\t3\t0\t1.0\n"   # paper→author
                "3\t0\t1\t2.0\n4\t1\t1\t3.0\n")                 # author→paper
    with open(os.path.join(raw, "label.dat"), "w", encoding="utf-8") as f:
        f.write("0\tp0\t0\t1\n1\tp1\t0\t2\n")
    with open(os.path.join(raw, "label.dat.test"), "w", encoding="utf-8") as f:
        f.write("2\tp2\t0\t0\n")


def test_hgb_acm_parsing(tmp_path):
    from tf_geometric_tpu.datasets.hgb import HGBACMDataset
    _write_hgb_acm_fixture(str(tmp_path))
    hetero, train_mask, test_mask = HGBACMDataset(
        dataset_root_path=str(tmp_path)).load_data()
    assert hetero.x_dict["paper"].shape == (3, 2)
    assert hetero.x_dict["author"].shape == (2, 1)
    pa = hetero.edge_index_dict[("paper", "to", "author")]
    np.testing.assert_array_equal(pa, [[0, 1, 2], [0, 1, 0]])
    ap = hetero.edge_index_dict[("author", "to", "paper")]
    np.testing.assert_array_equal(ap, [[0, 1], [0, 1]])
    # non-unit link.dat weights survive into the HeteroGraph (unit weights
    # are dropped by the loader and re-filled as ones by the container)
    np.testing.assert_array_equal(
        hetero.edge_weight_dict[("author", "to", "paper")], [2.0, 3.0])
    np.testing.assert_array_equal(
        hetero.edge_weight_dict[("paper", "to", "author")], [1.0, 1.0, 1.0])
    np.testing.assert_array_equal(hetero.y_dict["paper"], [1, 2, 0])
    np.testing.assert_array_equal(train_mask["paper"], [True, True, False])
    np.testing.assert_array_equal(test_mask["paper"], [False, False, True])


def test_hgb_freebase_schema_parsing(tmp_path):
    from tf_geometric_tpu.datasets.hgb import HGBFreebaseDataset
    raw = os.path.join(str(tmp_path), "raw", "freebase")
    os.makedirs(raw, exist_ok=True)
    with open(os.path.join(raw, "info.dat"), "w", encoding="utf-8") as f:
        f.write("Freebase info\n\nTYPE\tMEANING\n0\t\tBOOK\n1\t\tFILM\n\n"
                "LINK\tSTART\tEND\tMEANING\n0\t0\t1\tbook-film\n\n")
    with open(os.path.join(raw, "node.dat"), "w", encoding="utf-8") as f:
        f.write("0\tb0\t0\n1\tb1\t0\n2\tf0\t1\n")
    with open(os.path.join(raw, "link.dat"), "w", encoding="utf-8") as f:
        f.write("0\t2\t0\t1.0\n1\t2\t0\t1.0\n")
    with open(os.path.join(raw, "label.dat"), "w", encoding="utf-8") as f:
        f.write("0\tb0\t0\t1\n")
    with open(os.path.join(raw, "label.dat.test"), "w", encoding="utf-8") as f:
        f.write("1\tb1\t0\t0\n")
    hetero, train_mask, test_mask = HGBFreebaseDataset(
        dataset_root_path=str(tmp_path)).load_data()
    assert set(hetero.x_dict) == {"book", "film"}
    bf = hetero.edge_index_dict[("book", "film", "film")]
    np.testing.assert_array_equal(bf, [[0, 1], [0, 0]])
    np.testing.assert_array_equal(train_mask["book"], [True, False, False][:2]
                                  if len(train_mask["book"]) == 2
                                  else [True, False])
    assert test_mask["book"][1]


# ------------------------------------------------------------------ nars

def test_nars_acm_parsing(tmp_path):
    from scipy.io import savemat
    from tf_geometric_tpu.datasets.nars_academic import NARSACMDataset
    raw = os.path.join(str(tmp_path), "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(5)
    num_papers, num_authors, num_fields, num_terms, num_confs = 6, 3, 2, 5, 14
    # papers 0..3 belong to selected confs {0, 1, 9, 13}; 4-5 unselected
    pvsc = np.zeros((num_papers, num_confs))
    for p, c in zip(range(4), (0, 1, 9, 13)):
        pvsc[p, c] = 1.0
    pvsc[4, 2] = 1.0
    savemat(os.path.join(raw, "acm.mat"), {
        "PvsL": sp.csr_matrix((rng.random((num_papers, num_fields)) > 0.4)
                              .astype(np.float64)),
        "PvsA": sp.csr_matrix((rng.random((num_papers, num_authors)) > 0.4)
                              .astype(np.float64)),
        "PvsT": sp.csr_matrix(rng.random((num_papers, num_terms))
                              .astype(np.float64)),
        "PvsC": sp.csr_matrix(pvsc),
    })
    hetero, target_type, (train, valid, test) = NARSACMDataset(
        dataset_root_path=str(tmp_path)).load_data()
    assert target_type == "paper"
    assert hetero.x_dict["paper"].shape == (4, num_terms)  # selected papers only
    # KDD(conf 0)→0, SIGMOD/VLDB(1)→1, conf 9→2, conf 13→1
    np.testing.assert_array_equal(hetero.y_dict["paper"], [0, 1, 2, 1])
    assert set(train) | set(valid) | set(test) == set(range(4))
    for etype in (("paper", "pa", "author"), ("paper", "pf", "field")):
        ei = hetero.edge_index_dict[etype]
        assert ei.shape[0] == 2 and ei[0].max() < 4


# ------------------------------------------------------------- model_net

_OFF_TETRA = ("OFF\n4 2 0\n"
              "0.0 0.0 0.0\n1.0 0.0 0.0\n0.0 1.0 0.0\n0.0 0.0 1.0\n"
              "3 0 1 2\n3 1 2 3\n")
# counts-on-the-OFF-line variant + a quad face (split into two triangles)
_OFF_QUAD = ("OFF4 1 0\n"
             "0.0 0.0 0.0\n1.0 0.0 0.0\n1.0 1.0 0.0\n0.0 1.0 0.0\n"
             "4 0 1 2 3\n")


def test_model_net_off_parsing(tmp_path):
    from tf_geometric_tpu.datasets.model_net import ModelNetDataset
    root = str(tmp_path)
    base = os.path.join(root, "raw", "FakeModelNet")
    for label in ("chair", "desk"):
        for split, names in (("train", ("a.off", "b.off")), ("test", ("c.off",))):
            d = os.path.join(base, label, split)
            os.makedirs(d, exist_ok=True)
            for i, name in enumerate(names):
                body = _OFF_QUAD if (label == "desk" and split == "train"
                                     and i == 0) else _OFF_TETRA
                with open(os.path.join(d, name), "w", encoding="utf-8") as f:
                    f.write(body)
    ds = ModelNetDataset("FakeModelNet", dataset_root_path=root,
                         num_processes=2)
    train_graphs, test_graphs, label_names = ds.load_data()
    assert label_names == ["chair", "desk"]
    assert len(train_graphs) == 4 and len(test_graphs) == 2
    for g in train_graphs + test_graphs:
        assert g.num_nodes == 4
        ei = np.asarray(g.edge_index)
        pairs = set(map(tuple, ei.T.tolist()))
        assert all((c, r) in pairs for r, c in pairs)  # symmetrized
        assert all(r != c for r, c in pairs)           # deduped, no self-loops
    labels = sorted(int(np.asarray(g.y)[0]) for g in test_graphs)
    assert labels == [0, 1]
