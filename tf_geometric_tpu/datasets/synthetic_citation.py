"""Synthetic citation-style graphs for offline tests and benchmarks.

The real Planetoid/OGB loaders require downloads; in no-egress environments
(SURVEY §6 — accuracy parity is checked elsewhere) these generators produce
graphs with the same *statistical shape*: power-law-ish degrees, class-
correlated features (an SBM with noisy one-hot-ish features), and standard
index splits, so training dynamics and throughput are representative.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..data.graph import Graph
from ..utils.graph_utils import convert_edge_to_directed, remove_self_loop_edge

__all__ = ["synthetic_citation_graph", "synthetic_ogbn_arxiv_like",
           "FakePlanetoidDataset", "HardCitationDataset",
           "synthetic_graph_classification_hard", "flip_graph_labels"]


def synthetic_citation_graph(
    num_nodes: int = 2708,
    num_features: int = 1433,
    num_classes: int = 7,
    avg_degree: float = 4.0,
    homophily: float = 0.83,
    feature_signal: float = 4.0,
    class_overlap: float = 0.0,
    seed: int = 0,
) -> Graph:
    """Cora-shaped SBM: homophilous edges + class-informative sparse features.

    ``class_overlap`` is the probability that a node's signal words are drawn
    from a *different* (random) class's word block instead of its own — the
    difficulty knob for the hard-mode protocol (at 0 the classes' word blocks
    are disjoint and features alone nearly separate the classes).
    """
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)

    num_edges = int(num_nodes * avg_degree / 2)
    src = rng.integers(0, num_nodes, size=num_edges * 2)
    # draw destinations: same-class with prob `homophily`
    same_class = rng.random(num_edges * 2) < homophily
    dst = rng.integers(0, num_nodes, size=num_edges * 2)
    # rejection-free same-class assignment via per-class node pools
    class_pools = [np.nonzero(y == c)[0] for c in range(num_classes)]
    for c in range(num_classes):
        pool = class_pools[c]
        if len(pool) == 0:
            continue
        mask = same_class & (y[src] == c)
        dst[mask] = pool[rng.integers(0, len(pool), size=mask.sum())]
    edge_index = np.stack([src, dst], axis=0)[:, :num_edges * 2]
    edge_index, _ = remove_self_loop_edge(edge_index)
    edge_index, _ = convert_edge_to_directed(edge_index)

    # sparse bag-of-words-ish features: class-specific word blocks + noise
    words_per_class = max(1, num_features // num_classes)
    x = np.zeros((num_nodes, num_features), np.float32)
    n_active = max(5, num_features // 60)
    for i in range(num_nodes):
        if class_overlap > 0.0 and rng.random() < class_overlap:
            word_class = int(rng.integers(0, num_classes))
        else:
            word_class = int(y[i])
        base = word_class * words_per_class
        signal_words = base + rng.integers(0, words_per_class, size=n_active)
        noise_words = rng.integers(0, num_features, size=n_active)
        x[i, signal_words % num_features] += feature_signal
        x[i, noise_words] += 1.0
    row_sum = x.sum(axis=-1, keepdims=True)
    x /= np.maximum(row_sum, 1e-8)

    return Graph(x=x, edge_index=edge_index, y=y)


def synthetic_ogbn_arxiv_like(
    num_nodes: int = 169_343,
    num_edges: int = 1_166_243,
    num_features: int = 128,
    num_classes: int = 40,
    seed: int = 0,
) -> Graph:
    """ogbn-arxiv-scale graph for throughput benchmarks (dense float features,
    directed citation edges with skewed in-degree)."""
    rng = np.random.default_rng(seed)
    # skewed destinations (preferential-attachment-ish via squared uniform)
    dst = (rng.random(num_edges) ** 2 * num_nodes).astype(np.int64)
    src = rng.integers(0, num_nodes, size=num_edges)
    edge_index = np.stack([dst, src], axis=0).astype(np.int32)
    x = rng.normal(size=(num_nodes, num_features)).astype(np.float32)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    return Graph(x=x, edge_index=edge_index, y=y)


class FakePlanetoidDataset:
    """Drop-in replacement for PlanetoidDataset when the real files are
    unavailable: same return contract ``(graph, (train, valid, test))``."""

    _SHAPES = {
        "cora": dict(num_nodes=2708, num_features=1433, num_classes=7),
        "citeseer": dict(num_nodes=3327, num_features=3703, num_classes=6),
        "pubmed": dict(num_nodes=19717, num_features=500, num_classes=3),
    }

    def __init__(self, dataset_name: str = "cora", seed: int = 0):
        self.dataset_name = dataset_name
        self.seed = seed

    def load_data(self):
        shape = self._SHAPES[self.dataset_name]
        graph = synthetic_citation_graph(seed=self.seed, **shape)
        num_classes = shape["num_classes"]
        n_train = num_classes * 20
        train_index = list(range(n_train))
        valid_index = list(range(n_train, n_train + 500))
        test_index = list(range(shape["num_nodes"] - 1000, shape["num_nodes"]))
        return graph, (train_index, valid_index, test_index)


class HardCitationDataset:
    """HARD-MODE synthetic protocol: same shapes as FakePlanetoidDataset, but
    tuned so the *executed reference* GCN lands in the ~0.75–0.85 band its
    published real-data numbers live in (cora 81.5 / citeseer 70.3 /
    pubmed 79.0 — reference benchmarks/node_classification/
    bench_node_cls_early_stop_gcn.py:121-160). At that operating point a
    multi-point modeling bug visibly moves the number, unlike the saturated
    easy protocol (0.99+) where any implementation passes.

    Difficulty levers (vs the easy protocol):
      * ``class_overlap``: a fraction of nodes draw their signal words from a
        random class's word block — feature-space label noise that graph
        propagation can partially rescue;
      * lower ``homophily`` and ``feature_signal``;
      * 10 (not 20) training labels per class, drawn per-class (balanced);
      * ``label_noise``: a fraction of *training* labels flipped to a random
        other class — flips are spread evenly over classes
        (``round(noise·per_class)`` per class) because concentrated flips on
        a small per-class budget make single seeds collapse to chance
        (bimodal accuracy, measured during tuning). Val/test labels stay
        clean, so reported accuracy still measures generalization.

    The same (graph, splits, noisy-y) arrays feed both the executed reference
    and the repo models in benchmarks/node_classification/head_to_head_hard.py.
    """

    # cora/citeseer/pubmed shapes plus an ogbn-arxiv-shaped entry
    # (169k nodes, 40 classes, ~7 edges/node — reference datasets/ogb.py:
    # 10-48 loads the real thing; this is its no-egress hard-mode stand-in
    # for the arxiv-scale accuracy head-to-head)
    _SHAPES = {**FakePlanetoidDataset._SHAPES,
               "arxiv": dict(num_nodes=169_343, num_features=128,
                             num_classes=40, avg_degree=7.0)}

    # difficulty per shape, tuned against the executed reference GCN
    # (benchmarks/node_classification/tune_hard.py sweep)
    _DIFFICULTY = {
        "cora": dict(homophily=0.62, feature_signal=1.2, class_overlap=0.45),
        "citeseer": dict(homophily=0.55, feature_signal=1.1, class_overlap=0.50),
        "pubmed": dict(homophily=0.60, feature_signal=1.1, class_overlap=0.48),
        "arxiv": dict(homophily=0.52, feature_signal=1.1, class_overlap=0.50),
    }
    # arxiv-scale statistics: more test nodes tighten the per-seed SEM
    # (0.025 chance over 40 classes needs a bigger sample than 1000)
    _VAL_SIZE = {"arxiv": 2000}
    _TEST_SIZE = {"arxiv": 10_000}
    # per-(model, shape) overrides: the GCN-tuned settings collapse some
    # model families to chance under their OWN reference protocols (GAT's
    # 0.6-0.7 dropout, APPNP/SSGC's double 0.5 dropout + k=10 smoothing
    # can't learn the weak-signal graphs at all — both sides land ~chance,
    # which is matched failure, not discriminative evidence). These cells
    # get easier data, tuned so the EXECUTED REFERENCE lands 0.50-0.85
    # under its own per-dataset protocol
    # (benchmarks/node_classification/tune_hard_cells.py sweep). Both
    # head-to-head sides build the graph with the same (model, shape) key,
    # so each cell still compares identical data.
    _MODEL_DIFFICULTY = {
        # GAT citeseer: the reference's citeseer protocol (drop 0.6 on
        # inputs/attention/hidden + l2 2e-3 over 3703-dim QKV kernels,
        # ~10x cora's effective weight decay) collapses to a constant
        # predictor (exactly 0.147 across seeds) on anything weaker —
        # measured ladder: (.70,2.0,.30)=0.147, (.65,1.6,.40)=0.171,
        # (.72,2.5,.20,tpc20)=0.697 IN BAND (tune_hard_cells.py)
        ("gat", "citeseer"): dict(homophily=0.72, feature_signal=2.5,
                                  class_overlap=0.20, train_per_class=20),
        ("gat", "pubmed"): dict(homophily=0.70, feature_signal=2.0,
                                class_overlap=0.30),
        ("appnp", "citeseer"): dict(homophily=0.66, feature_signal=1.6,
                                    class_overlap=0.35),
        ("ssgc", "citeseer"): dict(homophily=0.66, feature_signal=1.6,
                                   class_overlap=0.35),
    }
    TRAIN_PER_CLASS = 10
    LABEL_NOISE = 0.10

    def __init__(self, dataset_name: str = "cora", seed: int = 0,
                 model: Optional[str] = None):
        self.dataset_name = dataset_name
        self.seed = seed
        # ``model`` selects a per-(model, shape) difficulty override; the
        # subprocess-driven bench scripts receive it via TFG_HARD_MODEL
        # (benchmarks/node_classification/head_to_head_hard.run_repo_side)
        if model is None:
            import os
            model = os.environ.get("TFG_HARD_MODEL") or None
        self.model = model

    def load_data(self):
        shape = self._SHAPES[self.dataset_name]
        diff = dict(self._DIFFICULTY[self.dataset_name])
        diff.update(self._MODEL_DIFFICULTY.get(
            (self.model, self.dataset_name), {}))
        # protocol-level knobs may ride in the override dict too (GAT's
        # heavy-dropout protocols need more labeled nodes to leave chance
        # at ANY graph difficulty below saturation)
        train_per_class = int(diff.pop("train_per_class",
                                       self.TRAIN_PER_CLASS))
        label_noise = float(diff.pop("label_noise", self.LABEL_NOISE))
        graph = synthetic_citation_graph(seed=self.seed, **shape, **diff)
        num_classes = shape["num_classes"]
        num_nodes = shape["num_nodes"]
        rng = np.random.default_rng(self.seed + 10_000)
        y = np.asarray(graph.y).copy()

        # balanced per-class training labels from the front of the node range
        # (mirrors Planetoid's "first nodes are train" layout), val after,
        # test from the back — all disjoint
        n_val = self._VAL_SIZE.get(self.dataset_name, 500)
        n_test = self._TEST_SIZE.get(self.dataset_name, 1000)
        head = y[: num_nodes - n_test]
        train_index = np.concatenate([
            np.nonzero(head == c)[0][: train_per_class]
            for c in range(num_classes)])
        train_index = np.sort(train_index)
        pool = np.setdiff1d(np.arange(num_nodes - n_test), train_index)
        valid_index = np.sort(rng.choice(pool, size=n_val, replace=False))
        test_index = np.arange(num_nodes - n_test, num_nodes)

        # flip a fraction of TRAIN labels (clean val/test), evenly per class
        flips_per_class = int(round(label_noise * train_per_class))
        y_clean = np.asarray(graph.y)
        for c in range(num_classes):
            members = train_index[y_clean[train_index] == c]
            if len(members) == 0:
                continue
            victims = rng.choice(members, size=min(flips_per_class,
                                                   len(members)),
                                 replace=False)
            for node in victims:
                y[node] = (y[node] + 1 + rng.integers(0, num_classes - 1)) \
                    % num_classes
        graph.y = y.astype(np.int32)
        return graph, (train_index.astype(np.int32),
                       valid_index.astype(np.int32),
                       test_index.astype(np.int32))


def synthetic_graph_classification_hard(num_graphs: int = 400,
                                        num_features: int = 4,
                                        hub_exponent: float = 4.5,
                                        seed: int = 0):
    """HARD-MODE graph-classification set (two structural classes).

    Both classes have identical node counts, edge counts, and featureless
    (constant) node features — only the WIRING differs: class 0 draws edge
    destinations uniformly, class 1 draws them hub-biased
    (``u**hub_exponent``; exponent → 1 makes the classes identical, larger
    = easier). Default 4.5: on UNIQUE-edge graphs (required by the
    reference MinCutPool) dedup-resampling flattens the hub concentration,
    so the old 2.5 lands near chance — measured ladder (repo MeanPool):
    2.5→0.55, 3.5→bimodal [0.43,0.75], 4.0→[0.53,0.63,0.75],
    4.5→[0.78,0.83,0.85] stable mid-band, 5.0→[0.90,0.93]. The label is carried purely by topology (degree shape /
    local density), the regime where a pooling readout actually has to work
    — unlike the easy fallback set whose classes differ 2.5× in edge count
    (demo_utils.load_graph_classification_data). Tuned so the executed
    reference MeanPool lands ~0.70-0.85 (benchmarks/graph_classification/
    head_to_head_graph.py).

    Returns ``(graphs, num_classes)`` like the dataset loaders.
    """
    rng = np.random.default_rng(seed)

    def draw_unique(n, e, hubby):
        """Exactly ``e`` UNIQUE directed pairs (the reference's MinCutPool
        densifies the adjacency with tf.sparse.to_dense, which rejects
        duplicate indices — real TU graphs are duplicate-free; resampling
        instead of dropping keeps edge counts identical across classes so
        the count stays a non-signal)."""
        pairs = np.empty((0, 2), np.int64)
        for _ in range(64):
            need = e - len(pairs)
            if need <= 0:
                break
            src = rng.integers(0, n, size=need * 2)
            if hubby:
                dst = np.minimum(
                    (rng.random(need * 2) ** hub_exponent * n).astype(np.int64),
                    n - 1)
            else:
                dst = rng.integers(0, n, size=need * 2)
            pairs = np.unique(np.concatenate(
                [pairs, np.stack([dst, src], axis=1)]), axis=0)
        assert len(pairs) >= e, (n, e, len(pairs))
        return pairs[rng.permutation(len(pairs))[:e]].T

    graphs = []
    for g in range(num_graphs):
        label = int(g % 2)
        n = int(rng.integers(12, 28))
        e = 3 * n
        ei = draw_unique(n, e, hubby=label == 1).astype(np.int32)
        x = np.full((n, num_features), 1.0 / num_features, np.float32)
        graphs.append(Graph(x=x, edge_index=ei, y=np.asarray([label])))
    order = rng.permutation(num_graphs)
    return [graphs[i] for i in order], 2


def flip_graph_labels(graphs, noise: float = 0.1, seed: int = 42):
    """Flip ``noise`` of the given (TRAIN) graphs' binary labels in place —
    shared train-label noise for the graph-level hard benchmark (apply AFTER
    the train/test split so the test metric stays clean; both head-to-head
    sides call this with the same seed so they see identical data)."""
    rng = np.random.default_rng(seed)
    k = int(round(noise * len(graphs)))
    for i in rng.choice(len(graphs), size=k, replace=False):
        g = graphs[i]
        g.y = np.asarray([1 - int(np.asarray(g.y).flatten()[0])])
    return graphs
