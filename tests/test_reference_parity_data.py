"""Data-structure parity vs the EXECUTED reference (companion to
tests/test_reference_parity.py, same golden-fixture protocol).

Covers the §2.6 container layer: BatchGraph disjoint-union bookkeeping,
to_graphs round-trips, Graph.to_directed's dedupe/merge/mirror pipeline,
node-induced subgraphing, HeteroGraph reversed edges, the GCN cache-key
template, and λ_max of the reference's Laplacian operator. Reference
anchors: data/graph.py:362-620 (BatchGraph), utils/graph_utils.py:67-212
(convert_edge_to_directed), data/graph.py:276-359 (subgraph),
data/graph.py:688-712 (add_reversed_edges), nn/conv/gcn.py:9-20,
utils/graph_utils.py:884-909 (LaplacianMaxEigenvalue).
"""
import os

import numpy as np
import pytest

from tests.test_reference_parity import (FIXTURE_DIR, LIVE, _load_fixture,
                                         _ref_modules, _save_fixture)

CASES = {}


def case(name, rtol=1e-5, atol=1e-6):
    def deco(fn):
        CASES[name] = (fn, rtol, atol)
        return fn
    return deco


def _graphs(seed, count=3):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(count):
        n = int(rng.randint(5, 12))
        e = int(rng.randint(6, 20))
        out.append((rng.randn(n, 4).astype(np.float32),
                    rng.randint(0, n, size=(2, e)).astype(np.int32),
                    rng.uniform(0.5, 1.5, e).astype(np.float32),
                    rng.randint(0, 3, n).astype(np.int32)))
    return out


@case("batch_graph_union")
def _case_batch_union():
    gs = _graphs(601)
    inputs = {}
    for i, (x, ei, ew, y) in enumerate(gs):
        inputs.update({f"x{i}": x, f"ei{i}": ei, f"ew{i}": ew, f"y{i}": y})

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        graphs = [tfg.Graph(x=inp[f"x{i}"], edge_index=inp[f"ei{i}"],
                            edge_weight=inp[f"ew{i}"], y=inp[f"y{i}"])
                  for i in range(3)]
        bg = tfg.BatchGraph.from_graphs(graphs)
        back = bg.to_graphs()
        out = {
            "x": np.asarray(bg.x), "ei": np.asarray(bg.edge_index),
            "ew": np.asarray(bg.edge_weight),
            "ngi": np.asarray(bg.node_graph_index).astype(np.int32),
            "egi": np.asarray(bg.edge_graph_index).astype(np.int32),
        }
        for i, g in enumerate(back):
            out[f"rx{i}"] = np.asarray(g.x)
            out[f"rei{i}"] = np.asarray(g.edge_index)
        return out

    def repo(inp):
        from tf_geometric_tpu.data.graph import BatchGraph, Graph
        graphs = [Graph(x=inp[f"x{i}"], edge_index=inp[f"ei{i}"],
                        edge_weight=inp[f"ew{i}"], y=inp[f"y{i}"])
                  for i in range(3)]
        bg = BatchGraph.from_graphs(graphs)
        back = bg.to_graphs()
        out = {
            "x": np.asarray(bg.x), "ei": np.asarray(bg.edge_index),
            "ew": np.asarray(bg.edge_weight),
            "ngi": np.asarray(bg.node_graph_index).astype(np.int32),
            "egi": np.asarray(bg.edge_graph_index).astype(np.int32),
        }
        for i, g in enumerate(back):
            out[f"rx{i}"] = np.asarray(g.x)
            out[f"rei{i}"] = np.asarray(g.edge_index)
        return out

    return inputs, ref, repo


def _to_directed_case(merge_mode):
    def build():
        rng = np.random.RandomState(602)
        n, e = 10, 30
        inputs = dict(x=rng.randn(n, 3).astype(np.float32),
                      ei=rng.randint(0, n, size=(2, e)).astype(np.int32),
                      ew=rng.uniform(0.5, 1.5, e).astype(np.float32))

        def dense(ei, ew, n=10):
            d = np.zeros((n, n), np.float32)
            np.add.at(d, (np.asarray(ei)[0], np.asarray(ei)[1]), np.asarray(ew))
            return d

        def ref(inp):
            tfg, tf, tfs = _ref_modules()
            g = tfg.Graph(x=inp["x"], edge_index=inp["ei"], edge_weight=inp["ew"])
            g = g.to_directed(merge_mode=merge_mode, inplace=False)
            return {"adj": dense(g.edge_index, g.edge_weight)}

        def repo(inp):
            from tf_geometric_tpu.data.graph import Graph
            g = Graph(x=inp["x"], edge_index=inp["ei"], edge_weight=inp["ew"])
            g = g.to_directed(merge_mode=merge_mode, inplace=False)
            return {"adj": dense(g.edge_index, g.edge_weight)}

        return inputs, ref, repo
    return build


for _mode in ("sum", "max", "min", "mean"):
    case(f"to_directed_{_mode}")(_to_directed_case(_mode))


@case("subgraph_sample")
def _case_subgraph():
    rng = np.random.RandomState(603)
    n, e = 12, 40
    inputs = dict(x=rng.randn(n, 3).astype(np.float32),
                  ei=rng.randint(0, n, size=(2, e)).astype(np.int32),
                  ew=rng.uniform(0.5, 1.5, e).astype(np.float32),
                  keep=np.unique(rng.randint(0, n, 7)).astype(np.int32))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        g = tfg.Graph(x=inp["x"], edge_index=inp["ei"], edge_weight=inp["ew"])
        sub = g.sample_new_graph_by_node_index(inp["keep"])
        return {"x": np.asarray(sub.x), "ei": np.asarray(sub.edge_index),
                "ew": np.asarray(sub.edge_weight)}

    def repo(inp):
        from tf_geometric_tpu.data.graph import Graph
        g = Graph(x=inp["x"], edge_index=inp["ei"], edge_weight=inp["ew"])
        sub = g.sample_new_graph_by_node_index(inp["keep"])
        return {"x": np.asarray(sub.x), "ei": np.asarray(sub.edge_index),
                "ew": np.asarray(sub.edge_weight)}

    return inputs, ref, repo


@case("hetero_reversed_edges")
def _case_hetero():
    rng = np.random.RandomState(604)
    inputs = dict(
        xa=rng.randn(6, 3).astype(np.float32),
        xb=rng.randn(8, 3).astype(np.float32),
        ei=rng.randint(0, 6, size=(2, 15)).astype(np.int32))
    inputs["ei"][1] = rng.randint(0, 8, 15)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        g = tfg.HeteroGraph(x_dict={"a": inp["xa"], "b": inp["xb"]},
                            edge_index_dict={("a", "ab", "b"): inp["ei"]})
        g = g.add_reversed_edges(inplace=False)
        keys = sorted(str(k) for k in g.edge_index_dict)
        rev_key = [k for k in g.edge_index_dict if "r." in str(k)][0]
        return {"rev": np.asarray(g.edge_index_dict[rev_key]),
                "nkeys": np.int32(len(keys))}

    def repo(inp):
        from tf_geometric_tpu.data.graph import HeteroGraph
        g = HeteroGraph(x_dict={"a": inp["xa"], "b": inp["xb"]},
                        edge_index_dict={("a", "ab", "b"): inp["ei"]})
        g = g.add_reversed_edges(inplace=False)
        keys = sorted(str(k) for k in g.edge_index_dict)
        rev_key = [k for k in g.edge_index_dict if "r." in str(k)][0]
        return {"rev": np.asarray(g.edge_index_dict[rev_key]),
                "nkeys": np.int32(len(keys))}

    return inputs, ref, repo


@case("lambda_max")
def _case_lambda_max():
    # self-loop-free graph: the reference's LaplacianMaxEigenvalue crashes
    # on self-looped input (graph_utils.py:897 filters the weights but not
    # the index); parity is scored on the working subset, and the repo
    # implements the intended remove-then-laplacian on all inputs
    rng = np.random.RandomState(605)
    n, e = 20, 50
    ei = rng.randint(0, n, size=(2, e)).astype(np.int32)
    loop = ei[0] == ei[1]
    ei[1, loop] = (ei[0, loop] + 1) % n
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    ew = np.concatenate([rng.uniform(0.5, 1.5, e).astype(np.float32)] * 2)
    inputs = dict(ei=ei, ew=ew)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        lam = tfg.utils.graph_utils.LaplacianMaxEigenvalue(
            inp["ei"], 20, inp["ew"])(normalization_type="sym")
        return {"lam": np.float32(lam)}

    def repo(inp):
        from tf_geometric_tpu.utils.graph_utils import LaplacianMaxEigenvalue
        lam = LaplacianMaxEigenvalue(inp["ei"], 20, inp["ew"])(
            normalization_type="sym")
        return {"lam": np.float32(lam)}

    return inputs, ref, repo


def test_gcn_cache_key_template_matches_reference():
    """The cache-key format string must match the reference's so prebuilt
    caches interoperate (nn/conv/gcn.py:9-20)."""
    from tf_geometric_tpu.nn.conv.gcn import compute_cache_key
    for args in (("both", True, True, True, False),
                 ("left", False, False, False, True)):
        assert compute_cache_key(*args) == \
            "gcn_normed_adj_{}_{}_{}_{}_{}".format(*args)


@pytest.mark.parametrize("name", sorted(CASES))
def test_reference_data_parity(name):
    build, rtol, atol = CASES[name]
    inputs, ref_fn, repo_fn = build()

    fix_inputs, fix_expected = _load_fixture("data_" + name)
    if fix_expected is not None and not LIVE:
        inputs, expected = fix_inputs, fix_expected
    else:
        expected = ref_fn(inputs)
        if fix_expected is not None and LIVE:
            for k in fix_expected:
                np.testing.assert_allclose(
                    np.asarray(expected[k], dtype=np.asarray(expected[k]).dtype),
                    fix_expected[k], rtol=rtol, atol=atol,
                    err_msg=f"reference drifted: {name}[{k}]")
        else:
            _save_fixture("data_" + name, inputs, expected)

    got = repo_fn(inputs)
    assert set(got) == set(expected)
    for k in sorted(expected):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(expected[k]),
                                   rtol=rtol, atol=atol,
                                   err_msg=f"{name}[{k}]")
