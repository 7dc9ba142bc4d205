"""Graph containers: ``Graph``, ``BatchGraph``, ``HeteroGraph``, ``HeteroBatchGraph``.

TPU-native counterparts of the reference containers (data/graph.py:20,362,623,741)
with one structural change: every container is a **registered JAX pytree**, so
graphs pass directly through ``jit`` / ``grad`` / ``shard_map``. The per-graph
``cache`` dict (the reference's performance backbone, data/graph.py:48) is
host-side state and is intentionally **excluded** from the pytree leaves — the
idiomatic JAX pattern is to build caches eagerly (host) and let ``jit``
capture the resulting arrays as constants, exactly like the reference stores
numpy triples so ``tf.function`` embeds them (nn/conv/gcn.py:126-128).

Static-shape discipline: containers carry whatever shapes they're given;
:mod:`tf_geometric_tpu.data.padding` provides bucketing/padding to make them
jit-stable across batches.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.union_utils import convert_union_to_numpy, union_len

__all__ = ["Graph", "BatchGraph", "HeteroGraph", "HeteroBatchGraph"]


def _num_rows(x):
    """Row count of dense array / SparseMatrix / lazy callable."""
    from ..sparse.matrix import SparseMatrix
    if isinstance(x, SparseMatrix):
        return x.shape[0]
    return int(x.shape[0])


@jax.tree_util.register_pytree_node_class
class Graph:
    """A homogeneous graph: node features + weighted edge list + labels.

    Mirrors the reference ``Graph`` (data/graph.py:20-359): ``x`` may be a
    dense array, a :class:`~tf_geometric_tpu.sparse.SparseMatrix`, or a lazy
    zero-arg callable (deferred feature materialization, data/graph.py:138-143);
    ``edge_index`` is ``[2, E]`` int32 (row = destination); ``edge_weight``
    defaults to ones.
    """

    _FIELDS = ("x", "edge_index", "edge_weight", "y")

    def __init__(self, x=None, edge_index=None, y=None, edge_weight=None):
        if callable(x) and not hasattr(x, "shape"):
            x = x()  # lazy feature callable (data/graph.py:138-143)
        self.x = x
        self.edge_index = None if edge_index is None else self._cast_index(edge_index)
        self.y = y
        if edge_weight is None and self.edge_index is not None:
            edge_weight = np.ones((self.num_edges,), np.float32)
        self.edge_weight = edge_weight
        self.cache: dict = {}

    # -- pytree protocol (cache is host state, not a leaf) -------------------
    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        for f, c in zip(cls._FIELDS, children):
            setattr(obj, f, c)
        obj.cache = {}
        return obj

    @staticmethod
    def _cast_index(edge_index):
        arr = edge_index
        if isinstance(arr, jax.Array):
            return arr.astype(jnp.int32) if arr.dtype != jnp.int32 else arr
        return np.asarray(arr, np.int32)

    # -- shape accessors (data/graph.py:145-190) -----------------------------
    @property
    def num_nodes(self) -> int:
        if self.x is not None:
            return _num_rows(self.x)
        if self.edge_index is not None and union_len(self.edge_index[0]):
            return int(np.max(convert_union_to_numpy(self.edge_index))) + 1
        return 0

    @property
    def num_edges(self) -> int:
        return 0 if self.edge_index is None else int(self.edge_index.shape[1])

    @property
    def num_features(self) -> int:
        from ..sparse.matrix import SparseMatrix
        if isinstance(self.x, SparseMatrix):
            return self.x.shape[1]
        return int(self.x.shape[-1])

    # -- adjacency (data/graph.py:208-210) -----------------------------------
    def adj(self):
        from ..sparse.matrix import SparseMatrix
        n = self.num_nodes
        return SparseMatrix(jnp.asarray(self.edge_index),
                            None if self.edge_weight is None else jnp.asarray(self.edge_weight),
                            (n, n))

    # -- conversions ----------------------------------------------------------
    def _copy_for_conversion(self) -> "Graph":
        """Shallow class-preserving copy (keeps BatchGraph fields like
        ``graphs``) with an independent cache dict."""
        import copy
        target = copy.copy(self)
        target.cache = dict(self.cache)
        return target

    def convert_data_to_tensor(self, inplace: bool = True) -> "Graph":
        """Move arrays onto the default JAX device (data/graph.py:221-233)."""
        target = self if inplace else self._copy_for_conversion()
        from ..sparse.matrix import SparseMatrix
        for f in self._FIELDS:
            v = getattr(self, f)
            if v is not None and not isinstance(v, SparseMatrix) and not isinstance(v, jax.Array):
                v = jnp.asarray(v)
            setattr(target, f, v)
        return target

    def convert_data_to_numpy(self, inplace: bool = True) -> "Graph":
        target = self if inplace else self._copy_for_conversion()
        from ..sparse.matrix import SparseMatrix
        for f in self._FIELDS:
            v = getattr(self, f)
            if v is not None and not isinstance(v, SparseMatrix):
                v = convert_union_to_numpy(v)
            setattr(target, f, v)
        return target

    def to_directed(self, merge_mode: str = "sum", inplace: bool = True) -> "Graph":
        """Canonicalize an undirected edge list into a symmetric directed one
        (data/graph.py:235-253)."""
        from ..utils.graph_utils import convert_edge_to_directed
        edge_index, props = convert_edge_to_directed(
            convert_union_to_numpy(self.edge_index, np.int32),
            None if self.edge_weight is None else [convert_union_to_numpy(self.edge_weight)],
            None if self.edge_weight is None else [merge_mode],
        )
        target = self if inplace else Graph(self.x, edge_index, self.y)
        target.edge_index = edge_index
        target.edge_weight = None if props is None else props[0]
        if target.edge_weight is None:
            target.edge_weight = np.ones(edge_index.shape[1], np.float32)
        return target

    # -- subgraphing (data/graph.py:276-359) ----------------------------------
    def sample_new_graph_by_node_index(self, sampled_node_index) -> "Graph":
        """Node-induced subgraph with relabeled edges. Host-side (dynamic
        shapes); for jit-safe subgraphing use masking (see nn/pool)."""
        return self._sample_subgraph(sampled_node_index)[0]

    def _sample_subgraph(self, sampled_node_index):
        """Shared core: returns (subgraph, kept-edge mask) so subclasses can
        slice their extra per-edge fields without recomputing the mask."""
        from ..utils.graph_utils import (compute_edge_mask_by_node_index,
                                         reindex_sampled_edge_index)
        node_index = convert_union_to_numpy(sampled_node_index, np.int64)
        x = convert_union_to_numpy(self.x) if not callable(self.x) else self.x
        from ..sparse.matrix import SparseMatrix
        if isinstance(self.x, SparseMatrix):
            from ..utils.tf_sparse_utils import sparse_gather_sub
            new_x = sparse_gather_sub(self.x, node_index)
        else:
            new_x = None if x is None else x[node_index]
        edge_index = convert_union_to_numpy(self.edge_index, np.int64)
        mask = np.asarray(compute_edge_mask_by_node_index(
            edge_index, node_index, num_nodes=self.num_nodes))
        kept_index = edge_index[:, mask]
        new_edge_index = reindex_sampled_edge_index(kept_index, node_index)
        new_weight = (None if self.edge_weight is None
                      else convert_union_to_numpy(self.edge_weight)[mask])
        y = convert_union_to_numpy(self.y)
        new_y = None if y is None else (y[node_index] if union_len(y) == self.num_nodes else y)
        return Graph(new_x, new_edge_index, new_y, new_weight), mask

    def __repr__(self):
        return (f"Graph(num_nodes={self.num_nodes}, num_edges={self.num_edges}, "
                f"num_features={None if self.x is None else self.num_features})")


@jax.tree_util.register_pytree_node_class
class BatchGraph(Graph):
    """Disjoint union of graphs with per-node/per-edge graph ids
    (reference data/graph.py:362-620)."""

    _FIELDS = ("x", "edge_index", "edge_weight", "y",
               "node_graph_index", "edge_graph_index")

    def __init__(self, x=None, edge_index=None, node_graph_index=None,
                 edge_graph_index=None, y=None, edge_weight=None, graphs=None):
        super().__init__(x=x, edge_index=edge_index, y=y, edge_weight=edge_weight)
        self.node_graph_index = node_graph_index
        self.edge_graph_index = edge_graph_index
        self.graphs = graphs

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = super().tree_unflatten(aux, children)
        obj.graphs = None
        return obj

    @property
    def num_graphs(self) -> int:
        """data/graph.py:389-394."""
        if self.graphs is not None:
            return len(self.graphs)
        return int(np.max(convert_union_to_numpy(self.node_graph_index))) + 1

    @classmethod
    def from_graphs(cls, graphs: Sequence[Graph]) -> "BatchGraph":
        """Pack graphs into one disjoint union (data/graph.py:463-534)."""
        from ..sparse.matrix import SparseMatrix, concat as sparse_concat
        xs, eis, ews, ys, ngi, egi = [], [], [], [], [], []
        node_offset = 0
        use_sparse_x = any(isinstance(g.x, SparseMatrix) for g in graphs)
        for gid, g in enumerate(graphs):
            n, e = g.num_nodes, g.num_edges
            xs.append(g.x)
            if g.edge_index is None:
                eis.append(np.zeros((2, 0), np.int64))
            else:
                eis.append(convert_union_to_numpy(g.edge_index, np.int64) + node_offset)
            ews.append(convert_union_to_numpy(g.edge_weight, np.float32)
                       if g.edge_weight is not None else np.ones(e, np.float32))
            if g.y is not None:
                ys.append(np.atleast_1d(convert_union_to_numpy(g.y)))
            elif ys:
                raise ValueError(
                    f"from_graphs: graph {gid} has y=None while earlier "
                    "graphs are labeled — mixed labeling would silently "
                    "misalign y with graph ids")
            ngi.append(np.full(n, gid, np.int32))
            egi.append(np.full(e, gid, np.int32))
            node_offset += n
        if ys and len(ys) != len(graphs):
            raise ValueError(
                "from_graphs: some graphs have y=None while others are "
                "labeled — mixed labeling would silently misalign y")
        if use_sparse_x:
            x = sparse_concat([g.x for g in graphs], axis=0)  # data/graph.py:515
        else:
            x = np.concatenate([convert_union_to_numpy(v) for v in xs], axis=0)
        y = np.concatenate(ys, axis=0) if ys else None
        return cls(
            x=x,
            edge_index=np.concatenate(eis, axis=1).astype(np.int32),
            node_graph_index=np.concatenate(ngi),
            edge_graph_index=np.concatenate(egi),
            y=y,
            edge_weight=np.concatenate(ews),
            graphs=list(graphs),
        )

    def to_graphs(self) -> List[Graph]:
        """Split the union back into individual graphs (data/graph.py:396-461).

        Handles SparseMatrix ``x`` (the from_graphs sparse path round-trips)
        and non-contiguous ``node_graph_index`` (local ids are assigned by
        position within each graph, not by a global offset)."""
        from ..sparse.matrix import SparseMatrix
        ngi = convert_union_to_numpy(self.node_graph_index, np.int64)
        egi = convert_union_to_numpy(self.edge_graph_index, np.int64)
        x_is_sparse = isinstance(self.x, SparseMatrix)
        x = self.x if x_is_sparse else convert_union_to_numpy(self.x)
        ei = convert_union_to_numpy(self.edge_index, np.int64)
        ew = convert_union_to_numpy(self.edge_weight, np.float32)
        y = convert_union_to_numpy(self.y)
        num_graphs = self.num_graphs
        # local id of each node = its rank among same-graph nodes (in input
        # order) — correct even when node_graph_index is interleaved
        node_counts = np.bincount(ngi, minlength=num_graphs)
        starts = np.concatenate([[0], np.cumsum(node_counts)[:-1]])
        order = np.argsort(ngi, kind="stable")
        local = np.empty(len(ngi), np.int64)
        local[order] = np.arange(len(ngi)) - starts[ngi[order]]
        graphs = []
        for gid in range(num_graphs):
            nmask = ngi == gid
            emask = egi == gid
            node_ids = np.nonzero(nmask)[0]
            if x_is_sparse:
                from ..utils.tf_sparse_utils import sparse_gather_sub
                sub_x = sparse_gather_sub(x, node_ids)
            else:
                sub_x = x[nmask]
            sub_ei = local[ei[:, emask]]
            sub_y = None
            if y is not None:
                sub_y = y[nmask] if union_len(y) == union_len(ngi) else y[gid]
            graphs.append(Graph(sub_x, sub_ei.astype(np.int32), sub_y, ew[emask]))
        return graphs

    def to_directed(self, merge_mode: str = "sum", inplace: bool = True) -> "BatchGraph":
        """data/graph.py:579-599: merges edge_graph_index with mode "max"."""
        from ..utils.graph_utils import convert_edge_to_directed
        props = [convert_union_to_numpy(self.edge_weight),
                 convert_union_to_numpy(self.edge_graph_index)]
        edge_index, new_props = convert_edge_to_directed(
            convert_union_to_numpy(self.edge_index, np.int32), props,
            [merge_mode, "max"])
        target = self if inplace else BatchGraph(
            self.x, edge_index, self.node_graph_index, None, self.y, None, self.graphs)
        target.edge_index = edge_index
        target.edge_weight = new_props[0]
        target.edge_graph_index = new_props[1].astype(np.int32)
        return target

    def sample_new_graph_by_node_index(self, sampled_node_index) -> "BatchGraph":
        """Subgraph keeping batch bookkeeping (data/graph.py:276-359 handles
        BatchGraph extras)."""
        base, mask = self._sample_subgraph(sampled_node_index)
        node_index = convert_union_to_numpy(sampled_node_index, np.int64)
        ngi = convert_union_to_numpy(self.node_graph_index, np.int32)[node_index]
        egi = convert_union_to_numpy(self.edge_graph_index, np.int32)[mask]
        return BatchGraph(base.x, base.edge_index, ngi, egi, base.y, base.edge_weight)

    def __repr__(self):
        return (f"BatchGraph(num_graphs={self.num_graphs}, num_nodes={self.num_nodes}, "
                f"num_edges={self.num_edges})")


class HeteroGraph:
    """Heterogeneous graph: dicts keyed by node type / (src, rel, dst) triple
    (reference data/graph.py:623-734). Host-side container (not a pytree —
    hetero models unpack the dicts explicitly)."""

    def __init__(self, x_dict=None, edge_index_dict=None, y_dict=None,
                 edge_weight_dict=None):
        self.x_dict = dict(x_dict or {})
        self.edge_index_dict = {
            k: np.asarray(v, np.int32) for k, v in (edge_index_dict or {}).items()
        }
        self.y_dict = dict(y_dict or {})
        self.edge_weight_dict = {}
        # NOTE: reference iterates the dict itself instead of .items()
        # (data/graph.py:642-643) — a bug we do not replicate.
        for etype, w in (edge_weight_dict or {}).items():
            self.edge_weight_dict[etype] = np.asarray(w, np.float32)
        for etype, ei in self.edge_index_dict.items():
            if etype not in self.edge_weight_dict:
                self.edge_weight_dict[etype] = np.ones(ei.shape[1], np.float32)
        self.cache: dict = {}

    @property
    def node_types(self):
        return list(self.x_dict.keys())

    @property
    def edge_types(self):
        return list(self.edge_index_dict.keys())

    def num_nodes_of(self, ntype) -> int:
        return _num_rows(self.x_dict[ntype])

    @property
    def num_nodes_dict(self) -> Dict[str, int]:
        return {t: self.num_nodes_of(t) for t in self.node_types}

    def add_reversed_edges(self, inplace: bool = True) -> "HeteroGraph":
        """Add (dst, "r.rel", src) mirror edges (data/graph.py:688-712).
        Class-preserving when ``inplace=False`` (HeteroBatchGraph keeps its
        per-type graph-index dicts)."""
        import copy
        target = self if inplace else copy.copy(self)
        if not inplace:
            target.edge_index_dict = dict(self.edge_index_dict)
            target.edge_weight_dict = dict(self.edge_weight_dict)
            target.cache = {}
        for (src, rel, dst) in list(target.edge_index_dict.keys()):
            rev = (dst, "r." + rel, src)
            if rev in target.edge_index_dict:
                continue
            ei = target.edge_index_dict[(src, rel, dst)]
            target.edge_index_dict[rev] = ei[::-1].copy()
            target.edge_weight_dict[rev] = target.edge_weight_dict[(src, rel, dst)].copy()
        return target

    def __repr__(self):
        return (f"HeteroGraph(node_types={self.node_types}, "
                f"edge_types={self.edge_types})")


class HeteroBatchGraph(HeteroGraph):
    """Per-type disjoint union of HeteroGraphs (reference data/graph.py:741-1052)."""

    def __init__(self, x_dict=None, edge_index_dict=None,
                 node_graph_index_dict=None, edge_graph_index_dict=None,
                 y_dict=None, edge_weight_dict=None, graphs=None):
        super().__init__(x_dict, edge_index_dict, y_dict, edge_weight_dict)
        self.node_graph_index_dict = dict(node_graph_index_dict or {})
        self.edge_graph_index_dict = dict(edge_graph_index_dict or {})
        self.graphs = graphs

    @property
    def num_graphs(self) -> int:
        if self.graphs is not None:
            return len(self.graphs)
        any_ngi = next(iter(self.node_graph_index_dict.values()))
        return int(np.max(convert_union_to_numpy(any_ngi))) + 1

    @classmethod
    def from_graphs(cls, graphs: Sequence[HeteroGraph]) -> "HeteroBatchGraph":
        """Per-ntype node offsets, per-etype edge concat (data/graph.py:837-1003)."""
        ntypes, etypes = [], []
        for g in graphs:
            for t in g.node_types:
                if t not in ntypes:
                    ntypes.append(t)
            for t in g.edge_types:
                if t not in etypes:
                    etypes.append(t)
        x_dict, ngi_dict = {}, {}
        offsets = {t: [] for t in ntypes}
        for t in ntypes:
            xs, ngis, off = [], [], 0
            for gid, g in enumerate(graphs):
                if t not in g.x_dict:
                    offsets[t].append(off)
                    continue
                offsets[t].append(off)
                x = convert_union_to_numpy(g.x_dict[t])
                xs.append(x)
                ngis.append(np.full(x.shape[0], gid, np.int32))
                off += x.shape[0]
            x_dict[t] = np.concatenate(xs, axis=0)
            ngi_dict[t] = np.concatenate(ngis)
        ei_dict, ew_dict, egi_dict = {}, {}, {}
        for t in etypes:
            src_t, _, dst_t = t
            eis, ews, egis = [], [], []
            for gid, g in enumerate(graphs):
                if t not in g.edge_index_dict:
                    continue
                ei = convert_union_to_numpy(g.edge_index_dict[t], np.int64).copy()
                # convention throughout this repo (loaders + hetero demos):
                # for etype (src, rel, dst), edge_index[0] holds src-typed
                # ids and edge_index[1] dst-typed ids
                ei[0] += offsets[src_t][gid] if src_t in offsets else 0
                ei[1] += offsets[dst_t][gid] if dst_t in offsets else 0
                eis.append(ei)
                ews.append(convert_union_to_numpy(g.edge_weight_dict[t], np.float32))
                egis.append(np.full(ei.shape[1], gid, np.int32))
            ei_dict[t] = np.concatenate(eis, axis=1).astype(np.int32)
            ew_dict[t] = np.concatenate(ews)
            egi_dict[t] = np.concatenate(egis)
        y_dict = {}
        for t in ntypes:
            ys = [np.atleast_1d(convert_union_to_numpy(g.y_dict[t]))
                  for g in graphs if t in g.y_dict and g.y_dict[t] is not None]
            if ys:
                y_dict[t] = np.concatenate(ys, axis=0)
        return cls(x_dict, ei_dict, ngi_dict, egi_dict, y_dict, ew_dict, list(graphs))
