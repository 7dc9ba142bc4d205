"""Static-shape padding & bucketing — the load-bearing idea of the TPU build.

XLA traces once per shape; ragged graphs therefore get padded to capacity
buckets (SURVEY §7 "Design stance"). Conventions used across the framework:

* **Padded nodes** are appended after real nodes with zero features and
  ``node_graph_index = num_graphs`` (out-of-range → dropped by segment ops).
* **Padded edges** use ``row = col = num_nodes_capacity`` (out-of-range) and
  ``edge_weight = 0`` — both the scatter (drop) and the gather (clip ×0)
  sides neutralize them with no masks in the hot loop.
* Capacities are rounded up to bucket boundaries so a stream of variable-size
  batches triggers only O(log) recompilations.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..utils.union_utils import convert_union_to_numpy
from .graph import BatchGraph, Graph

__all__ = ["bucket_size", "pad_graph", "pad_batch_graph", "PaddingSpec"]


def bucket_size(n: int, multiple: int = 128, growth: float = 1.3) -> int:
    """Round ``n`` up to a geometric bucket boundary aligned to ``multiple``."""
    if n <= 0:
        return multiple
    target = multiple
    while target < n:
        target = int(math.ceil(target * growth / multiple) * multiple)
    return target


class PaddingSpec:
    """Fixed capacities for (nodes, edges, graphs) a padded batch must satisfy."""

    def __init__(self, num_nodes: int, num_edges: int, num_graphs: Optional[int] = None):
        self.num_nodes = int(num_nodes)
        self.num_edges = int(num_edges)
        self.num_graphs = None if num_graphs is None else int(num_graphs)

    @classmethod
    def for_graph(cls, graph: Graph, multiple: int = 128,
                  num_graphs: Optional[int] = None) -> "PaddingSpec":
        return cls(bucket_size(graph.num_nodes, multiple),
                   bucket_size(graph.num_edges, multiple), num_graphs)

    def __repr__(self):
        return (f"PaddingSpec(nodes={self.num_nodes}, edges={self.num_edges}, "
                f"graphs={self.num_graphs})")


def _pad_rows(arr, target_rows: int, fill=0):
    arr = convert_union_to_numpy(arr)
    pad = target_rows - arr.shape[0]
    if pad < 0:
        raise ValueError(f"capacity {target_rows} < actual {arr.shape[0]}")
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths, constant_values=fill)


def pad_graph(graph: Graph, spec: PaddingSpec) -> Graph:
    """Pad a Graph to ``spec`` capacities (padded edges point at the
    out-of-range sink index ``spec.num_nodes``)."""
    n_real, e_real = graph.num_nodes, graph.num_edges
    x = _pad_rows(graph.x, spec.num_nodes) if graph.x is not None else None
    ei = convert_union_to_numpy(graph.edge_index, np.int32)
    pad_e = spec.num_edges - e_real
    if pad_e < 0:
        raise ValueError(f"edge capacity {spec.num_edges} < actual {e_real}")
    if pad_e:
        sink = np.full((2, pad_e), spec.num_nodes, np.int32)
        ei = np.concatenate([ei, sink], axis=1)
    ew = _pad_rows(graph.edge_weight, spec.num_edges, fill=0.0)
    y = graph.y
    if y is not None and convert_union_to_numpy(y).shape[:1] == (n_real,):
        y = _pad_rows(y, spec.num_nodes)
    out = Graph(x, ei, y, ew)
    out.cache["num_real_nodes"] = n_real
    out.cache["num_real_edges"] = e_real
    return out


def pad_batch_graph(batch: BatchGraph, spec: PaddingSpec) -> BatchGraph:
    """Pad a BatchGraph; padded nodes get ``node_graph_index = num_graphs``
    (out-of-range) so pooled readouts ignore them."""
    if spec.num_graphs is None:
        raise ValueError("PaddingSpec.num_graphs required for BatchGraph")
    base = pad_graph(batch, spec)
    ngi = _pad_rows(batch.node_graph_index, spec.num_nodes, fill=spec.num_graphs)
    egi = _pad_rows(batch.edge_graph_index, spec.num_edges, fill=spec.num_graphs)
    out = BatchGraph(base.x, base.edge_index, ngi, egi, base.y, base.edge_weight)
    out.cache.update(base.cache)
    out.cache["num_real_graphs"] = batch.num_graphs
    return out
