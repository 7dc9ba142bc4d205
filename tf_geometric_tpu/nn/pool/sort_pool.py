"""SortPool (reference: nn/pool/sort_pool.py:25-36): score = x[:, sort_index],
per-graph top-k, node-induced subgraph. Fixed-k path is jit/grad-safe;
ratio path is host-side dynamic (eager)."""
from __future__ import annotations

from typing import Optional

import jax

from ._subgraph import induced_subgraph, induced_subgraph_fixed
from .topk_pool import topk_pool, topk_pool_fixed

__all__ = ["sort_pool"]


def sort_pool(x, edge_index, edge_weight, node_graph_index,
              k: Optional[int] = None, ratio: Optional[float] = None,
              sort_index: int = -1, training=None,
              num_graphs: Optional[int] = None):
    """SortPool (reference nn/pool/sort_pool.py:25-36): score = x[:, sort_index],
    per-graph top-k, node-induced subgraph; fixed-k path is jit/grad-safe."""
    score = x[:, sort_index]
    if k is not None:
        if num_graphs is None:
            from .common_pool import _resolve_num_graphs
            num_graphs = _resolve_num_graphs(node_graph_index, None)
        idx, valid = topk_pool_fixed(node_graph_index, score, num_graphs, k)
        return induced_subgraph_fixed(x, edge_index, edge_weight,
                                      node_graph_index, idx, valid, num_graphs)
    topk_node_index = topk_pool(node_graph_index, score, k=None, ratio=ratio)
    return induced_subgraph(x, edge_index, edge_weight,
                            node_graph_index, topk_node_index)
