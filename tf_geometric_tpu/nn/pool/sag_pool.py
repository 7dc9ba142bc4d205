"""SAGPool: self-attention graph pooling (reference: nn/pool/sag_pool.py:27-45).

score_gnn scores nodes → per-graph top-k → scale x by (activated) score →
node-induced subgraph. Two execution modes:

* ``k`` given → **fixed-k masked path**: static shapes, jit- and grad-safe
  (``topk_pool_fixed`` + masked subgraph; padded slots vanish downstream).
  This is the TPU-native default for training loops.
* ``ratio`` given → dynamic host-side selection (eager only), matching the
  reference's ragged-output behavior exactly.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax

from ._subgraph import induced_subgraph, induced_subgraph_fixed
from .topk_pool import topk_pool, topk_pool_fixed

__all__ = ["sag_pool"]


from .common_pool import _resolve_num_graphs


def sag_pool(x, edge_index, edge_weight, node_graph_index,
             score_gnn: Callable, k: Optional[int] = None,
             ratio: Optional[float] = None, score_activation=None,
             training=None, cache=None, num_graphs: Optional[int] = None):
    """SAGPool (reference nn/pool/sag_pool.py:27-45): score_gnn → top-k →
    scale x by activated score → node-induced subgraph."""
    kwargs = {} if cache is None else {"cache": cache}
    node_score = score_gnn([x, edge_index, edge_weight], training=training, **kwargs)

    scaled_score = (score_activation(node_score) if score_activation is not None
                    else node_score)
    scaled_x = x * scaled_score.reshape(scaled_score.shape[0], -1)

    if k is not None:
        g = _resolve_num_graphs(node_graph_index, num_graphs)
        idx, valid = topk_pool_fixed(node_graph_index, node_score, g, k)
        return induced_subgraph_fixed(scaled_x, edge_index, edge_weight,
                                      node_graph_index, idx, valid, g)
    topk_node_index = topk_pool(node_graph_index, node_score, k=None, ratio=ratio)
    return induced_subgraph(scaled_x, edge_index, edge_weight,
                            node_graph_index, topk_node_index)
