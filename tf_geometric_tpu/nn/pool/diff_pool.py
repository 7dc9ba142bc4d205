"""DiffPool: differentiable hierarchical pooling
(reference: nn/pool/diff_pool.py:8-105).

TPU-native coarsening: instead of offsetting cluster ids into one big
[G·C, G·C] matrix (diff_pool.py:42-52), the batched coarsen computes
per-graph blocks directly —

    pooled_adj[g] = Σ_{e ∈ g} w_e · S[row_e] ⊗ S[col_e]   ([G, C, C])
    pooled_x[g·C + c] = Σ_{n ∈ g} S[n, c] · h[n]

via segment-sums of outer products, which XLA maps onto the MXU. Outputs use
the same flat layout as the reference (cluster id = g·C + c, pooled edges
enumerate within-graph pairs), so downstream layers are unchanged.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..kernel.segment import segment_sum

__all__ = ["diff_pool", "diff_pool_coarsen", "batched_cluster_coarsen"]


def batched_cluster_coarsen(h, edge_index, edge_weight, node_graph_index,
                            dense_assign, num_graphs: int):
    """Shared Sᵀ A S / Sᵀ h coarsening over a batch of graphs.

    Returns ``(pooled_x [G·C, F], pooled_edge_index [2, G·C²],
    pooled_edge_weight [G·C²], pooled_node_graph_index [G·C])``.
    """
    num_nodes, num_clusters = dense_assign.shape
    row, col = edge_index[0], edge_index[1]
    if edge_weight is None:
        edge_weight = jnp.ones((edge_index.shape[1],), jnp.float32)

    safe_row = jnp.clip(row, 0, num_nodes - 1)
    safe_col = jnp.clip(col, 0, num_nodes - 1)
    S_row = jnp.take(dense_assign, safe_row, axis=0)            # [E, C]
    S_col = jnp.take(dense_assign, safe_col, axis=0)            # [E, C]
    outer = (S_row[:, :, None] * S_col[:, None, :]) * edge_weight[:, None, None]
    edge_graph = jnp.where((row >= 0) & (row < num_nodes),
                           jnp.take(node_graph_index, safe_row), num_graphs)
    pooled_adj = segment_sum(outer, edge_graph, num_graphs)      # [G, C, C]

    # pooled features: Sᵀ h per graph → scatter into flat [G·C, F]
    cluster_ids = (jnp.asarray(node_graph_index, jnp.int32) * num_clusters)
    # per (node, c): cluster_global = g·C + c; do it as C shifted segment sums
    weighted = dense_assign[:, :, None] * h[:, None, :]          # [N, C, F]
    flat_ids = (cluster_ids[:, None] + jnp.arange(num_clusters, dtype=jnp.int32)[None, :])
    pooled_x = segment_sum(weighted.reshape(num_nodes * num_clusters, -1),
                           flat_ids.reshape(-1), num_graphs * num_clusters)

    # pooled edges: within-graph all pairs, flat layout g·C + c
    c = num_clusters
    base = jnp.arange(num_graphs, dtype=jnp.int32)[:, None, None] * c
    rows = base + jnp.arange(c, dtype=jnp.int32)[None, :, None]
    cols = base + jnp.arange(c, dtype=jnp.int32)[None, None, :]
    pooled_edge_index = jnp.stack([jnp.broadcast_to(rows, (num_graphs, c, c)).reshape(-1),
                                   jnp.broadcast_to(cols, (num_graphs, c, c)).reshape(-1)],
                                  axis=0)
    pooled_edge_weight = pooled_adj.reshape(-1)
    pooled_node_graph_index = jnp.repeat(jnp.arange(num_graphs, dtype=jnp.int32), c)
    return pooled_x, pooled_edge_index, pooled_edge_weight, pooled_node_graph_index


def _check_assign_shape(dense_assign, num_nodes, num_clusters):
    if num_nodes is not None and int(num_nodes) != dense_assign.shape[0]:
        raise ValueError(f"num_nodes={num_nodes} does not match "
                         f"dense_assign.shape[0]={dense_assign.shape[0]}")
    if num_clusters is not None and int(num_clusters) != dense_assign.shape[1]:
        raise ValueError(f"num_clusters={num_clusters} does not match "
                         f"dense_assign.shape[1]={dense_assign.shape[1]}")


def diff_pool_coarsen(x, edge_index, edge_weight, node_graph_index, dense_assign,
                      num_nodes=None, num_clusters=None, num_graphs: Optional[int] = None):
    """diff_pool.py:8-52 with the batched-block layout above.

    ``num_nodes``/``num_clusters`` exist for reference-signature parity and
    must match ``dense_assign``'s shape when given (validated, not used)."""
    _check_assign_shape(dense_assign, num_nodes, num_clusters)
    from .common_pool import _resolve_num_graphs
    num_graphs = _resolve_num_graphs(node_graph_index, num_graphs)
    return batched_cluster_coarsen(x, edge_index, edge_weight, node_graph_index,
                                   dense_assign, num_graphs)


def diff_pool(x, edge_index, edge_weight, node_graph_index,
              feature_gnn: Callable, assign_gnn: Callable,
              num_clusters: int, bias=None, activation=None,
              cache=None, training=None, num_graphs: Optional[int] = None):
    """diff_pool.py:55-105: assign_gnn → softmax S; feature_gnn → h; coarsen."""
    if edge_weight is None:
        edge_weight = jnp.ones((edge_index.shape[1],), jnp.float32)
    kwargs = {} if cache is None else {"cache": cache}
    assign_logits = assign_gnn([x, edge_index, edge_weight], training=training, **kwargs)
    h = feature_gnn([x, edge_index, edge_weight], training=training, **kwargs)
    assign_probs = jax.nn.softmax(assign_logits, axis=-1)

    pooled_h, pooled_edge_index, pooled_edge_weight, pooled_ngi = diff_pool_coarsen(
        h, edge_index, edge_weight, node_graph_index, assign_probs,
        num_graphs=num_graphs)

    if bias is not None:
        pooled_h = pooled_h + bias
    if activation is not None:
        pooled_h = activation(pooled_h)
    return pooled_h, pooled_edge_index, pooled_edge_weight, pooled_ngi
