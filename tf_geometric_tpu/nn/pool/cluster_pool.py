"""Cluster coarsening: pooled = Sᵀ A S (reference: nn/pool/cluster_pool.py:9-46).

The reference densifies the full A ([N, N]) for the chain. Here A stays
sparse: ``A @ S`` is one SpMM over A's edges against the dense assignment
matrix, and ``Sᵀ @ (A S)`` is a segment-sum over assignment edges — O(E·C)
instead of O(N²).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.graph_utils import convert_dense_adj_to_edge
from ..kernel.segment import segment_sum

__all__ = ["cluster_pool"]


def cluster_pool(x, edge_index, edge_weight, assign_edge_index, assign_edge_weight,
                 num_clusters: int, num_nodes: Optional[int] = None,
                 dense_output_edges: bool = False):
    """Coarsen a graph by (soft) cluster assignment.

    assign_edge_index: [2, num_assign] node→cluster edges (row=node,
    col=cluster); assign_edge_weight: their soft weights.

    Returns ``(pooled_x, pooled_edge_index, pooled_edge_weight)``. When
    ``dense_output_edges`` (required under jit), the pooled adjacency is
    returned as ALL C² pairs (zero-weight pairs are no-ops downstream);
    otherwise zeros are filtered host-side like the reference.
    """
    if num_nodes is None:
        if x is None:
            raise ValueError("Please provide num_nodes if x is None")
        num_nodes = x.shape[0]

    a_row, a_col = assign_edge_index[0], assign_edge_index[1]
    s_weight = jnp.asarray(assign_edge_weight)
    if edge_weight is None:
        edge_weight = jnp.ones((edge_index.shape[1],), jnp.float32)
    edge_weight = jnp.asarray(edge_weight)

    # dense S: [N, C] (scatter of assignment edges)
    S = jnp.zeros((num_nodes, num_clusters), s_weight.dtype)
    safe_nodes = jnp.clip(a_row, 0, num_nodes - 1)
    valid = (a_row >= 0) & (a_row < num_nodes) & (a_col >= 0) & (a_col < num_clusters)
    S = S.at[jnp.where(valid, safe_nodes, num_nodes),
             jnp.clip(a_col, 0, num_clusters - 1)].add(
        jnp.where(valid, s_weight, 0.0), mode="drop")

    # A @ S via SpMM over A's edges
    row, col = edge_index[0], edge_index[1]
    msg = jnp.take(S, jnp.clip(col, 0, num_nodes - 1), axis=0) * edge_weight[:, None]
    AS = segment_sum(msg, row, num_nodes)                      # [N, C]
    # Sᵀ (A S): [C, C]
    pooled_adj = S.T @ AS

    if x is not None:
        pooled_x = S.T @ x                                      # Sᵀ X
    else:
        pooled_x = None

    if dense_output_edges or isinstance(pooled_adj, jax.core.Tracer):
        c = num_clusters
        rows = jnp.repeat(jnp.arange(c, dtype=jnp.int32), c)
        cols = jnp.tile(jnp.arange(c, dtype=jnp.int32), c)
        pooled_edge_index = jnp.stack([rows, cols], axis=0)
        pooled_edge_weight = pooled_adj.reshape(-1)
    else:
        pooled_edge_index, pooled_edge_weight = convert_dense_adj_to_edge(pooled_adj)
    return pooled_x, pooled_edge_index, pooled_edge_weight
