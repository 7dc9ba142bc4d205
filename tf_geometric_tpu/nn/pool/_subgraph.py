"""Differentiable node-induced subgraphing for top-k pools.

Index *selection* is host-side (data-dependent sizes, non-differentiable);
the feature/weight *gathers* stay on device so gradients flow into x,
score, and edge weights — matching the reference's in-graph
``sample_new_graph_by_node_index`` behavior (data/graph.py:276-359).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils.union_utils import convert_union_to_numpy

__all__ = ["induced_subgraph"]


def induced_subgraph(x, edge_index, edge_weight, node_graph_index, keep_index):
    """Keep ``keep_index`` nodes; relabel edges whose endpoints both survive.

    Returns (pooled_x, pooled_edge_index, pooled_edge_weight, pooled_ngi)
    with x / edge_weight as device arrays (differentiable gathers).
    """
    keep_index = convert_union_to_numpy(keep_index, np.int64)
    ei = convert_union_to_numpy(edge_index, np.int64)
    ngi = convert_union_to_numpy(node_graph_index, np.int32)
    num_nodes = int(ngi.shape[0])

    lookup = np.full(num_nodes, -1, np.int64)
    lookup[keep_index] = np.arange(len(keep_index))
    new_ends = lookup[ei]
    edge_keep = (new_ends >= 0).all(axis=0)
    kept_edge_pos = np.nonzero(edge_keep)[0]
    new_edge_index = new_ends[:, edge_keep].astype(np.int32)

    pooled_x = jnp.take(x, jnp.asarray(keep_index), axis=0)
    pooled_weight = (None if edge_weight is None
                     else jnp.take(jnp.asarray(edge_weight), jnp.asarray(kept_edge_pos)))
    pooled_ngi = ngi[keep_index]
    return pooled_x, new_edge_index, pooled_weight, pooled_ngi


def induced_subgraph_fixed(x, edge_index, edge_weight, node_graph_index,
                           keep_index, keep_valid, num_graphs: int):
    """jit/grad-safe masked subgraph: node capacity = len(keep_index) (static).

    Invalid kept slots produce zero features and out-of-range graph ids;
    edges with any dropped endpoint are moved out of range with zero weight.
    All ops are jnp — differentiable through the gathers.
    """
    x = jnp.asarray(x)
    edge_index = jnp.asarray(edge_index)
    node_graph_index = jnp.asarray(node_graph_index, jnp.int32)
    num_nodes = x.shape[0]
    cap = keep_index.shape[0]

    safe_keep = jnp.clip(keep_index, 0, num_nodes - 1)
    pooled_x = jnp.where(keep_valid[:, None], jnp.take(x, safe_keep, axis=0), 0.0)
    pooled_ngi = jnp.where(keep_valid, jnp.take(node_graph_index, safe_keep),
                           num_graphs)

    # old node id → new slot (or -1)
    lookup = jnp.full((num_nodes + 1,), -1, jnp.int32)
    scatter_at = jnp.where(keep_valid, safe_keep, num_nodes)
    lookup = lookup.at[scatter_at].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")

    safe_ends = jnp.clip(edge_index, 0, num_nodes - 1)
    in_range = (edge_index >= 0) & (edge_index < num_nodes)
    new_ends = jnp.where(in_range, lookup[safe_ends], -1)
    edge_ok = (new_ends >= 0).all(axis=0)
    pooled_edge_index = jnp.where(edge_ok[None, :], new_ends, cap)
    pooled_weight = None
    if edge_weight is not None:
        pooled_weight = jnp.where(edge_ok, jnp.asarray(edge_weight), 0.0)
    return pooled_x, pooled_edge_index, pooled_weight, pooled_ngi
