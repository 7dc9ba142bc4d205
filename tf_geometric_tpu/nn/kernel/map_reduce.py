"""The single message-passing primitive: gather → map → segment-reduce → update.

TPU-native counterpart of the reference's map-reduce kernel
(``tf_geometric/nn/kernel/map_reduce.py:7-73``): gather source/destination
features along the edge list, apply a ``mapper`` per edge, reduce messages per
destination with a segment op, and combine with an ``updater``.

Edge-index convention (same as the reference): ``edge_index[0] = row`` is the
**destination** that aggregates, ``edge_index[1] = col`` is the **source**
neighbor whose features flow along the edge.

Everything here is shape-static and jit-safe: ``num_nodes`` is a Python int,
padded edges use out-of-range row ids and are dropped by the scatter.
"""
from __future__ import annotations

import jax.numpy as jnp

from .segment import segment_max, segment_mean, segment_min, segment_sum

__all__ = [
    "identity_mapper",
    "neighbor_count_mapper",
    "gcn_mapper",
    "sum_reducer",
    "mean_reducer",
    "max_reducer",
    "min_reducer",
    "identity_updater",
    "sum_updater",
    "aggregate_neighbors",
]


# ---------------------------------------------------------------------------
# Mappers: (repeated_x, neighbor_x, edge_weight) -> messages  [E, F]
# ---------------------------------------------------------------------------

def identity_mapper(repeated_x, neighbor_x, edge_weight=None):
    """Pass neighbor features through unchanged (map_reduce.py:7-8)."""
    return neighbor_x


def neighbor_count_mapper(repeated_x, neighbor_x, edge_weight=None):
    """Ones per edge — reduces to the neighbor count (map_reduce.py:11-12)."""
    return jnp.ones((neighbor_x.shape[0], 1))


def gcn_mapper(repeated_x, neighbor_x, edge_weight=None):
    """Scale neighbor features by the (normalized) edge weight (gcn.py:23-29)."""
    if edge_weight is None:
        return neighbor_x
    return neighbor_x * jnp.expand_dims(edge_weight, -1)


# ---------------------------------------------------------------------------
# Reducers: (messages, row, num_nodes) -> aggregated  [N, F]
# ---------------------------------------------------------------------------

def sum_reducer(neighbor_msg, node_index, num_nodes: int):
    """Per-destination segment sum (reference map_reduce.py:19-21)."""
    return segment_sum(neighbor_msg, node_index, num_nodes)


def mean_reducer(neighbor_msg, node_index, num_nodes: int):
    """Per-destination segment mean (reference map_reduce.py:24-26)."""
    return segment_mean(neighbor_msg, node_index, num_nodes)


def max_reducer(neighbor_msg, node_index, num_nodes: int):
    """Per-destination segment max, zero-filled (reference map_reduce.py:29-36)."""
    return segment_max(neighbor_msg, node_index, num_nodes)


def min_reducer(neighbor_msg, node_index, num_nodes: int):
    """Per-destination segment min, zero-filled (reference map_reduce.py:29-42)."""
    return segment_min(neighbor_msg, node_index, num_nodes)


# ---------------------------------------------------------------------------
# Updaters: (x, reduced_msg) -> output  [N, F]
# ---------------------------------------------------------------------------

def identity_updater(x, reduced_neighbor_msg):
    """Return the reduced messages unchanged (reference map_reduce.py:45-46)."""
    return reduced_neighbor_msg


def sum_updater(x, reduced_neighbor_msg):
    """x + reduced messages (reference map_reduce.py:49-50)."""
    return x + reduced_neighbor_msg


# ---------------------------------------------------------------------------
# The primitive
# ---------------------------------------------------------------------------

def aggregate_neighbors(
    x,
    edge_index,
    edge_weight=None,
    mapper=identity_mapper,
    reducer=sum_reducer,
    updater=identity_updater,
    num_nodes: int | None = None,
):
    """Aggregate neighbor features along an edge list.

    Mirrors reference ``aggregate_neighbors`` (map_reduce.py:45-73): messages
    flow col → row; ``reducer`` is keyed on ``row``.

    Args:
        x: ``[N, F]`` node features.
        edge_index: ``[2, E]`` int array, rows = (destination, source).
        edge_weight: optional ``[E]`` float weights fed to the mapper.
        num_nodes: static node count; defaults to ``x.shape[0]``.
    """
    if num_nodes is None:
        num_nodes = x.shape[0]
    row, col = edge_index[0], edge_index[1]
    # Clip the *gather* side so padded (out-of-range) cols read row 0; the
    # scatter side is left unclipped so padded rows are dropped by XLA.
    safe_col = jnp.clip(col, 0, x.shape[0] - 1)
    repeated_x = jnp.take(x, jnp.clip(row, 0, x.shape[0] - 1), axis=0)
    neighbor_x = jnp.take(x, safe_col, axis=0)
    neighbor_msg = mapper(repeated_x, neighbor_x, edge_weight=edge_weight)
    reduced_msg = reducer(neighbor_msg, row, num_nodes)
    return updater(x, reduced_msg)
