"""Graph partitioning for multi-chip execution.

The reference's only distributed story is whole-graph replication via
MirroredStrategy (SURVEY §2.8). The TPU-native replacement partitions the
graph itself: nodes are sharded into contiguous row blocks (one per device),
and edges are assigned to the device owning their **destination** row, so the
segment-reduction (scatter) side of every SpMM is purely local; only the
gather side needs remote node features (halo exchange / all-gather over ICI).

Partition quality matters for the halo volume; ``reorder_by_degree`` and the
locality-aware ``bandwidth_reduction_order`` below cheaply shrink the halo
before the (optional) METIS-style refinement lands.

All outputs are padded to identical per-device sizes — static shapes are
mandatory under ``shard_map``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from ..utils.union_utils import convert_union_to_numpy

__all__ = ["EdgePartition", "partition_edges_by_row", "bandwidth_reduction_order",
           "community_order", "apply_node_permutation"]


class EdgePartition(NamedTuple):
    """Per-device edge shards, shaped [num_parts, edges_per_part].

    ``local_row`` is the destination row id *within* the owning device's node
    block; ``global_col`` indexes the unpartitioned node space (resolved
    against the all-gathered feature matrix). Padded entries use
    ``local_row = nodes_per_part`` (out of range → dropped) and value 0.
    """

    local_row: np.ndarray    # [P, E_pad] int32
    global_col: np.ndarray   # [P, E_pad] int32
    value: np.ndarray        # [P, E_pad] float32
    nodes_per_part: int
    num_parts: int
    num_nodes_padded: int    # num_parts * nodes_per_part


def partition_edges_by_row(edge_index, edge_weight, num_nodes: int,
                           num_parts: int, pad_multiple: int = 128) -> EdgePartition:
    """Assign each edge to the device owning its destination row block."""
    edge_index = convert_union_to_numpy(edge_index, np.int64)
    if edge_weight is None:
        edge_weight = np.ones(edge_index.shape[1], np.float32)
    edge_weight = convert_union_to_numpy(edge_weight, np.float32)

    nodes_per_part = -(-num_nodes // num_parts)
    # round node block up so every device owns the same count
    nodes_per_part = -(-nodes_per_part // 8) * 8
    owner = edge_index[0] // nodes_per_part
    owner = np.minimum(owner, num_parts - 1)

    counts = np.bincount(owner, minlength=num_parts)
    e_pad = int(-(-counts.max() // pad_multiple) * pad_multiple) if counts.size else pad_multiple

    local_row = np.full((num_parts, e_pad), nodes_per_part, np.int32)  # padded → dropped
    global_col = np.zeros((num_parts, e_pad), np.int32)
    value = np.zeros((num_parts, e_pad), np.float32)
    for p in range(num_parts):
        sel = owner == p
        k = int(sel.sum())
        local_row[p, :k] = (edge_index[0][sel] - p * nodes_per_part).astype(np.int32)
        global_col[p, :k] = edge_index[1][sel].astype(np.int32)
        value[p, :k] = edge_weight[sel]
    return EdgePartition(local_row, global_col, value,
                         nodes_per_part, num_parts, num_parts * nodes_per_part)


def bandwidth_reduction_order(edge_index, num_nodes: int) -> np.ndarray:
    """Locality-improving node permutation (BFS / reverse-Cuthill-McKee-style):
    returns ``perm`` with ``perm[old_id] = new_id``. Contiguous row blocks of
    the permuted graph then cut far fewer cross-device edges than raw ids —
    the cheap stand-in for METIS partitioning (SURVEY §7 step 8)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    edge_index = convert_union_to_numpy(edge_index, np.int64)
    data = np.ones(edge_index.shape[1], np.int8)
    adj = sp.csr_matrix((data, (edge_index[0], edge_index[1])),
                        shape=(num_nodes, num_nodes))
    adj = adj + adj.T
    order = reverse_cuthill_mckee(adj, symmetric_mode=True)  # new_id -> old_id
    perm = np.empty(num_nodes, np.int64)
    perm[order] = np.arange(num_nodes)
    return perm


def community_order(edge_index, num_nodes: int, num_iters: int = 8,
                    seed: int = 0) -> np.ndarray:
    """Label-propagation community detection → permutation grouping
    communities contiguously (``perm[old] = new``).

    The lightweight METIS substitute for halo reduction: on community-
    structured graphs (citation networks, SBMs) contiguous row blocks of the
    permuted graph then keep most edges device-local. Majority-vote LPA,
    fully vectorized.
    """
    edge_index = convert_union_to_numpy(edge_index, np.int64)
    row, col = edge_index[0], edge_index[1]
    from .. import native
    if native.available():
        order = native.sort_by_row(row, num_nodes)
        row_ptr = native.build_row_ptr(row, num_nodes)
        labels = native.lpa_labels(row_ptr, col[order].astype(np.int32),
                                   num_nodes, num_iters)
    else:
        labels = None
    if labels is not None:
        return _labels_to_order(labels, num_nodes)
    labels = np.arange(num_nodes, dtype=np.int64)
    rng = np.random.default_rng(seed)
    for _ in range(num_iters):
        neigh_label = labels[col]
        # majority label per node: count (row, label) pairs
        pair = row * num_nodes + neigh_label
        uniq, counts = np.unique(pair, return_counts=True)
        u_row = uniq // num_nodes
        u_lab = uniq % num_nodes
        # tie-break randomly but deterministically
        jitter = rng.random(len(uniq)) * 0.5
        order = np.lexsort((-(counts + jitter), u_row))
        first = np.ones(len(order), bool)
        sorted_rows = u_row[order]
        first[1:] = sorted_rows[1:] != sorted_rows[:-1]
        best_rows = sorted_rows[first]
        best_labels = u_lab[order][first]
        new_labels = labels.copy()
        new_labels[best_rows] = best_labels
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return _labels_to_order(labels, num_nodes)


def _labels_to_order(labels: np.ndarray, num_nodes: int) -> np.ndarray:
    """Communities contiguous, large communities first for balanced blocks."""
    comm_ids, comm_inverse, comm_sizes = np.unique(labels, return_inverse=True,
                                                   return_counts=True)
    comm_rank = np.argsort(np.argsort(-comm_sizes))
    sort_key = comm_rank[comm_inverse]
    order = np.lexsort((np.arange(num_nodes), sort_key))  # old ids in new order
    perm = np.empty(num_nodes, np.int64)
    perm[order] = np.arange(num_nodes)
    return perm


def apply_node_permutation(graph, perm):
    """Relabel a Graph's nodes by ``perm[old] = new`` (host-side)."""
    from ..data.graph import Graph
    x = convert_union_to_numpy(graph.x)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    new_x = x[inv]
    ei = convert_union_to_numpy(graph.edge_index, np.int64)
    new_ei = perm[ei].astype(np.int32)
    y = convert_union_to_numpy(graph.y)
    new_y = None if y is None else (y[inv] if y.shape[:1] == x.shape[:1] else y)
    ew = convert_union_to_numpy(graph.edge_weight)
    return Graph(new_x, new_ei, new_y, ew), inv
