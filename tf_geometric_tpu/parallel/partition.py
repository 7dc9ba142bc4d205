"""Graph partitioning for multi-chip execution.

The reference's only distributed story is whole-graph replication via
MirroredStrategy (SURVEY §2.8). The TPU-native replacement partitions the
graph itself: nodes are sharded into contiguous row blocks (one per device),
and edges are assigned to the device owning their **destination** row, so the
segment-reduction (scatter) side of every SpMM is purely local; only the
gather side needs remote node features (halo exchange / all-gather over ICI).

Partition quality matters for the halo volume. ``partition_order`` is the
METIS-role partitioner (LPA communities → block-aligned bin-packing →
capacity-constrained refinement); ``community_order`` and
``bandwidth_reduction_order`` are the cheaper ordering-only alternatives.

All outputs are padded to identical per-device sizes — static shapes are
mandatory under ``shard_map``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from ..utils.union_utils import convert_union_to_numpy

__all__ = ["EdgePartition", "partition_edges_by_row", "bandwidth_reduction_order",
           "community_order", "partition_order", "apply_node_permutation"]


def nodes_per_part(num_nodes: int, num_parts: int) -> int:
    """The uniform per-device node-block size (rounded up to a multiple of 8
    so every shard tiles cleanly); shared by the partitioner and the
    orderings that align to its block boundaries."""
    npp = -(-num_nodes // num_parts)
    return -(-npp // 8) * 8


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

    npp_ = nodes_per_part(num_nodes, num_parts)
    owner = edge_index[0] // npp_
    owner = np.minimum(owner, num_parts - 1)

    counts = np.bincount(owner, minlength=num_parts)
    e_pad = int(-(-counts.max() // pad_multiple) * pad_multiple) if counts.size else pad_multiple

    local_row = np.full((num_parts, e_pad), npp_, np.int32)  # padded → dropped
    global_col = np.zeros((num_parts, e_pad), np.int32)
    value = np.zeros((num_parts, e_pad), np.float32)
    for p in range(num_parts):
        sel = owner == p
        k = int(sel.sum())
        local_row[p, :k] = (edge_index[0][sel] - p * npp_).astype(np.int32)
        global_col[p, :k] = edge_index[1][sel].astype(np.int32)
        value[p, :k] = edge_weight[sel]
    return EdgePartition(local_row, global_col, value,
                         npp_, num_parts, num_parts * npp_)


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
    labels = _community_labels(edge_index, num_nodes, num_iters, seed)
    return _labels_to_order(labels, num_nodes)


def _community_labels(edge_index, num_nodes: int, num_iters: int = 8,
                      seed: int = 0) -> np.ndarray:
    """Majority-vote label-propagation community labels (native C++ sweep
    when available, vectorized numpy otherwise)."""
    edge_index = convert_union_to_numpy(edge_index, np.int64)
    row, col = edge_index[0], edge_index[1]
    from .. import native
    if native.available():
        order = native.sort_by_row(row, num_nodes)
        row_ptr = native.build_row_ptr(row, num_nodes)
        labels = native.lpa_labels(row_ptr, col[order].astype(np.int32),
                                   num_nodes, num_iters)
        if labels is not None:
            return labels
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
    return labels


def partition_order(edge_index, num_nodes: int, num_parts: int,
                    num_iters: int = 8, refine_iters: int = 8,
                    seed: int = 0) -> np.ndarray:
    """Balanced, block-aligned graph partition → node permutation.

    ``community_order`` only groups communities contiguously — a community
    that happens to straddle a device-block boundary pays its FULL internal
    edge volume as halo. This partitioner targets the blocks directly
    (the METIS role in SURVEY §7 step 8, built the social-hash way):

    1. LPA community labels;
    2. first-fit-decreasing bin-packing of communities into ``num_parts``
       bins with exactly the block capacities ``partition_edges_by_row``
       will use (so bin == device block, no straddling);
    3. capacity-constrained refinement sweeps: every node may move to the
       part holding most of its (undirected) neighbors when the target has
       slack — boundary cleanup the packing can't see;
    4. exactness repair back to the precise per-block sizes.

    Returns ``perm`` with ``perm[old_id] = new_id``; feed the permuted graph
    to ``partition_edges_by_row(..., num_parts)`` with the same
    ``num_parts``. Host-side, O(E · refine_iters).
    """
    edge_index = convert_union_to_numpy(edge_index, np.int64)
    P = int(num_parts)
    N = int(num_nodes)
    if P <= 1 or N == 0:
        return np.arange(N, dtype=np.int64)
    npp = nodes_per_part(N, P)
    caps = np.array([max(0, min(npp, N - p * npp)) for p in range(P)], np.int64)

    labels = _community_labels(edge_index, N, num_iters, seed)

    # --- 2. pack communities into parts (largest community first, into the
    # part with most remaining room; oversized communities split greedily) ---
    comm_ids, comm_inv, comm_sizes = np.unique(labels, return_inverse=True,
                                               return_counts=True)
    node_by_comm = np.argsort(comm_inv, kind="stable")
    starts = np.zeros(len(comm_ids) + 1, np.int64)
    np.cumsum(comm_sizes, out=starts[1:])
    part = np.full(N, -1, np.int64)
    room = caps.copy()
    for c in np.argsort(-comm_sizes):
        members = node_by_comm[starts[c]:starts[c + 1]]
        off = 0
        while off < len(members):
            p = int(np.argmax(room))
            take = min(int(room[p]), len(members) - off)
            if take <= 0:
                break
            part[members[off:off + take]] = p
            room[p] -= take
            off += take

    # symmetric edge list (each endpoint sees the other) for gain counting
    row = np.concatenate([edge_index[0], edge_index[1]])
    col = np.concatenate([edge_index[1], edge_index[0]])
    keep = row != col
    row, col = row[keep], col[keep]
    slack = max(8, npp // 64)

    from .. import native
    if native.available():
        # C++ sweeps + exactness repair over a symmetric CSR (OpenMP gains)
        row32 = row.astype(np.int32)
        order_e = native.sort_by_row(row32, N)
        row_ptr = native.build_row_ptr(row32, N)
        part32 = np.ascontiguousarray(part, np.int32)
        moved = native.partition_refine(row_ptr, col[order_e].astype(np.int32),
                                        part32, caps, slack, refine_iters)
        if moved is not None:
            order = np.lexsort((np.arange(N), part32))
            perm = np.empty(N, np.int64)
            perm[order] = np.arange(N)
            return perm

    def neighbor_part_counts(assign):
        cnt = np.zeros((N, P), np.int32)
        np.add.at(cnt.reshape(-1), row * P + assign[col], 1)
        return cnt

    # --- 3. refinement sweeps with bounded slack (numpy fallback) ---
    fill = np.bincount(part, minlength=P)
    for _ in range(refine_iters):
        cnt = neighbor_part_counts(part)
        cur = cnt[np.arange(N), part]
        best = cnt.argmax(axis=1)
        gain = cnt.max(axis=1) - cur
        movers = np.nonzero((best != part) & (gain > 0))[0]
        if len(movers) == 0:
            break
        moved = 0
        for n in movers[np.argsort(-gain[movers])]:
            b = best[n]
            if fill[b] < caps[b] + slack:
                fill[part[n]] -= 1
                fill[b] += 1
                part[n] = b
                moved += 1
        if moved == 0:
            break

    # --- 4. exactness repair: drain overfull parts into underfull ones,
    # evicting the nodes that lose the least locality ---
    cnt = neighbor_part_counts(part)
    for p in range(P):
        excess = int(fill[p] - caps[p])
        if excess <= 0:
            continue
        under = np.nonzero(fill < caps)[0]
        members = np.nonzero(part == p)[0]
        # best underfull target per member, by neighbors kept
        tgt_cnt = cnt[members][:, under]
        tgt_pick = tgt_cnt.argmax(axis=1)
        score = tgt_cnt[np.arange(len(members)), tgt_pick] - cnt[members, p]
        for i in np.argsort(-score):
            if excess == 0:
                break
            t = int(under[tgt_pick[i]])
            if fill[t] >= caps[t]:
                # recompute this member's target among still-underfull parts
                open_parts = np.nonzero(fill < caps)[0]
                if len(open_parts) == 0:
                    break
                t = int(open_parts[cnt[members[i]][open_parts].argmax()])
            n = members[i]
            fill[p] -= 1
            fill[t] += 1
            part[n] = t
            excess -= 1

    order = np.lexsort((np.arange(N), part))  # old ids, part-major
    perm = np.empty(N, np.int64)
    perm[order] = np.arange(N)
    return perm


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
