"""Halo (boundary-feature) exchange for edge-partitioned SpMM.

The baseline sharded SpMM all-gathers the full activation matrix over the
``graph`` axis (O(N·F) per device per layer). But each device only *reads*
the source rows its edges reference; with a partition-aware node order
(``partition.partition_order``) the set of remote rows ("halo") is far
smaller than N. This module precomputes, host-side, a fixed-capacity
exchange plan:

    send_idx [P, P, cap]  — device i sends x_local[send_idx[i, j]] to j
    loc_*    [P, EL]      — edges whose source row is device-local
    rem_*    [P, ER]      — edges reading a received halo row; ``rem_addr``
                            indexes the flattened [P·cap, F] receive buffer

and the device-side exchange is ONE ``jax.lax.all_to_all`` over ICI per
layer, with gradients flowing through its transpose automatically.

Splitting local from remote edges (instead of gathering from one
concatenated virtual array) matters for overlap: the local partial
aggregation has no data dependency on the collective, so XLA can run it
while the all_to_all is in flight on the ICI — the graph analogue of
overlapping attention compute with ring-exchange. Padded slots send row 0
and are never addressed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .partition import EdgePartition

__all__ = ["HaloSpec", "EllShard", "HaloSpecEll", "GatHaloSpecEll",
           "build_halo_spec", "build_gat_halo_spec", "halo_exchange",
           "halo_spmm_split", "halo_spmm_ell", "halo_gat_attention",
           "ell_plan_arrays", "ell_plan_specs", "gat_plan_arrays",
           "gat_plan_specs"]


class HaloSpec(NamedTuple):
    send_idx: np.ndarray   # [P, P, cap] int32 — local row ids to send (i → j)
    loc_row: np.ndarray    # [P, EL] int32 — destination (device-local)
    loc_col: np.ndarray    # [P, EL] int32 — source (device-local)
    loc_val: np.ndarray    # [P, EL] float32
    rem_row: np.ndarray    # [P, ER] int32 — destination (device-local)
    rem_addr: np.ndarray   # [P, ER] int32 — source address into recv flat
    rem_val: np.ndarray    # [P, ER] float32
    nodes_per_part: int
    capacity: int
    num_parts: int

    @property
    def halo_fraction(self) -> float:
        """Exchanged rows / full-all-gather rows (lower = better)."""
        total = self.num_parts * self.num_parts * self.capacity
        full = self.num_parts * self.num_parts * self.nodes_per_part
        return total / full


class EllShard(NamedTuple):
    """Per-device ELL packings of one edge block, stacked on a leading device
    dim ([P, ...]) so shard_map hands each device exactly its own layout.

    The arrays mirror :class:`~tf_geometric_tpu.ops.ell.EllAdj` (forward +
    transpose slots and sorted-COO tails, optional split diagonal); all
    devices share one slot width K and tail capacity (max over devices,
    padded with the row sentinel, which the segment ops drop). Static row /
    col counts are recovered from the array shapes inside shard_map.
    """

    slots_col: np.ndarray    # [P, num_rows, K] int32
    slots_val: np.ndarray    # [P, num_rows, K] float32
    tail_row: np.ndarray     # [P, T] int32 (sorted; sentinel = num_rows)
    tail_col: np.ndarray     # [P, T] int32
    tail_val: np.ndarray     # [P, T] float32
    t_slots_col: np.ndarray  # [P, num_cols, Kt] int32
    t_slots_val: np.ndarray  # [P, num_cols, Kt] float32
    t_tail_row: np.ndarray   # [P, Tt] int32 (sentinel = num_cols)
    t_tail_col: np.ndarray   # [P, Tt] int32
    t_tail_val: np.ndarray   # [P, Tt] float32
    diag_val: np.ndarray     # [P, num_rows] float32, or [P, 0] (no split)


class HaloSpecEll(NamedTuple):
    """Halo plan whose per-device edge blocks are ELL-packed (the production
    scatter-free SpMM layout — ops/ell.py, ~4× over COO gather+segment_sum
    on v5e). Built by ``build_halo_spec(part, layout="ell")``."""

    send_idx: np.ndarray     # [P, P, cap] int32 — as HaloSpec
    local: EllShard          # square [npp, npp] block, split diagonal
    remote: EllShard         # rectangular [npp, P·cap] block over recv slots
    nodes_per_part: int
    capacity: int
    num_parts: int

    @property
    def halo_fraction(self) -> float:
        total = self.num_parts * self.num_parts * self.capacity
        full = self.num_parts * self.num_parts * self.nodes_per_part
        return total / full


def _build_ell_shard(per_device_edges, num_rows: int, num_cols: int,
                     split_diag: bool) -> EllShard:
    """Pack each device's (rows, cols, vals) into an EllAdj with a COMMON
    slot width and tail capacity, then stack along the device dim."""
    import jax as _jax

    from ..ops.ell import EllAdj, _choose_k

    P_ = len(per_device_edges)
    total = sum(len(r) for r, _, _ in per_device_edges)
    K = _choose_k(max(total // max(P_, 1), 1), num_rows)
    ells = []
    for rows, cols, vals in per_device_edges:
        index = np.stack([np.asarray(rows, np.int64),
                          np.asarray(cols, np.int64)])
        ell = EllAdj.from_coo(index, np.asarray(vals, np.float32),
                              (num_rows, num_cols), k=K,
                              split_diag=split_diag)
        ells.append(_jax.tree.map(np.asarray, _jax.device_get(ell)))

    def stack_slots(name):  # same [num_rows|num_cols, K] shape everywhere
        return np.stack([getattr(e, name) for e in ells])

    def stack_tail(name, sentinel):  # ragged 1-D → common 128-multiple
        arrs = [getattr(e, name) for e in ells]
        longest = max((a.shape[0] for a in arrs), default=1)
        L = max(int(-(-longest // 128) * 128), 128)
        out = []
        for a in arrs:
            fill = sentinel if a.dtype.kind == "i" else 0
            out.append(np.concatenate(
                [a, np.full(L - a.shape[0], fill, a.dtype)]))
        return np.stack(out)

    # the row sentinel pads tails (segment ops drop it); devices without a
    # split diagonal get an explicit zero diag so shapes stay uniform
    diag = [np.asarray(e.diag_val) if e.diag_val.shape[0] else
            np.zeros(num_rows if split_diag else 0, np.float32) for e in ells]
    return EllShard(
        slots_col=stack_slots("slots_col"),
        slots_val=stack_slots("slots_val"),
        tail_row=stack_tail("tail_row", num_rows),
        tail_col=stack_tail("tail_col", 0),
        tail_val=stack_tail("tail_val", 0),
        t_slots_col=stack_slots("t_slots_col"),
        t_slots_val=stack_slots("t_slots_val"),
        t_tail_row=stack_tail("t_tail_row", num_cols),
        t_tail_col=stack_tail("t_tail_col", 0),
        t_tail_val=stack_tail("t_tail_val", 0),
        diag_val=np.stack(diag))


def ell_plan_arrays(spec: HaloSpecEll):
    """The ELL plan as jnp arrays in the order the sharded steps expect:
    (send_idx, 11 local block arrays, 11 remote block arrays)."""
    return tuple(jnp.asarray(a) for a in
                 (spec.send_idx,) + tuple(spec.local) + tuple(spec.remote))


def ell_plan_specs(spec: HaloSpecEll, graph_axis: str):
    """shard_map in_specs for :func:`ell_plan_arrays` (leading dim = device)."""
    from jax.sharding import PartitionSpec as P
    arrays = (spec.send_idx,) + tuple(spec.local) + tuple(spec.remote)
    return tuple(P(graph_axis, *([None] * (a.ndim - 1))) for a in arrays)


def _ell_adj_from_block(arrays):
    """Rebuild a device-local EllAdj from the 11 squeezed block arrays
    (shapes carry the static row/col counts)."""
    from ..ops.ell import EllAdj
    (sc, sv, tr, tc, tv, tsc, tsv, ttr, ttc, ttv, dv) = arrays
    return EllAdj(slots_col=sc, slots_val=sv, tail_row=tr, tail_col=tc,
                  tail_val=tv, t_slots_col=tsc, t_slots_val=tsv,
                  t_tail_row=ttr, t_tail_col=ttc, t_tail_val=ttv,
                  diag_val=dv if dv.shape[0] else None,
                  shape=(sc.shape[0], tsc.shape[0]))


def halo_spmm_ell(h_local, recv, plan_arrays):
    """Scatter-free local + remote partial aggregation on the packed layout.

    ``plan_arrays``: the 22 squeezed block arrays (11 local + 11 remote)
    from :func:`ell_plan_arrays` (send_idx excluded). As with
    :func:`halo_spmm_split`, the local half has no data dependency on
    ``recv`` so it overlaps the in-flight all_to_all.
    """
    from ..ops.ell import ell_spmm
    ell_loc = _ell_adj_from_block(plan_arrays[:11])
    ell_rem = _ell_adj_from_block(plan_arrays[11:])
    out = ell_spmm(ell_loc, h_local)
    recv_flat = recv.reshape(-1, h_local.shape[1])
    return out + ell_spmm(ell_rem, recv_flat)


def _pad2d(rows_list, fill, pad_multiple):
    """Stack ragged per-device 1-D arrays into [P, L] with padding."""
    L = max((len(r) for r in rows_list), default=0)
    L = max(int(-(-max(L, 1) // pad_multiple) * pad_multiple), pad_multiple)
    out = np.full((len(rows_list), L), fill, rows_list[0].dtype
                  if len(rows_list) else np.int32)
    for i, r in enumerate(rows_list):
        out[i, :len(r)] = r
    return out


def build_halo_spec(part: EdgePartition, capacity_multiple: int = 64,
                    pad_multiple: int = 128, layout: str = "coo"):
    """Host-side plan: per (owner → reader) unique remote rows padded to a
    common capacity, plus the per-device local/remote edge split.

    ``layout="coo"`` returns a :class:`HaloSpec` (gather + segment_sum
    aggregation); ``layout="ell"`` returns a :class:`HaloSpecEll` whose
    local/remote blocks are ELL-packed so the sharded steps run the same
    scatter-free production kernel ``bench.py`` measures single-chip
    (ops/ell.py — the 4× COO→ELL gap)."""
    if layout not in ("coo", "ell"):
        raise ValueError(f"layout must be 'coo' or 'ell', got {layout!r}")
    (send_idx, cap, loc_rows, loc_cols, loc_vals,
     rem_rows, rem_addrs, rem_vals) = _split_edges(part, capacity_multiple)
    P = part.num_parts
    npp = part.nodes_per_part

    if layout == "ell":
        local = _build_ell_shard(
            [(loc_rows[d], loc_cols[d], loc_vals[d]) for d in range(P)],
            npp, npp, split_diag=True)
        remote = _build_ell_shard(
            [(rem_rows[d], rem_addrs[d], rem_vals[d]) for d in range(P)],
            npp, P * cap, split_diag=False)
        return HaloSpecEll(send_idx=send_idx, local=local, remote=remote,
                           nodes_per_part=npp, capacity=cap, num_parts=P)

    return HaloSpec(
        send_idx=send_idx,
        loc_row=_pad2d(loc_rows, npp, pad_multiple),
        loc_col=_pad2d(loc_cols, 0, pad_multiple),
        loc_val=_pad2d(loc_vals, 0.0, pad_multiple),
        rem_row=_pad2d(rem_rows, npp, pad_multiple),
        rem_addr=_pad2d(rem_addrs, 0, pad_multiple),
        rem_val=_pad2d(rem_vals, 0.0, pad_multiple),
        nodes_per_part=npp, capacity=cap, num_parts=P)


def _split_edges(part: EdgePartition, capacity_multiple: int):
    """The shared halo-plan core: per (owner → reader) unique remote rows
    (send lists + receiver address maps) and the per-device local/remote
    edge split, as unpadded per-device lists."""
    P = part.num_parts
    npp = part.nodes_per_part

    needed = [[np.zeros(0, np.int64) for _ in range(P)] for _ in range(P)]
    valid_masks, owners_of = [], []
    for d in range(P):
        valid = part.local_row[d] < npp
        cols = part.global_col[d].astype(np.int64)
        owners = np.minimum(cols // npp, P - 1)
        valid_masks.append(valid)
        owners_of.append(owners)
        for o in range(P):
            if o == d:
                continue
            needed[o][d] = np.unique(cols[valid & (owners == o)])
    cap = max((len(needed[o][d]) for o in range(P) for d in range(P)), default=0)
    cap = max(int(-(-max(cap, 1) // capacity_multiple) * capacity_multiple),
              capacity_multiple)

    send_idx = np.zeros((P, P, cap), np.int32)
    # receiver-side address map: global id → slot in the flat [P·cap] recv
    addr_maps = [np.zeros(part.num_nodes_padded, np.int32) for _ in range(P)]
    for o in range(P):
        for d in range(P):
            rows = needed[o][d]
            send_idx[o, d, :len(rows)] = (rows - o * npp).astype(np.int32)
            addr_maps[d][rows] = o * cap + np.arange(len(rows), dtype=np.int32)

    loc_rows, loc_cols, loc_vals = [], [], []
    rem_rows, rem_addrs, rem_vals = [], [], []
    for d in range(P):
        valid, owners = valid_masks[d], owners_of[d]
        g = part.global_col[d].astype(np.int64)
        lsel = valid & (owners == d)
        rsel = valid & (owners != d)
        loc_rows.append(part.local_row[d][lsel])
        loc_cols.append((g[lsel] - d * npp).astype(np.int32))
        loc_vals.append(part.value[d][lsel])
        rem_rows.append(part.local_row[d][rsel])
        rem_addrs.append(addr_maps[d][g[rsel]])
        rem_vals.append(part.value[d][rsel])

    return (send_idx, cap, loc_rows, loc_cols, loc_vals,
            rem_rows, rem_addrs, rem_vals)


class GatHaloSpecEll(NamedTuple):
    """Halo plan for the FUSED sharded GAT: each device's edges (local +
    remote) are packed into one rectangular ELL layout over the concatenated
    source space ``[npp local rows ‖ P·cap recv slots]``, with the
    slot↔edge-id and transpose→forward position maps the fused attention
    kernel needs (ops/ell_attention.py). All arrays are stacked [P, ...];
    per-device edge counts are padded to a common ``num_edges``.
    """

    send_idx: np.ndarray     # [P, P, cap] int32
    slots_col: np.ndarray    # [P, npp, K] int32
    slot_eid: np.ndarray     # [P, npp, K] int32 (sentinel = num_edges)
    tail_row: np.ndarray     # [P, T] int32 (sorted; sentinel = npp)
    tail_col: np.ndarray     # [P, T] int32
    t_slots_col: np.ndarray  # [P, S, K] int32, S = npp + P·cap
    t_slot_pos: np.ndarray   # [P, S, K] int32 (fwd flat positions)
    t_tail_row: np.ndarray   # [P, Tt] int32 (sentinel = S)
    t_tail_col: np.ndarray   # [P, Tt] int32
    t_tail_pos: np.ndarray   # [P, Tt] int32
    num_edges: int           # per-device padded edge count (eid sentinel)
    nodes_per_part: int
    capacity: int
    num_parts: int


def build_gat_halo_spec(part: EdgePartition,
                        capacity_multiple: int = 64) -> GatHaloSpecEll:
    """Host-side fused-GAT halo plan from an edge partition of the
    (self-looped) attention graph. Edge values are ignored — GAT weights are
    dynamic attention coefficients (reference nn/conv/gat.py:49-89), so the
    partition should be built from the unweighted self-looped edge list.
    """
    import jax as _jax

    from ..ops.ell import EllAdj, _choose_k
    from ..ops.ell_attention import build_gat_layout

    (send_idx, cap, loc_rows, loc_cols, _lv,
     rem_rows, rem_addrs, _rv) = _split_edges(part, capacity_multiple)
    P = part.num_parts
    npp = part.nodes_per_part
    S = npp + P * cap

    rows_d, cols_d = [], []
    for d in range(P):
        rows_d.append(np.concatenate([loc_rows[d], rem_rows[d]]).astype(np.int64))
        cols_d.append(np.concatenate([loc_cols[d].astype(np.int64),
                                      npp + rem_addrs[d].astype(np.int64)]))
    E_cap = max(int(-(-max(len(r) for r in rows_d) // 128) * 128), 128)
    total = sum(len(r) for r in rows_d)
    K = _choose_k(max(total // max(P, 1), 1), npp)

    ells = []
    for d in range(P):
        pad = E_cap - len(rows_d[d])
        # padded edges: OOB row → dropped by from_coo; eids land on the
        # sentinel automatically (num_edges = E_cap on every device)
        rows = np.concatenate([rows_d[d], np.full(pad, npp, np.int64)])
        cols = np.concatenate([cols_d[d], np.zeros(pad, np.int64)])
        ell = EllAdj.from_coo(np.stack([rows, cols]),
                              np.ones(E_cap, np.float32), (npp, S), k=K)
        ells.append(_jax.tree.map(np.asarray, _jax.device_get(ell)))

    T = max(int(-(-max(e.tail_row.shape[0] for e in ells) // 128) * 128), 128)
    Tt = max(int(-(-max(e.t_tail_row.shape[0] for e in ells) // 128) * 128),
             128)

    def pad_tail(a, L, sentinel):
        fill = sentinel if a.dtype.kind == "i" else 0
        return np.concatenate([a, np.full(L - a.shape[0], fill, a.dtype)])

    stacked = {k: [] for k in ("slots_col", "slot_eid", "tail_row", "tail_col",
                               "t_slots_col", "t_slot_pos", "t_tail_row",
                               "t_tail_col", "t_tail_pos")}
    for e in ells:
        # equalize tail capacities BEFORE building the position maps so the
        # flat zero-row offset (npp·K + T) is identical on every device
        kw = {n: getattr(e, n) for n in EllAdj._LEAVES}
        kw.update(
            tail_row=pad_tail(e.tail_row, T, npp),
            tail_col=pad_tail(e.tail_col, T, 0),
            tail_val=pad_tail(e.tail_val, T, 0),
            tail_eid=pad_tail(e.tail_eid, T, E_cap),
            t_tail_row=pad_tail(e.t_tail_row, Tt, S),
            t_tail_col=pad_tail(e.t_tail_col, Tt, 0),
            t_tail_val=pad_tail(e.t_tail_val, Tt, 0),
            t_tail_eid=pad_tail(e.t_tail_eid, Tt, E_cap),
            shape=(npp, S), num_edges=E_cap)
        padded = EllAdj(**kw)
        layout = build_gat_layout(padded)
        stacked["slots_col"].append(np.asarray(padded.slots_col))
        stacked["slot_eid"].append(np.asarray(padded.slot_eid))
        stacked["tail_row"].append(np.asarray(padded.tail_row))
        stacked["tail_col"].append(np.asarray(padded.tail_col))
        stacked["t_slots_col"].append(np.asarray(padded.t_slots_col))
        stacked["t_slot_pos"].append(np.asarray(layout.t_slot_pos))
        stacked["t_tail_row"].append(np.asarray(padded.t_tail_row))
        stacked["t_tail_col"].append(np.asarray(padded.t_tail_col))
        stacked["t_tail_pos"].append(np.asarray(layout.t_tail_pos))

    return GatHaloSpecEll(
        send_idx=send_idx,
        **{k: np.stack(v) for k, v in stacked.items()},
        num_edges=E_cap, nodes_per_part=npp, capacity=cap, num_parts=P)


def gat_plan_arrays(spec: GatHaloSpecEll):
    """The fused-GAT plan as jnp arrays (send_idx + 9 layout arrays)."""
    return tuple(jnp.asarray(a) for a in spec[:10])


def gat_plan_specs(spec: GatHaloSpecEll, graph_axis: str):
    from jax.sharding import PartitionSpec as P
    return tuple(P(graph_axis, *([None] * (a.ndim - 1))) for a in spec[:10])


def halo_gat_attention(Q, K_src, V_src, plan_arrays, num_edges: int,
                       num_heads: int, edge_drop_rate: float = 0.0,
                       training: bool = False, dropout_key=None):
    """Fused scatter-free GAT attention over a device's rectangular halo
    layout (the 9 squeezed arrays from :func:`gat_plan_arrays`, send_idx
    excluded). ``Q``: [npp, H·d] (local destination rows); ``K_src``/
    ``V_src``: [npp + P·cap, H·d] — local rows then received halo rows.
    Scores, destination softmax, attention dropout and aggregation run in
    the single fused kernel ``bench.py`` measures (ops/ell_attention.py).
    """
    from ..ops.ell import EllAdj
    from ..ops.ell_attention import GatEllLayout, gat_attention_ell
    (sc, se, tr, tc, tsc, tsp, ttr, ttc, ttp) = plan_arrays
    ell = EllAdj(slots_col=sc, slot_eid=se, tail_row=tr, tail_col=tc,
                 t_slots_col=tsc, t_tail_row=ttr, t_tail_col=ttc,
                 shape=(sc.shape[0], tsc.shape[0]), num_edges=num_edges)
    layout = GatEllLayout(ell=ell, eid_pos=None, t_slot_pos=tsp,
                          t_tail_pos=ttp)
    return gat_attention_ell(layout, Q, K_src, V_src, num_heads,
                             edge_drop_rate=edge_drop_rate, training=training,
                             dropout_key=dropout_key)


def halo_exchange(h_local, send_idx_local, axis_name: str):
    """Inside shard_map: exchange boundary rows with every peer.

    h_local: [npp, F]; send_idx_local: [P, cap] (this device's send lists).
    Returns recv: [P, cap, F] — rows from each owner, in plan order.
    """
    P = send_idx_local.shape[0]
    send = jnp.take(h_local, jnp.clip(send_idx_local.reshape(-1), 0,
                                      h_local.shape[0] - 1), axis=0)
    send = send.reshape(P, send_idx_local.shape[1], h_local.shape[1])
    # all_to_all: block j of my send buffer goes to device j; I receive
    # block me from every owner → [P, cap, F]
    return jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)


def halo_spmm_split(h_local, recv, loc_row, loc_col, loc_val,
                    rem_row, rem_addr, rem_val, nodes_per_part: int):
    """Local + remote partial aggregation. The local half reads only
    ``h_local`` — no dependency on ``recv`` — so it overlaps the all_to_all."""
    local_msg = jnp.take(h_local, jnp.clip(loc_col, 0, h_local.shape[0] - 1),
                         axis=0) * loc_val[:, None]
    out = jax.ops.segment_sum(local_msg, loc_row, num_segments=nodes_per_part)
    recv_flat = recv.reshape(-1, h_local.shape[1])
    rem_msg = jnp.take(recv_flat, jnp.clip(rem_addr, 0, recv_flat.shape[0] - 1),
                       axis=0) * rem_val[:, None]
    return out + jax.ops.segment_sum(rem_msg, rem_row,
                                     num_segments=nodes_per_part)
