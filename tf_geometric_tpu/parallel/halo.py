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

__all__ = ["HaloSpec", "build_halo_spec", "halo_exchange", "halo_spmm_split"]


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
                    pad_multiple: int = 128) -> HaloSpec:
    """Host-side plan: per (owner → reader) unique remote rows padded to a
    common capacity, plus the per-device local/remote edge split."""
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

    return HaloSpec(
        send_idx=send_idx,
        loc_row=_pad2d(loc_rows, npp, pad_multiple),
        loc_col=_pad2d(loc_cols, 0, pad_multiple),
        loc_val=_pad2d(loc_vals, 0.0, pad_multiple),
        rem_row=_pad2d(rem_rows, npp, pad_multiple),
        rem_addr=_pad2d(rem_addrs, 0, pad_multiple),
        rem_val=_pad2d(rem_vals, 0.0, pad_multiple),
        nodes_per_part=npp, capacity=cap, num_parts=P)


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
