"""Halo (boundary-feature) exchange for edge-partitioned SpMM.

The baseline sharded SpMM all-gathers the full activation matrix over the
``graph`` axis (O(N·F) per device per layer). But each device only *reads*
the source rows its edges reference; with a locality-improving node order
(RCM — see ``partition.bandwidth_reduction_order``) the set of remote rows
("halo") is far smaller than N. This module precomputes, host-side, a
fixed-capacity exchange plan:

    send_idx [P, P, cap]  — device i sends x_local[send_idx[i, j]] to j
    col_addr [P, E_pad]   — edge source addresses remapped into the
                            device-local virtual array
                            [x_local ‖ recv_from_0 ‖ … ‖ recv_from_P-1]

and the device-side exchange is ONE ``jax.lax.all_to_all`` over ICI per
layer, with gradients flowing through its transpose automatically. Padded
slots send row 0 and are never addressed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .partition import EdgePartition

__all__ = ["HaloSpec", "build_halo_spec", "halo_exchange", "halo_spmm_local"]


class HaloSpec(NamedTuple):
    send_idx: np.ndarray    # [P, P, cap] int32 — local row ids to send (i → j)
    col_addr: np.ndarray    # [P, E_pad] int32 — per-edge virtual address
    local_row: np.ndarray   # [P, E_pad] int32 (copied from the partition)
    value: np.ndarray       # [P, E_pad] float32
    nodes_per_part: int
    capacity: int
    num_parts: int

    @property
    def halo_fraction(self) -> float:
        """Exchanged rows / full-all-gather rows (lower = better)."""
        total = self.num_parts * self.num_parts * self.capacity
        full = self.num_parts * self.num_parts * self.nodes_per_part
        return total / full


def build_halo_spec(part: EdgePartition, capacity_multiple: int = 64) -> HaloSpec:
    """Host-side plan: per (owner → reader) unique remote rows, padded to a
    common capacity."""
    P = part.num_parts
    npp = part.nodes_per_part

    needed = [[np.zeros(0, np.int64) for _ in range(P)] for _ in range(P)]
    for d in range(P):
        cols = part.global_col[d][part.local_row[d] < npp]
        owners = np.minimum(cols // npp, P - 1)
        for o in range(P):
            if o == d:
                continue
            needed[o][d] = np.unique(cols[owners == o])
    cap = max((len(needed[o][d]) for o in range(P) for d in range(P)), default=0)
    cap = max(int(-(-max(cap, 1) // capacity_multiple) * capacity_multiple), capacity_multiple)

    send_idx = np.zeros((P, P, cap), np.int32)
    # receiver-side lookup: for device d, rows received from owner o occupy
    # virtual addresses npp + o*cap + slot
    addr_lookup = [dict() for _ in range(P)]
    for o in range(P):
        for d in range(P):
            rows = needed[o][d]
            send_idx[o, d, :len(rows)] = (rows - o * npp).astype(np.int32)
            for slot, g in enumerate(rows):
                addr_lookup[d][int(g)] = npp + o * cap + slot

    col_addr = np.zeros((P, part.global_col.shape[1]), np.int32)
    for d in range(P):
        lo, hi = d * npp, (d + 1) * npp
        for e in range(part.global_col.shape[1]):
            if part.local_row[d, e] >= npp:
                col_addr[d, e] = 0  # padded edge: value 0, address irrelevant
                continue
            g = int(part.global_col[d, e])
            if lo <= g < hi:
                col_addr[d, e] = g - lo
            else:
                col_addr[d, e] = addr_lookup[d][g]
    return HaloSpec(send_idx, col_addr, part.local_row, part.value,
                    npp, cap, P)


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


def halo_spmm_local(h_local, recv, col_addr, local_row, value,
                    nodes_per_part: int):
    """Local SpMM over the virtual array [h_local ‖ recv.reshape(-1, F)]."""
    virtual = jnp.concatenate(
        [h_local, recv.reshape(-1, h_local.shape[1])], axis=0)
    msg = jnp.take(virtual, jnp.clip(col_addr, 0, virtual.shape[0] - 1),
                   axis=0) * value[:, None]
    return jax.ops.segment_sum(msg, local_row, num_segments=nodes_per_part)
