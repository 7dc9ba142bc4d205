"""Pallas sorted-segment reduction: scatter → one-hot MXU matmul.

XLA lowers ``segment_sum`` to a scatter, which serializes on TPU
(transaction-bound, ~4-5ns/row). For **row-sorted** edge messages the
reduction can instead ride the MXU:

1. Host planning (``plan_sorted_segments``): split the sorted edge stream
   into chunks of ``CHUNK`` edges; within each chunk, give every edge a
   *rank* = index of its distinct row within the chunk (≤ CHUNK ranks), and
   record which global row each (chunk, rank) slot maps to.
2. Pallas kernel: per chunk, build the one-hot [CHUNK, CHUNK] rank matrix
   with a broadcasted-iota compare (VPU) and contract it with the message
   block [CHUNK, F] on the MXU → per-rank partial sums.
3. A final (tiny, ~num_rows-sized) sorted segment-sum folds the per-chunk
   partials into the output — the scatter shrinks from E rows to
   ~num_rows + num_chunks rows.

MEASURED ON HARDWARE (v5e, arxiv scale E=1.33M F=128 — see
benchmarks/pallas_segment_tpu.py): XLA sorted segment_sum 12.2-13.3 ms,
this kernel 21.4-23.6 ms (f32/bf16). The design loses because the fold in
step 3 still runs over all ``num_chunks·CHUNK = E_pad`` partial rows — the
scatter never shrinks unless chunks are re-cut by distinct-row count
(≤R ranks per chunk), which buys at most ~4× fold reduction at mean degree
8 while keeping the 174-GFLOP one-hot contraction. Since every production
hot path is already scatter-free on the ELL layout (ops/ell.py), the
kernel is kept as an oracle-tested reference implementation, not
dispatched. Correctness is validated in interpret mode (tests/test_ell.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["plan_sorted_segments", "pallas_sorted_segment_sum",
           "sorted_segment_sum_mxu"]

CHUNK = 512
GROUP = 8  # chunks per pallas program (TPU sublane tiling wants 8)


def plan_sorted_segments(rows_sorted, num_rows: int, chunk: int = CHUNK):
    """Host-side plan for a row-sorted edge stream.

    Returns (rank [E_pad], slot_row [num_chunks·chunk]) where ``rank[e]`` is
    the within-chunk distinct-row index of edge e and ``slot_row`` maps each
    (chunk, rank) slot to its global row (sentinel = num_rows for unused).
    """
    rows = np.asarray(rows_sorted, np.int64)
    E = len(rows)
    # pad the edge stream to a full GROUP of chunks so the kernel never has
    # to repad on device (an in-jit concatenate would copy the whole stream)
    E_pad = int(-(-max(E, 1) // (chunk * GROUP)) * (chunk * GROUP))
    rows_p = np.full(E_pad, num_rows, np.int64)
    rows_p[:E] = rows
    num_chunks = E_pad // chunk
    r = rows_p.reshape(num_chunks, chunk)
    # new distinct row when the row changes (first edge of chunk is rank 0)
    is_new = np.ones((num_chunks, chunk), np.int64)
    is_new[:, 1:] = (r[:, 1:] != r[:, :-1]).astype(np.int64)
    rank = np.cumsum(is_new, axis=1) - 1                      # [C, chunk]
    slot_row = np.full((num_chunks, chunk), num_rows, np.int64)
    c_idx, e_idx = np.nonzero(is_new)
    slot_row[c_idx, rank[c_idx, e_idx]] = r[c_idx, e_idx]
    # padded edges (row == num_rows sentinel) keep their slots mapped to the
    # sentinel so the final segment-sum drops them
    return (rank.reshape(-1).astype(np.int32),
            slot_row.reshape(-1).astype(np.int32), E_pad, num_chunks)


def _chunk_reduce_kernel(rank_ref, msg_ref, out_ref):
    """GROUP chunks: out[rank, :] = Σ_{e: rank[e]=rank} msg[e, :] via MXU."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    for g in range(GROUP):  # static unroll — GROUP MXU contractions
        rank = rank_ref[g, :]                                 # [chunk]
        onehot = (iota == rank[None, :]).astype(msg_ref.dtype)
        out_ref[g * CHUNK:(g + 1) * CHUNK, :] = jnp.dot(
            onehot, msg_ref[g * CHUNK:(g + 1) * CHUNK, :],
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def pallas_sorted_segment_sum(msg, rank, slot_row, num_rows: int,
                              num_chunks: int, interpret: bool = False):
    """msg [E_pad, F] (row-sorted, padded to GROUP·CHUNK), plan arrays →
    [num_rows, F]."""
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover - CPU-only environments
        vmem = None

    F = msg.shape[1]
    if num_chunks % GROUP != 0:
        raise ValueError(
            f"num_chunks ({num_chunks}) must be a multiple of GROUP "
            f"({GROUP}) — use plan_sorted_segments, which pads host-side")
    num_groups = num_chunks // GROUP

    spec_kwargs = {"memory_space": vmem} if (vmem is not None
                                             and not interpret) else {}
    in_specs = [
        pl.BlockSpec((GROUP, CHUNK), lambda i: (i, 0), **spec_kwargs),
        pl.BlockSpec((GROUP * CHUNK, F), lambda i: (i, 0), **spec_kwargs),
    ]
    out_specs = pl.BlockSpec((GROUP * CHUNK, F), lambda i: (i, 0),
                             **spec_kwargs)

    partials = pl.pallas_call(
        _chunk_reduce_kernel,
        grid=(num_groups,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((num_chunks * CHUNK, F), msg.dtype),
        interpret=interpret,
    )(rank.reshape(num_chunks, CHUNK), msg)

    # fold per-chunk partials into global rows (small sorted scatter);
    # chunk-padding slots carry slot_row's sentinel handling via clipping
    partials = partials[:slot_row.shape[0]]
    return jax.ops.segment_sum(partials, slot_row, num_segments=num_rows,
                               indices_are_sorted=False)


def sorted_segment_sum_mxu(msg, rows_sorted, num_rows: int,
                           interpret: bool = False):
    """Convenience wrapper: plan (host, eager) + kernel. ``rows_sorted`` must
    be concrete (the plan is a host precompute — cache it for jit loops)."""
    rank, slot_row, E_pad, num_chunks = plan_sorted_segments(
        np.asarray(jax.device_get(rows_sorted)), num_rows)
    msg_p = jnp.zeros((E_pad, msg.shape[1]), msg.dtype).at[:msg.shape[0]].set(msg)
    return pallas_sorted_segment_sum(msg_p, jnp.asarray(rank),
                                     jnp.asarray(slot_row), num_rows,
                                     num_chunks, interpret=interpret)
