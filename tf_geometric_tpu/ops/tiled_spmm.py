"""Tiled one-hot MXU SpMM — the gather-as-matmul formulation, measured.

The cost model (docs/performance.md §0c) left ONE unmeasured lead: with a
partition-quality node ordering, edges cluster into dense-ish (row, col)
tiles, and the SpMM becomes a batch of [t, t] @ [t, F] MXU contractions over
the occupied tiles — no per-edge gathers at all. This module materializes
that formulation so it can be measured (benchmarks/tiled_spmm_ab.py) and
either promoted into the dispatch or rejected with numbers.

Cost structure (per pass, B occupied tiles, tile size t, feature width F):

    HBM:   B·t²·sizeof(A)   (the materialized tile matrices dominate)
         + B·t·F·sizeof(h)  (block gathers of the operand — contiguous,
                             NOT transaction-bound like per-edge gathers)
    MXU:   2·B·t²·F FLOPs

so the formulation wins exactly when tile **occupancy** (E / (B·t²)) is high
enough that B·t² ≲ the per-edge gather traffic it replaces. ``occupancy``
is computed at pack time; ``worthwhile(F)`` applies the measured crossover.

Forward and backward are both scatter-free: partials reduce with a sorted
segment-sum over tile rows; dh rides a transpose packing (sorted by source
tile). Reference surface: the SpMM of tf_geometric/nn/conv/gcn.py:274-280.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.union_utils import convert_union_to_numpy

__all__ = ["TiledSpmm", "build_tiled_spmm", "tiled_spmm"]


class TiledSpmm(NamedTuple):
    """Occupied-tile packing of a sparse matrix (plus its transpose)."""

    row_tile: jnp.ndarray    # [B] int32, sorted — destination tile ids
    col_tile: jnp.ndarray    # [B] int32 — source tile ids
    a_tiles: jnp.ndarray     # [B, t, t] — dense tile blocks of A
    t_row_tile: jnp.ndarray  # [Bt] int32, sorted — transpose packing
    t_col_tile: jnp.ndarray  # [Bt] int32
    t_a_tiles: jnp.ndarray   # [Bt, t, t] — dense tile blocks of Aᵀ
    num_row_tiles: int
    num_col_tiles: int
    tile: int
    shape: tuple
    num_edges: int

    @property
    def occupancy(self) -> float:
        """Real edges / packed tile slots (1.0 = perfectly dense tiles)."""
        return self.num_edges / max(int(self.a_tiles.shape[0])
                                    * self.tile * self.tile, 1)

    def bytes_per_pass(self, feature_width: int) -> int:
        t = self.tile
        B = int(self.a_tiles.shape[0])
        return (B * t * t * self.a_tiles.dtype.itemsize
                + B * t * feature_width * 4)


def build_tiled_spmm(index, value, shape, tile: int = 256,
                     dtype=jnp.float32) -> TiledSpmm:
    """Host-side packing: bucket edges into (row_tile, col_tile) pairs and
    materialize one dense [t, t] block per occupied pair (both directions).

    Apply a locality ordering (``parallel.partition.partition_order``) to
    the graph FIRST — occupancy on an unordered graph is what decides
    against this formulation.
    """
    index = convert_union_to_numpy(index, np.int64)
    value = convert_union_to_numpy(value, np.float32)
    if value is None:
        value = np.ones(index.shape[1], np.float32)
    num_rows, num_cols = int(shape[0]), int(shape[1])
    ok = ((index[0] >= 0) & (index[0] < num_rows)
          & (index[1] >= 0) & (index[1] < num_cols))
    rows, cols, vals = index[0][ok], index[1][ok], value[ok]
    Vr = -(-num_rows // tile)
    Vc = -(-num_cols // tile)

    def pack(r, c, v, n_r_tiles):
        rt, ct = r // tile, c // tile
        pair = rt * np.int64(n_r_tiles + Vc + 1) + ct  # unique pair key
        uniq, inv = np.unique(pair, return_inverse=True)
        B = len(uniq)
        a = np.zeros((B, tile, tile), np.float32)
        np.add.at(a, (inv, r % tile, c % tile), v)
        order = np.argsort(uniq // np.int64(n_r_tiles + Vc + 1), kind="stable")
        a = a[order]
        uniq = uniq[order]
        return (np.asarray(uniq // np.int64(n_r_tiles + Vc + 1), np.int32),
                np.asarray(uniq % np.int64(n_r_tiles + Vc + 1), np.int32),
                a)

    row_tile, col_tile, a = pack(rows, cols, vals, Vr)
    t_row_tile, t_col_tile, t_a = pack(cols, rows, vals, Vc)
    return TiledSpmm(
        row_tile=jnp.asarray(row_tile), col_tile=jnp.asarray(col_tile),
        a_tiles=jnp.asarray(a, dtype),
        t_row_tile=jnp.asarray(t_row_tile), t_col_tile=jnp.asarray(t_col_tile),
        t_a_tiles=jnp.asarray(t_a, dtype),
        num_row_tiles=Vr, num_col_tiles=Vc, tile=tile,
        shape=(num_rows, num_cols), num_edges=len(rows))


def _tiled_pass(row_tile, col_tile, a_tiles, h, num_out_tiles: int,
                num_out_rows: int, tile: int):
    """One direction: block-gather operand tiles, batched MXU contraction,
    sorted segment-sum of the partials into output tiles."""
    F = h.shape[1]
    n_pad = num_out_tiles * 0 + (-(-h.shape[0] // tile)) * tile
    hc = jnp.pad(h, ((0, n_pad - h.shape[0]), (0, 0)))
    hc = hc.reshape(-1, tile, F)
    Hb = jnp.take(hc, col_tile, axis=0)                   # [B, t, F]
    partial = jax.lax.dot_general(
        a_tiles, Hb.astype(a_tiles.dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [B, t, F]
    out = jax.ops.segment_sum(
        partial.reshape(partial.shape[0], tile * F), row_tile,
        num_segments=num_out_tiles, indices_are_sorted=True)
    return out.reshape(num_out_tiles * tile, F)[:num_out_rows].astype(h.dtype)


def _tiled_impl(row_tile, col_tile, t_row_tile, t_col_tile,
                num_row_tiles, num_col_tiles, tile, num_rows, num_cols,
                a_tiles, t_a_tiles, h):
    return _tiled_pass(row_tile, col_tile, a_tiles, h, num_row_tiles,
                       num_rows, tile)


_tiled_vjp = jax.custom_vjp(_tiled_impl, nondiff_argnums=(4, 5, 6, 7, 8))


def _tiled_fwd(row_tile, col_tile, t_row_tile, t_col_tile,
               num_row_tiles, num_col_tiles, tile, num_rows, num_cols,
               a_tiles, t_a_tiles, h):
    out = _tiled_pass(row_tile, col_tile, a_tiles, h, num_row_tiles,
                      num_rows, tile)
    return out, (t_row_tile, t_col_tile, t_a_tiles)


def _tiled_bwd(num_row_tiles, num_col_tiles, tile, num_rows, num_cols,
               residuals, dy):
    t_row_tile, t_col_tile, t_a_tiles = residuals
    dh = _tiled_pass(t_row_tile, t_col_tile, t_a_tiles, dy, num_col_tiles,
                     num_cols, tile)
    return (None, None, None, None, None, None, dh)


_tiled_vjp.defvjp(_tiled_fwd, _tiled_bwd)


def tiled_spmm(ts: TiledSpmm, h):
    """A @ h on the occupied-tile packing (values constant, as the cached
    normalized adjacency — backward produces dh only, via the transpose
    packing, both directions scatter-free)."""
    return _tiled_vjp(ts.row_tile, ts.col_tile, ts.t_row_tile, ts.t_col_tile,
                      ts.num_row_tiles, ts.num_col_tiles, ts.tile,
                      ts.shape[0], ts.shape[1], ts.a_tiles, ts.t_a_tiles, h)
