"""SpMM / SDDMM — the hot ops of every GNN forward+backward.

The reference's hot loop is ``tf.gather`` + ``tf.math.unsorted_segment_sum``
over an edge list (SURVEY §3.1: ``normed_adj.matmul(h)`` at gcn.py:280, and
its transpose in backward). Here the same math is expressed as XLA
gather/segment programs with a custom VJP so the backward is *also* a single
SpMM/SDDMM rather than XLA's generic scatter transpose:

    forward:   y[r] = Σ_{e: row[e]=r} value[e] · h[col[e]]
    d/d h:     dh = Aᵀ @ dy       (SpMM with swapped index)
    d/d value: dv[e] = <dy[row[e]], h[col[e]]>   (SDDMM)

A Pallas SpMM behind this signature was evaluated on hardware and rejected
(see docs/performance.md "Pallas findings"); the production fast path is the
ELL layout family (ops/ell.py, ops/ell_bucketed.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["spmm", "sddmm", "spmm_xla", "sddmm_xla"]


def _gather_rows(h, ids):
    """Clipped gather: out-of-range (padded) ids read row 0 harmlessly."""
    return jnp.take(h, jnp.clip(ids, 0, h.shape[0] - 1), axis=0)


def spmm_xla(index, value, h, num_rows: int):
    """Reference XLA implementation: gather + segment-sum."""
    row, col = index[0], index[1]
    msg = _gather_rows(h, col) * value[:, None]
    return jax.ops.segment_sum(msg, row, num_segments=num_rows)


def sddmm_xla(index, a, b):
    """Per-edge inner product: out[e] = <a[row[e]], b[col[e]]> (the GAT score)."""
    row, col = index[0], index[1]
    return jnp.sum(_gather_rows(a, row) * _gather_rows(b, col), axis=-1)


# ---------------------------------------------------------------------------
# Custom-VJP SpMM: backward is an explicit SpMM(Aᵀ) + SDDMM instead of XLA's
# generic scatter transpose. value cotangent respects padding (dropped rows
# produce zero grads because dy reads are multiplied into dropped scatters).
# ---------------------------------------------------------------------------

def _spmm_bwd(num_rows, residuals, dy):
    index, value, h = residuals
    swapped = jnp.stack([index[1], index[0]], axis=0)
    dh = spmm_xla(swapped, value, dy, h.shape[0])
    dv = sddmm_xla(index, dy, h)
    # Padded edges have row == num_rows (out of range); zero their value
    # grads explicitly so optimizer state stays clean.
    dv = jnp.where((index[0] >= 0) & (index[0] < num_rows), dv, 0.0)
    return None, dv, dh


_spmm_core_vjp = jax.custom_vjp(spmm_xla, nondiff_argnums=(3,))
_spmm_core_vjp.defvjp(
    lambda index, value, h, num_rows: (spmm_xla(index, value, h, num_rows), (index, value, h)),
    _spmm_bwd,
)


def spmm(index, value, h, num_rows: int):
    """COO SpMM (XLA gather + segment reduction with a custom transpose VJP).

    A Pallas SpMM was evaluated on hardware and rejected — per-edge DMA is
    scalar-core-bound, Mosaic has no vectorized VMEM gather, and the one-hot
    MXU formulation only pays off for edges pre-clustered into dense (row,
    col) tiles (docs/performance.md "Pallas findings"). The production hot
    path is the ELL family (ops/ell.py, ops/ell_bucketed.py), not this
    generic COO op.
    """
    return _spmm_core_vjp(index, value, h, num_rows)


def sddmm(index, a, b):
    """SDDMM dispatch (currently XLA; gather+reduce fuses well)."""
    return sddmm_xla(index, a, b)
