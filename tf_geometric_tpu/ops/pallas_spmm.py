"""Pallas SpMM investigation + dispatch hook.

Status (measured on a v5e, ogbn-arxiv scale — see benchmarks/spmm_variants.py
and CLAUDE.md):

* XLA's COO gather+scatter SpMM is **transaction-bound**: every random row
  access costs ~4-5 ns regardless of row width. The production answer in
  this framework is the ELL-packed layout (``ops/ell.py``) — scatter-free,
  4.1× over unsorted COO — plus the bf16 policy and the propagated-feature
  precompute. Together these put the headline GCN step at 91M edges/s/chip.

* A Pallas kernel was evaluated for the remaining gap and rejected for the
  general (unstructured) case with evidence:
  - per-edge DMA gather: issue cost is scalar-core-bound (~10⁵ edges/ms
    max), orders of magnitude short of the 1.3M-edge budget;
  - Mosaic has no vectorized VMEM gather (``x_ref[idx_vec]`` fails to
    lower), so within-tile gathers can't vectorize either;
  - the one-hot MXU formulation (gather-as-matmul) is FLOP-viable only when
    edges cluster into dense-ish (row, col) tiles; for community-structured
    graphs with a METIS-quality ordering it becomes attractive
    (~2-3× at V=1024 tiles), but for unstructured graphs the per-tile
    padding explodes the effective edge count.

``should_use_pallas`` is the dispatch seam where a tiled one-hot kernel can
slot in for partitioned/ordered graphs in a later round.
"""
from __future__ import annotations

import jax

__all__ = ["should_use_pallas", "spmm_pallas"]


def should_use_pallas(index, h, num_rows: int) -> bool:
    """Dispatch predicate — ELL (ops/ell.py) is the production path; see the
    module docstring for the measured rationale."""
    return False


def spmm_pallas(index, value, h, num_rows: int):
    from . import spmm as _spmm
    return _spmm._spmm_core_vjp(index, value, h, num_rows)
