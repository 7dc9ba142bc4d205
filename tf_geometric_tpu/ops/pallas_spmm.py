"""Pallas row-blocked SpMM kernel for TPU (Mosaic).

Strategy (SURVEY §7 step 3): edges are pre-sorted by destination row (the
normalization precompute already produces this ordering — see
``tf_geometric_tpu.nn.conv.gcn.gcn_build_cache_for_graph``), giving a CSR-like
layout. The kernel tiles destination rows into blocks of ``ROW_BLOCK``, scalar-
prefetches the row-pointer array, DMAs the needed ``h`` rows, and accumulates
in VMEM. Falls back to the XLA gather+segment path when the heuristic says XLA
fusion wins (small graphs, CPU backend, unsorted edges).

This file currently exposes the dispatch predicate and a placeholder that
routes to XLA; the tuned kernel lands with the roofline benchmarks.
"""
from __future__ import annotations

import jax

__all__ = ["should_use_pallas", "spmm_pallas"]


def should_use_pallas(index, h, num_rows: int) -> bool:
    """Heuristic dispatch: Pallas only on TPU and only for large graphs."""
    return False  # XLA path until the tuned kernel lands


def spmm_pallas(index, value, h, num_rows: int):
    from . import spmm as _spmm
    return _spmm._spmm_core_vjp(index, value, h, num_rows)
