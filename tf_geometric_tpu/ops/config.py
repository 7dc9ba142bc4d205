"""Global kernel-policy knobs.

``ell_compute_dtype``: when set (e.g. ``jnp.bfloat16``), ELL SpMM casts the
dense operand to this dtype for the gather/accumulate and casts the result
back. bf16 roughly halves SpMM time once feature width makes the kernel
bandwidth-bound (measured v5e, F=256: 17.6ms → 10.7ms); at F≤128 the kernel
is gather-transaction-bound and dtype doesn't matter. None preserves the
operand dtype exactly.
"""
from __future__ import annotations

from typing import Optional

ell_compute_dtype = None


def set_ell_compute_dtype(dtype) -> None:
    global ell_compute_dtype
    ell_compute_dtype = dtype


# Unroll the fused-GAT transpose pass (dV/dK) instead of lax.fori_loop.
# Unrolling lets XLA fuse all K slot iterations into one fusion so the two
# [N, F] accumulators are written once instead of round-tripping HBM every
# iteration: measured 63.0 -> 40.8 ms (fp32, arxiv scale) on the single
# biggest phase of the GAT backward (benchmarks/transpose_variants.py).
# Cost: a much larger HLO -> a long one-time compile through the remote
# compile service (amortized by the persistent compilation cache).
ell_attention_unroll_transpose = True


def set_ell_attention_unroll_transpose(flag: bool) -> None:
    global ell_attention_unroll_transpose
    ell_attention_unroll_transpose = flag


# Unroll ALL K-slot loops in the fused attention kernel (scores, aggregate,
# da, dQ) in addition to the transpose pass. Larger HLO still; same
# accumulator-fusion rationale.
ell_attention_unroll_all = True


def set_ell_attention_unroll_all(flag: bool) -> None:
    global ell_attention_unroll_all
    ell_attention_unroll_all = flag


# Recompute attention weights inside the fused-GAT transpose pass instead of
# gathering them from the flat [·, 2H] weight array: per-row softmax stats
# (lse, gsum — 2H f32, bit-cast to the compute dtype) ride the existing dy
# gather and K/V are read row-aligned via two extra N-row permutes. Only
# applies when attention-dropout masks are scalar — per-edge masks can't be
# recomputed. MEASURED AND REJECTED as the default (v5e, arxiv scale,
# gat_throughput.py same-day A/B): recompute 81.1 ms bf16 / 115.7 fp32 vs
# flat-weight 74-75 bf16 / 108 fp32 — the narrow weight gather was NOT a
# full transaction set in practice; the two extra per-lane blocksums
# (score + dã recompute), the +12.5% rider bytes on every dy lane, and the
# two N-row K/V permutes cost ~8-10% more than the gather they replace.
# Kept (oracle-tested, tests/test_ell_attention_bucketed.py) for layouts
# where lanes ≫ N, where the trade could invert.
ell_attention_recompute_transpose = False


def set_ell_attention_recompute_transpose(flag: bool) -> None:
    global ell_attention_recompute_transpose
    ell_attention_recompute_transpose = flag


# Transpose-scatter weights: place ã‖ds into transpose lane order with ONE
# unique-index scatter (layout.w_scatter_pos, host-precomputed permutation)
# so the transpose pass reads them as contiguous slices instead of gathering
# the flat [·, 2H] array per lane — trades the 7th gather set's random READS
# for the same count of random WRITES plus a sequential re-read.
ell_attention_transpose_scatter = False


def set_ell_attention_transpose_scatter(flag: bool) -> None:
    global ell_attention_transpose_scatter
    ell_attention_transpose_scatter = flag


# Layout for cache-compiled adjacencies (maybe_compile_ell):
#   "auto"     — BucketedEllAdj with per-direction cost choice (default):
#                degree-bucketed slot groups where the sorted-segment tail
#                is heavy, classic uniform-K where it is not. Measured on
#                the headline GCN step (benchmarks/bucketed_ab.py, v5e):
#                12.2 -> 9.35 ms (+31% edges/s) on the skewed-in-degree
#                arxiv-scale graph.
#   "bucketed" — force degree buckets on both directions.
#   "uniform"  — classic EllAdj (the pre-bucketing behavior).
ell_layout = "auto"


def set_ell_layout(layout: str) -> None:
    if layout not in ("auto", "bucketed", "uniform"):
        raise ValueError(f"ell_layout must be auto|bucketed|uniform, got {layout!r}")
    global ell_layout
    ell_layout = layout


# Save the forward-gathered K/V slot lanes of the fused bucketed attention
# as custom-VJP residuals so the backward dã/dQ passes read them back as
# streaming slices instead of re-gathering V[col]/K[col] (two of the step's
# seven random-gather sets). On paper a 1.4M-row random gather costs ~9.6 ms
# at arxiv scale vs ~1.8 ms for the equivalent streaming write+read.
# MEASURED AND REJECTED as the default (v5e, arxiv scale, bench.py GAT
# same-day A/Bs): re-gather baseline 73.8 ms / 18.11M edges/s; save-lanes
# row-major [ng, Kg, Hd] 78.0 ms / 17.13M; save-lanes SLOT-major
# [Kg, ng, Hd] (contiguous per-slot reads) 77.4 ms / 17.26M — both layouts
# ~5% SLOWER. The fwd's ~1.5 GB (bf16) of lane writes costs more than the
# bwd re-gathers it removes: XLA's fused take→FMA backward passes already
# run near the transaction floor, while the lane materialization adds pure
# HBM write traffic to the forward and (unlike the fused gathers) cannot
# overlap the surrounding compute. Kept oracle-tested
# (tests/test_ell_attention_bucketed.py — bit-identical grads) for
# hardware/shapes where the trade inverts (e.g. much wider heads, where
# per-row bytes amortize the transaction and writes become relatively
# cheaper). Only active together with ell_attention_unroll_all (a
# fori_loop would stream the full lane carry through HBM every iteration).
ell_attention_save_lanes = False


def set_ell_attention_save_lanes(flag: bool) -> None:
    global ell_attention_save_lanes
    ell_attention_save_lanes = flag
