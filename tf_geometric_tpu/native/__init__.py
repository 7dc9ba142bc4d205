"""Native (C++) host-side graph preprocessing, loaded via ctypes.

The reference is pure Python (SURVEY vital statistics: no native code
anywhere); this framework adds a native layer for the host-side hot paths
that feed the TPU — CSR building, ELL packing, fixed-k neighbor sampling,
label-propagation ordering — because at production graph scale (Reddit,
ogbn-papers100M) the numpy argsort/unique pipelines dominate preprocessing
wall-clock.

The shared library is compiled lazily from ``graph_ops.cpp`` with the
system ``g++`` on first use and cached under ``~/.cache/tfg_tpu_native``
(keyed by source hash). Every entry point has a numpy fallback: importing
this module NEVER fails, and ``available()`` reports whether the fast path
is active. Set ``TFG_TPU_NATIVE=0`` to force the numpy paths.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "sort_by_row", "build_row_ptr", "ell_pack",
           "sample_fixed_k", "lpa_labels", "partition_refine"]

_SRC = Path(__file__).with_name("graph_ops.cpp")
_lib = None
_tried = False


def _compile_and_load() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    key = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache_dir = Path(os.environ.get("TFG_TPU_NATIVE_CACHE",
                                    Path.home() / ".cache" / "tfg_tpu_native"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / f"graph_ops_{key}.so"
    if not so_path.exists():
        # temp dir INSIDE the cache dir: os.replace requires the same
        # filesystem (a /tmp tmpfs would raise EXDEV and silently disable
        # the whole native module)
        with tempfile.TemporaryDirectory(dir=cache_dir) as td:
            tmp_so = Path(td) / "graph_ops.so"
            base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                    str(_SRC), "-o", str(tmp_so)]
            for flags in (base + ["-fopenmp"], base):
                try:
                    r = subprocess.run(flags, capture_output=True, timeout=120)
                except Exception:
                    return None
                if r.returncode == 0:
                    break
            else:
                return None
            os.replace(tmp_so, so_path)
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.tfg_sort_by_row.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i64p]
    lib.tfg_sort_by_row.restype = None
    lib.tfg_build_row_ptr.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i64p]
    lib.tfg_build_row_ptr.restype = None
    lib.tfg_ell_pack.argtypes = [i32p, i32p, f32p, i32p, ctypes.c_int64,
                                 ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                                 i32p, f32p, i32p, i32p, i32p, f32p, i32p]
    lib.tfg_ell_pack.restype = ctypes.c_int64
    lib.tfg_ell_pack_coo.argtypes = lib.tfg_ell_pack.argtypes
    lib.tfg_ell_pack_coo.restype = ctypes.c_int64
    lib.tfg_sample_fixed_k.argtypes = [i64p, i32p, f32p, i64p, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_uint64,
                                       i32p, f32p]
    lib.tfg_sample_fixed_k.restype = None
    lib.tfg_lpa_sweep.argtypes = [i64p, i32p, ctypes.c_int32, i64p, i64p]
    lib.tfg_lpa_sweep.restype = ctypes.c_int64
    lib.tfg_partition_refine.argtypes = [i64p, i32p, ctypes.c_int32,
                                         ctypes.c_int32, i64p, ctypes.c_int32,
                                         ctypes.c_int32, i32p]
    lib.tfg_partition_refine.restype = ctypes.c_int64
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("TFG_TPU_NATIVE", "1") == "0":
        return None
    try:
        _lib = _compile_and_load()
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    """True when the compiled fast path is loaded."""
    return _get_lib() is not None


def sort_by_row(rows, num_rows: int) -> np.ndarray:
    """Stable order such that ``rows[order]`` is row-sorted. O(E) counting
    sort natively; numpy stable argsort fallback."""
    rows = np.ascontiguousarray(rows, np.int32)
    lib = _get_lib()
    if lib is None:
        # match the native kernel's stray handling: out-of-range rows clamp
        # to the trailing sentinel bucket (plain argsort would order negative
        # ids FIRST, shifting the CSR view by every stray edge)
        clamped = np.where((rows < 0) | (rows > num_rows), num_rows, rows)
        return np.argsort(clamped, kind="stable")
    order = np.empty(rows.shape[0], np.int64)
    lib.tfg_sort_by_row(rows, rows.shape[0], int(num_rows), order)
    return order


def build_row_ptr(rows, num_rows: int) -> np.ndarray:
    """CSR row pointers [num_rows+1] (rows may be unsorted; out-of-range
    entries are ignored)."""
    rows = np.ascontiguousarray(rows, np.int32)
    lib = _get_lib()
    if lib is None:
        counts = np.bincount(rows[(rows >= 0) & (rows < num_rows)],
                             minlength=num_rows)
        return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    row_ptr = np.empty(num_rows + 1, np.int64)
    lib.tfg_build_row_ptr(rows, rows.shape[0], int(num_rows), row_ptr)
    return row_ptr


def ell_pack(rows, cols, vals, eids, num_rows: int, K: int,
             eid_sentinel: int, presorted: bool = False):
    """ELL packing of a COO edge stream (ops/ell.py semantics). The edges
    may be UNSORTED (the fused counting-sort+pack runs in C++; within each
    row, input order is preserved — matching a stable row sort).

    Returns (slots_col [N,K] i32, slots_val [N,K] f32, slot_eid [N,K] i32,
    tail_r, tail_c, tail_v, tail_e) — the tail row-sorted and trimmed to the
    true tail length, NOT padded (the caller pads to its bucket size). None
    when the native library is unavailable (caller uses its numpy path).
    """
    lib = _get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    eids = np.ascontiguousarray(eids, np.int32)
    E = rows.shape[0]
    slots_col = np.empty((num_rows, K), np.int32)
    slots_val = np.empty((num_rows, K), np.float32)
    slot_eid = np.empty((num_rows, K), np.int32)
    tail_r = np.empty(E, np.int32)
    tail_c = np.empty(E, np.int32)
    tail_v = np.empty(E, np.float32)
    tail_e = np.empty(E, np.int32)
    fn = lib.tfg_ell_pack if presorted else lib.tfg_ell_pack_coo
    tl = fn(rows, cols, vals, eids, E,
            int(num_rows), int(K), int(eid_sentinel),
            slots_col.reshape(-1), slots_val.reshape(-1),
            slot_eid.reshape(-1), tail_r, tail_c, tail_v, tail_e)
    return (slots_col, slots_val, slot_eid,
            tail_r[:tl].copy(), tail_c[:tl].copy(), tail_v[:tl].copy(),
            tail_e[:tl].copy())


def sample_fixed_k(row_ptr, col, weight, sources, k: int, seed: int):
    """Per-source fixed-k with-replacement neighbor draw; isolated sources
    self-pad with weight 0. Deterministic in (seed, source). Returns
    (col [S,k] i32, weight [S,k] f32), or None without the native library."""
    lib = _get_lib()
    if lib is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    col = np.ascontiguousarray(col, np.int32)
    weight = np.ascontiguousarray(weight, np.float32)
    sources = np.ascontiguousarray(sources, np.int64)
    S = sources.shape[0]
    out_col = np.empty((S, k), np.int32)
    out_w = np.empty((S, k), np.float32)
    lib.tfg_sample_fixed_k(row_ptr, col, weight, sources, S, int(k),
                           np.uint64(seed), out_col.reshape(-1),
                           out_w.reshape(-1))
    return out_col, out_w


def lpa_labels(row_ptr, col, num_nodes: int, num_iters: int = 8):
    """Synchronous majority-vote label propagation (smallest-label
    tie-break); returns final labels, or None without the native library."""
    lib = _get_lib()
    if lib is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    col = np.ascontiguousarray(col, np.int32)
    labels = np.arange(num_nodes, dtype=np.int64)
    new_labels = np.empty_like(labels)
    for _ in range(num_iters):
        changes = lib.tfg_lpa_sweep(row_ptr, col, int(num_nodes), labels,
                                    new_labels)
        labels, new_labels = new_labels, labels
        if changes == 0:
            break
    return labels.copy()


def partition_refine(row_ptr, col, part, caps, slack: int, num_iters: int):
    """Capacity-constrained partition refinement + exactness repair over a
    symmetric CSR graph (parallel/partition.py partition_order steps 3-4).
    Mutates ``part`` (int32 [N]) in place so fill == caps exactly; returns
    the number of moves, or None without the native library."""
    lib = _get_lib()
    if lib is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    col = np.ascontiguousarray(col, np.int32)
    caps = np.ascontiguousarray(caps, np.int64)
    assert part.dtype == np.int32 and part.flags.c_contiguous
    return int(lib.tfg_partition_refine(row_ptr, col, int(part.shape[0]),
                                        int(caps.shape[0]), caps, int(slack),
                                        int(num_iters), part))
