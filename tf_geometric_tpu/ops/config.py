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
