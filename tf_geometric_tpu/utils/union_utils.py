"""Array-kind-agnostic helpers (reference: utils/union_utils.py:6-27).

The framework's host-side data layer accepts numpy arrays, Python lists, and
JAX arrays interchangeably; these helpers normalize between worlds.
"""
from __future__ import annotations

import jax
import numpy as np

__all__ = ["convert_union_to_numpy", "union_len", "is_jax_array"]


def is_jax_array(x) -> bool:
    return isinstance(x, jax.Array)


def convert_union_to_numpy(data, dtype=None):
    """numpy view of a list / numpy array / JAX array (None passes through)."""
    if data is None:
        return None
    if is_jax_array(data):
        out = np.asarray(jax.device_get(data))
    else:
        out = np.asarray(data)
    if dtype is not None:
        out = out.astype(dtype)
    return out


def union_len(data) -> int:
    """Length of a list or first-dim size of an array."""
    if isinstance(data, (list, tuple)):
        return len(data)
    return int(data.shape[0])
