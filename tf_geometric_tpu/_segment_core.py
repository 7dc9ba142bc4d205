"""Segment reduction primitives — the innermost compute layer.

TPU-native counterpart of the reference's segment kernel
(``tf_geometric/nn/kernel/segment.py:5-40`` in the reference repo): the same
semantics (max-subtracted segment softmax with eps=1e-8, segment counting,
min/max segment reductions) expressed as XLA scatter/segment programs with
**static** ``num_segments`` so everything jits to a single fused TPU program.

Conventions that make these ops padding-friendly:

* ``num_segments`` is always static (a Python int) — required under ``jit``.
* Out-of-range segment ids (``>= num_segments`` or negative) are *dropped* by
  XLA's scatter semantics. Padded edges therefore use ``segment_id =
  num_segments`` and contribute nothing — no masks needed in the hot loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "segment_count",
    "segment_normalize",
    "segment_op_with_pad",
]


def segment_sum(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    """Sum ``data`` rows into ``num_segments`` buckets keyed by ``segment_ids``."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_count(segment_ids, num_segments: int, weights=None):
    """Number of elements (or total weight) landing in each segment.

    Mirrors reference ``segment_count`` (segment.py:36-40).
    """
    if weights is None:
        weights = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    return jax.ops.segment_sum(weights, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    """Per-segment mean; empty segments produce 0 (eps-guarded denominator)."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    count = segment_count(segment_ids, num_segments)
    count = jnp.maximum(count, 1.0)
    return total / jnp.reshape(count, count.shape + (1,) * (total.ndim - count.ndim))


def segment_max(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    """Per-segment max; empty segments produce 0 (reference zero-pads, segment.py:5-23)."""
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    # jax fills empty segments with -inf; the reference's segment_op_with_pad
    # zero-fills them instead. Match the reference.
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_min(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    """Per-segment min; empty segments produce 0."""
    out = jax.ops.segment_min(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_softmax(data, segment_ids, num_segments: int, eps: float = 1e-8,
                    indices_are_sorted: bool = False):
    """Numerically-stable softmax within each segment.

    Matches reference semantics (segment.py:26-33): subtract the per-segment
    max, exponentiate, normalize by the per-segment sum with ``eps`` added to
    the denominator. Out-of-range ids (padded edges) yield 0 contributions and
    read back a 0 max / 0 sum, so padded entries produce finite garbage that
    callers multiply by zero weights.
    """
    seg_max = jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                                  indices_are_sorted=indices_are_sorted)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    safe_ids = jnp.clip(segment_ids, 0, num_segments - 1)
    # Out-of-range (padded) entries would exponentiate against a *clipped*
    # segment's max — overflowing when their raw score exceeds it and
    # poisoning gradients with inf·0 NaNs. Hard-zero them instead.
    in_range = (segment_ids >= 0) & (segment_ids < num_segments)
    in_range = in_range.reshape(in_range.shape + (1,) * (data.ndim - 1))
    shifted = jnp.where(in_range, data - jnp.take(seg_max, safe_ids, axis=0),
                        -jnp.inf)
    exped = jnp.exp(shifted)
    seg_sum = jax.ops.segment_sum(exped, segment_ids, num_segments=num_segments,
                                  indices_are_sorted=indices_are_sorted)
    denom = jnp.take(seg_sum, safe_ids, axis=0) + eps
    return exped / denom


def segment_op_with_pad(segment_op, data, segment_ids, num_segments: int):
    """Apply a segment reduction, zero-filling empty segments.

    API-parity wrapper for the reference's ``segment_op_with_pad``
    (``nn/kernel/segment.py:5-23``), which exists there to give TF1's
    sorted-only segment max/min unsorted semantics with zero padding. Under
    JAX the unsorted ops are native, so this just runs ``segment_op`` and
    replaces non-finite fill values (the -inf/+inf identities of empty
    max/min segments) with 0.
    """
    out = segment_op(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_normalize(data, segment_ids, num_segments: int, eps: float = 1e-8):
    """Divide each element by its segment's sum (L1 normalization per segment)."""
    seg_sum = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    safe_ids = jnp.clip(segment_ids, 0, num_segments - 1)
    return data / (jnp.take(seg_sum, safe_ids, axis=0) + eps)
