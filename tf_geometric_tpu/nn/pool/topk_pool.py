"""Per-source top-k selection (reference: nn/pool/topk_pool.py:6-87).

The reference builds a dense [num_sources, max_targets] score matrix with
scatter + argsort + meshgrid masking. Selection indices are inherently
data-dependent (ragged output), so this is a **host-side** op in the TPU
build: scores come back to the host once per pooling step (selection is
non-differentiable anyway; the differentiable score multiplication stays on
device). The jit-safe alternative for fixed ``k`` is :func:`topk_pool_fixed`,
which returns a padded [num_sources·k] index array + validity mask.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.union_utils import convert_union_to_numpy

__all__ = ["topk_pool", "topk_pool_fixed"]

# the ragged host loop is O(num_sources) Python — fine for graph-pooling
# batches (thousands of sources), a trap at Reddit scale
_SLOW_PATH_WARN_THRESHOLD = 100_000


def topk_pool(source_index, score, k: Optional[int] = None,
              ratio: Optional[float] = None) -> np.ndarray:
    """Keep the top-k (or top-⌈ratio·n⌉) targets per source; returns indices
    into the original flat array, ordered by (source asc, rank asc)."""
    if k is None and ratio is None:
        raise ValueError("you should provide either k or ratio for topk_pool")
    if k is not None and ratio is not None:
        raise ValueError("provide either k or ratio for topk_pool, not both")

    source_index = convert_union_to_numpy(source_index, np.int64)
    score = convert_union_to_numpy(score, np.float32).reshape(-1)

    order = np.argsort(source_index, kind="stable")
    sorted_src = source_index[order]
    num_sources = int(sorted_src.max()) + 1 if sorted_src.size else 0
    if num_sources > _SLOW_PATH_WARN_THRESHOLD:
        import warnings
        warnings.warn(
            f"topk_pool: ragged host-side selection over {num_sources} "
            "sources runs an O(num_sources) Python loop — use "
            "topk_pool_fixed (jit/grad-safe, padded fixed-k) at this scale",
            RuntimeWarning, stacklevel=2)
    counts = np.bincount(sorted_src, minlength=num_sources)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

    keep = []
    for s in range(num_sources):
        group = order[starts[s]:starts[s] + counts[s]]
        if len(group) == 0:
            continue
        if k is not None:
            take = min(k, len(group))
        else:
            take = max(int(np.ceil(len(group) * ratio)), 1)
        ranked = group[np.argsort(-score[group], kind="stable")]
        keep.append(ranked[:take])
    if not keep:
        return np.zeros(0, np.int32)
    return np.concatenate(keep).astype(np.int32)


def topk_pool_fixed(source_index, score, num_sources: int, k: int):
    """jit-safe fixed-k top-k per source.

    Returns ``(indices [num_sources*k], valid [num_sources*k])`` where
    invalid slots (source has fewer than k targets) point at index 0 with
    ``valid=False``. One lexsort by (source asc, score desc) and one small
    [num_sources, k] gather — O(n log n), no [num_sources, n] dense
    materialization. Out-of-range sources (padded entries) are dropped.
    """
    source_index = jnp.asarray(source_index)
    score = jnp.asarray(score).reshape(-1)
    n = score.shape[0]
    if n == 0:
        return (jnp.zeros(num_sources * k, jnp.int32),
                jnp.zeros(num_sources * k, bool))

    # padded / out-of-range sources sort to the very end (sentinel group)
    safe_src = jnp.where((source_index >= 0) & (source_index < num_sources),
                         source_index, num_sources).astype(jnp.int32)
    order = jnp.lexsort((-score, safe_src))          # source asc, score desc
    sorted_src = jnp.take(safe_src, order)
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), sorted_src,
                                 num_segments=num_sources,
                                 indices_are_sorted=True)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    pos = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]  # [S, k]
    valid = jnp.arange(k, dtype=jnp.int32)[None, :] < counts[:, None]
    indices = jnp.take(order, jnp.clip(pos.reshape(-1), 0, n - 1))
    indices = jnp.where(valid.reshape(-1), indices, 0).astype(jnp.int32)
    return indices, valid.reshape(-1)
