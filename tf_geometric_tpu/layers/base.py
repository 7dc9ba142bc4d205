"""Shared plumbing for OOP layers (flax.linen modules).

The reference wraps every functional op in a ``tf.keras.Model`` whose
``call(inputs, cache=None, training=None)`` unpacks ``[x, edge_index(,
edge_weight)]`` or ``[x, SparseMatrix]`` (layers/conv/gcn.py:139-148). The
TPU-native surface keeps the exact same input contract on top of
``flax.linen`` modules: params live in a pytree, dropout keys come from the
``"dropout"`` RNG collection, and L2 regularization is applied in the loss
over ``"kernel"``-named params (as the reference demos do,
demo_gcn.py:50-62) rather than via per-layer regularizer objects.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp

from ..sparse.matrix import SparseMatrix

__all__ = ["unpack_inputs", "glorot_uniform", "zeros_init", "l2_loss"]


def unpack_inputs(inputs) -> Tuple[Any, SparseMatrix]:
    """Normalize layer inputs to (x, sparse_adj).

    Accepts ``[x, SparseMatrix]`` or ``[x, edge_index]`` or
    ``[x, edge_index, edge_weight]`` (layers/conv/gcn.py:139-148).
    """
    if isinstance(inputs, (list, tuple)):
        if len(inputs) == 2:
            x, adj = inputs
            if not isinstance(adj, SparseMatrix):
                n = x.shape[0]
                adj = SparseMatrix(adj, None, (n, n))
            return x, adj
        if len(inputs) == 3:
            x, edge_index, edge_weight = inputs
            n = x.shape[0]
            return x, SparseMatrix(edge_index, edge_weight, (n, n))
    raise ValueError(
        "layer inputs must be [x, SparseMatrix] or [x, edge_index(, edge_weight)]")


def unpack_edge_inputs(inputs):
    """Normalize to (x, edge_index, edge_weight) for ops that work on raw
    edge lists (GraphSAGE family, GIN, LEConv)."""
    if isinstance(inputs, (list, tuple)):
        if len(inputs) == 2:
            x, second = inputs
            if isinstance(second, SparseMatrix):
                return x, second.index, second.value
            return x, second, None
        if len(inputs) == 3:
            return inputs[0], inputs[1], inputs[2]
    raise ValueError(
        "layer inputs must be [x, edge_index(, edge_weight)] or [x, SparseMatrix]")


def glorot_uniform():
    import flax.linen as nn
    return nn.initializers.glorot_uniform()


def zeros_init():
    import flax.linen as nn
    return nn.initializers.zeros_init()


def l2_loss(params, weight: float, key_filter: str = "kernel"):
    """Sum of 0.5·‖w‖² over params whose name contains ``key_filter``,
    matching the reference demos' L2-on-kernel convention (demo_gcn.py:57-61)."""
    import jax

    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(key_filter in str(n) for n in names):
            total = total + 0.5 * jnp.sum(leaf ** 2)
    return total * weight
