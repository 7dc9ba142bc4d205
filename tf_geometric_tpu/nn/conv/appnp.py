"""APPNP: MLP encoder + personalized-PageRank propagation
(reference: nn/conv/appnp.py:11-92)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...sparse.matrix import SparseMatrix
from .gcn import compile_and_dropout, compute_cache_key, gcn_norm_adj

__all__ = ["appnp"]


def _dropout(h, rate, key):
    if key is None or rate <= 0.0:
        return h
    keep = jax.random.bernoulli(key, 1.0 - rate, h.shape)
    return jnp.where(keep, h / (1.0 - rate), 0.0)


def mlp_encode(x, kernels, biases, dense_activation, dense_drop_rate,
               last_dense_drop_rate, training, dropout_key):
    """Shared MLP encoder with the reference's per-layer dropout schedule
    (appnp.py:64-81): activation+dropout after every layer except the last,
    which gets only ``last_dense_drop_rate``."""
    h = x
    if kernels is None:
        return h
    num_dense_layers = len(kernels)
    keys = (jax.random.split(dropout_key, num_dense_layers)
            if (training and dropout_key is not None) else [None] * num_dense_layers)
    for i, (kernel, bias) in enumerate(zip(kernels, biases)):
        h = h.matmul(kernel) if isinstance(h, SparseMatrix) else h @ kernel
        if bias is not None:
            h = h + bias
        if i < num_dense_layers - 1:
            if dense_activation is not None:
                h = dense_activation(h)
            if training:
                h = _dropout(h, dense_drop_rate, keys[i])
        elif training:
            h = _dropout(h, last_dense_drop_rate, keys[i])
    return h


def appnp(x, edge_index, edge_weight, kernels, biases,
          dense_activation=jax.nn.relu, activation=None,
          k: int = 10, alpha: float = 0.1,
          dense_drop_rate: float = 0.0, last_dense_drop_rate: float = 0.0,
          edge_drop_rate: float = 0.0, cache=None, training: bool = False,
          dropout_key=None):
    """h = MLP(x); out_{t+1} = (1-α)·Â·out_t + α·h, k iterations (appnp.py:85-87)."""
    num_nodes = x.shape[0]
    normed_adj = gcn_norm_adj(
        SparseMatrix(edge_index, edge_weight, (num_nodes, num_nodes)), cache=cache)
    edge_key = mlp_key = None
    if training and dropout_key is not None:
        edge_key, mlp_key = jax.random.split(dropout_key)
    normed_adj = compile_and_dropout(
        normed_adj, cache, compute_cache_key("both", True, True, True, False),
        edge_drop_rate, edge_key, training)

    h = mlp_encode(x, kernels, biases, dense_activation, dense_drop_rate,
                   last_dense_drop_rate, training, mlp_key)

    output = h
    for _ in range(k):
        output = normed_adj @ output
        output = output * (1.0 - alpha) + h * alpha

    if activation is not None:
        output = activation(output)
    return output
