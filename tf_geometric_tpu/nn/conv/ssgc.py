"""SSGC / S²GC: Simple Spectral Graph Convolution
(reference: nn/conv/ssgc.py:89-94): out = α·h + Σ_k (1-α)/k · Â^k h."""
from __future__ import annotations

import jax

from ...sparse.matrix import SparseMatrix
from .appnp import mlp_encode
from .gcn import compile_and_dropout, compute_cache_key, gcn_norm_adj

__all__ = ["ssgc"]


def ssgc(x, edge_index, edge_weight, kernels=None, biases=None,
         k: int = 10, alpha: float = 0.1,
         dense_activation=jax.nn.relu, activation=None,
         dense_drop_rate: float = 0.0, last_dense_drop_rate: float = 0.0,
         edge_drop_rate: float = 0.0, cache=None, training: bool = False,
         dropout_key=None):
    """SSGC / S²GC forward (reference nn/conv/ssgc.py:89-94): MLP encoder
    then out = α·h + Σ_k (1−α)/k · Â^k h."""
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

    output = h * alpha
    for _ in range(k):
        h = normed_adj @ h
        output = output + (1.0 - alpha) * h / k

    if activation is not None:
        output = activation(output)
    return output
