"""GIN: Graph Isomorphism Network (reference: nn/conv/gin.py:31-38):
h = MLP((1+ε)·x + A·x) with a binary adjacency."""
from __future__ import annotations

from ...sparse.matrix import SparseMatrix

__all__ = ["gin", "gin_updater"]


def gin_updater(x, reduced_neighbor_msg, eps):
    """gin.py:7-8."""
    return x * (1.0 + eps) + reduced_neighbor_msg


def gin(x, edge_index, mlp_model, eps: float = 0.0, training=None):
    """GIN forward (reference nn/conv/gin.py:31-38): h = MLP((1+ε)·x + A@x)."""
    num_nodes = x.shape[0]
    sparse_adj = SparseMatrix(edge_index, None, (num_nodes, num_nodes))
    neighbor_h = sparse_adj @ x
    h = gin_updater(x, neighbor_h, eps)
    try:
        return mlp_model(h, training=training)
    except TypeError:
        return mlp_model(h)
