"""TAGCN: Topology Adaptive GCN (reference: nn/conv/tagcn.py:37-44):
concat [x, Âx, …, Â^k x] then a single kernel. Default renorm=False."""
from __future__ import annotations

import jax.numpy as jnp

from ...sparse.matrix import SparseMatrix
from .gcn import compute_cache_key, gcn_norm_adj, maybe_compile_ell

__all__ = ["tagcn"]


def tagcn(x, edge_index, edge_weight, k: int, kernel, bias=None, activation=None,
          renorm: bool = False, improved: bool = False, cache=None):
    """TAGCN forward (reference nn/conv/tagcn.py:37-44): concat
    [x, Âx, …, Â^k x] then a single kernel; default renorm=False."""
    num_nodes = x.shape[0]
    normed_adj = gcn_norm_adj(
        SparseMatrix(edge_index, edge_weight, (num_nodes, num_nodes)),
        renorm=renorm, improved=improved, cache=cache)
    normed_adj = maybe_compile_ell(
        normed_adj, cache, compute_cache_key("both", True, True, renorm, improved))

    if isinstance(x, SparseMatrix):
        x = x.to_dense()

    xs = [x]
    for _ in range(k):
        xs.append(normed_adj @ xs[-1])
    h = jnp.concatenate(xs, axis=-1)

    out = h @ kernel
    if bias is not None:
        out = out + bias
    if activation is not None:
        out = activation(out)
    return out
