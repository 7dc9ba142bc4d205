"""LEConv: local-extremum scoring conv used by ASAP
(reference: nn/conv/le_conv.py:40-47).

h_i = self_h_i + Σ_{j∈N(i)} w_ij · (aggr_self_h_j − aggr_neighbor_h_j)
— note the reference gathers the *source* (col) side for both aggr terms;
we match that behavior exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernel.segment import segment_sum

__all__ = ["le_conv"]


def le_conv(x, edge_index, edge_weight,
            self_kernel, self_bias,
            aggr_self_kernel, aggr_self_bias,
            aggr_neighbor_kernel, aggr_neighbor_bias, activation=None):
    """LEConv forward (reference nn/conv/le_conv.py:40-47): self_h +
    Σ_j w_ij·(aggr_self_h_j − aggr_neighbor_h_j), the ASAP scoring conv."""
    num_nodes = x.shape[0]
    if edge_weight is None:
        edge_weight = jnp.ones((edge_index.shape[1],), jnp.float32)

    self_h = x @ self_kernel
    if self_bias is not None:
        self_h = self_h + self_bias
    aggr_self_h = x @ aggr_self_kernel
    if aggr_self_bias is not None:
        aggr_self_h = aggr_self_h + aggr_self_bias
    aggr_neighbor_h = x @ aggr_neighbor_kernel
    if aggr_neighbor_bias is not None:
        aggr_neighbor_h = aggr_neighbor_h + aggr_neighbor_bias

    row, col = edge_index[0], edge_index[1]
    safe_col = jnp.clip(col, 0, num_nodes - 1)
    repeated = (jnp.take(aggr_self_h, safe_col, axis=0)
                - jnp.take(aggr_neighbor_h, safe_col, axis=0))
    repeated = repeated * jnp.expand_dims(edge_weight, -1)
    aggr_h = segment_sum(repeated, row, num_nodes)

    h = self_h + aggr_h
    if activation is not None:
        h = activation(h)
    return h
