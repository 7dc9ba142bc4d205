"""MinCutPool: spectral clustering pooling with min-cut + orthogonality losses
(reference: nn/pool/min_cut_pool.py).

Losses (min_cut_pool.py:8-90), computed per graph then averaged:
    cut  = mean_g( − tr(Sᵀ Ã S)_g / (tr(Sᵀ D S)_g + ε) )
    orth = mean_g( ‖ SᵀS/‖SᵀS‖_F − I/√C ‖_F )
with Ã the symmetric-normalized adjacency (no self-loops) and D its degree.

The traces are computed sparsely: tr(SᵀÃS)_g = Σ_{e∈g} Ã_e·⟨S[row_e], S[col_e]⟩
and tr(SᵀDS)_g = Σ_{n∈g} d_n·‖S[n]‖² — no [G·C, G·C] intermediates. Coarsening
shares the batched [G,C,C] path with DiffPool; self-loops of the pooled adj
are zeroed afterwards (min_cut_pool.py:127-146).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ...utils.graph_utils import adj_norm_edge
from ..kernel.segment import segment_sum
from .diff_pool import batched_cluster_coarsen

__all__ = ["min_cut_pool", "min_cut_pool_coarsen", "min_cut_pool_compute_losses"]


def min_cut_pool_compute_losses(edge_index, edge_weight, node_graph_index,
                                dense_assign, normed_edge_weight=None,
                                num_graphs: Optional[int] = None, cache=None):
    """Returns (cut_loss, orth_loss) — scalars averaged over graphs."""
    num_nodes, num_clusters = dense_assign.shape
    node_graph_index = jnp.asarray(node_graph_index, jnp.int32)
    from .common_pool import _resolve_num_graphs
    num_graphs = _resolve_num_graphs(node_graph_index, num_graphs)
    if normed_edge_weight is None:
        _, normed_edge_weight = adj_norm_edge(edge_index, num_nodes, edge_weight,
                                              add_self_loop=False, cache=cache)

    row, col = edge_index[0], edge_index[1]
    safe_row = jnp.clip(row, 0, num_nodes - 1)
    safe_col = jnp.clip(col, 0, num_nodes - 1)
    degree = segment_sum(normed_edge_weight, row, num_nodes)

    # tr(SᵀÃS) per graph
    s_dot = jnp.sum(jnp.take(dense_assign, safe_row, axis=0)
                    * jnp.take(dense_assign, safe_col, axis=0), axis=-1)
    edge_graph = jnp.where((row >= 0) & (row < num_nodes),
                           jnp.take(node_graph_index, safe_row), num_graphs)
    intra = segment_sum(normed_edge_weight * s_dot, edge_graph, num_graphs)

    # tr(SᵀDS) per graph
    node_term = degree * jnp.sum(dense_assign * dense_assign, axis=-1)
    all_sum = segment_sum(node_term, node_graph_index, num_graphs)

    cut_loss = jnp.mean(-intra / (all_sum + 1e-8))

    # orthogonality: SᵀS per graph via outer-product segment sum [G, C, C]
    outer = dense_assign[:, :, None] * dense_assign[:, None, :]
    STS = segment_sum(outer, node_graph_index, num_graphs)
    norm = jnp.sqrt(jnp.sum(STS * STS, axis=(-2, -1), keepdims=True))
    normed_STS = STS / (norm + 1e-8)
    eye = jnp.eye(num_clusters) / jnp.sqrt(jnp.asarray(num_clusters, jnp.float32))
    deviation = normed_STS - eye[None]
    orth_loss = jnp.mean(jnp.sqrt(jnp.sum(deviation * deviation, axis=(-2, -1))))
    return cut_loss, orth_loss


def min_cut_pool_coarsen(x, edge_index, edge_weight, node_graph_index, dense_assign,
                         num_nodes=None, num_clusters=None,
                         num_graphs: Optional[int] = None,
                         normed_edge_weight=None, cache=None):
    """min_cut_pool.py:93-146: coarsen over Ã, then zero pooled self-loops.

    ``num_nodes``/``num_clusters`` exist for reference-signature parity and
    must match ``dense_assign``'s shape when given (validated, not used)."""
    from .diff_pool import _check_assign_shape
    _check_assign_shape(dense_assign, num_nodes, num_clusters)
    n = dense_assign.shape[0]
    node_graph_index = jnp.asarray(node_graph_index, jnp.int32)
    from .common_pool import _resolve_num_graphs
    num_graphs = _resolve_num_graphs(node_graph_index, num_graphs)
    if edge_weight is None:
        edge_weight = jnp.ones((edge_index.shape[1],), jnp.float32)
    if normed_edge_weight is None:
        _, normed_edge_weight = adj_norm_edge(edge_index, n, edge_weight, cache=cache)

    pooled_x, pooled_edge_index, pooled_edge_weight, pooled_ngi = \
        batched_cluster_coarsen(x, edge_index, normed_edge_weight,
                                node_graph_index, dense_assign, num_graphs)
    # remove pooled self-loops by zeroing their weight (static shapes)
    is_loop = pooled_edge_index[0] == pooled_edge_index[1]
    pooled_edge_weight = jnp.where(is_loop, 0.0, pooled_edge_weight)
    return pooled_x, pooled_edge_index, pooled_edge_weight, pooled_ngi


def min_cut_pool(x, edge_index, edge_weight, node_graph_index,
                 feature_gnn: Callable, assign_gnn: Callable,
                 num_clusters: int, bias=None, activation=None,
                 gnn_use_normed_edge: bool = True,
                 return_loss_func: bool = False, return_losses: bool = False,
                 cache=None, training=None, num_graphs: Optional[int] = None):
    """min_cut_pool.py:149-232."""
    if return_loss_func and return_losses:
        raise ValueError("return_loss_func and return_losses are exclusive")
    if edge_weight is None:
        edge_weight = jnp.ones((edge_index.shape[1],), jnp.float32)
    num_nodes = x.shape[0]
    _, normed_edge_weight = adj_norm_edge(edge_index, num_nodes, edge_weight,
                                          add_self_loop=False, cache=cache)
    gnn_edge_weight = normed_edge_weight if gnn_use_normed_edge else edge_weight

    kwargs = {} if cache is None else {"cache": cache}
    assign_logits = assign_gnn([x, edge_index, gnn_edge_weight],
                               training=training, **kwargs)
    h = feature_gnn([x, edge_index, gnn_edge_weight], training=training, **kwargs)
    assign_probs = jax.nn.softmax(assign_logits, axis=-1)

    pooled_h, pooled_edge_index, pooled_edge_weight, pooled_ngi = min_cut_pool_coarsen(
        h, edge_index, edge_weight, node_graph_index, assign_probs,
        num_graphs=num_graphs, normed_edge_weight=normed_edge_weight)

    if bias is not None:
        pooled_h = pooled_h + bias
    if activation is not None:
        pooled_h = activation(pooled_h)
    outputs = pooled_h, pooled_edge_index, pooled_edge_weight, pooled_ngi

    if return_loss_func or return_losses:
        def loss_func():
            return min_cut_pool_compute_losses(
                edge_index, edge_weight, node_graph_index, assign_probs,
                normed_edge_weight=normed_edge_weight, num_graphs=num_graphs)
        if return_loss_func:
            return outputs, loss_func
        return outputs, loss_func()
    return outputs
