"""ASAP: Adaptive Structure Aware Pooling (reference: nn/pool/asap.py:54-127).

Pipeline: GCN embedding → per-cluster attention over (max-pooled query ‖
member features) with LeakyReLU + segment-softmax → attention-weighted
cluster features → LeConv node scores → per-graph top-k clusters →
assignment matrix from kept rows → Sᵀ A S coarsening + self-loop fixup.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...sparse.matrix import SparseMatrix
from ...utils.graph_utils import add_self_loop_edge, remove_self_loop_edge
from ...utils.union_utils import convert_union_to_numpy
from ..conv.gcn import gcn
from ..conv.le_conv import le_conv
from ..kernel.map_reduce import (aggregate_neighbors, gcn_mapper, identity_mapper,
                                 max_reducer, sum_reducer)
from ..kernel.segment import segment_softmax
from .cluster_pool import cluster_pool
from .topk_pool import topk_pool

__all__ = ["asap"]


def asap(x, edge_index, edge_weight, node_graph_index,
         attention_gcn_kernel, attention_gcn_bias,
         attention_query_kernel, attention_query_bias,
         attention_score_kernel, attention_score_bias,
         le_conv_self_kernel, le_conv_self_bias,
         le_conv_aggr_self_kernel, le_conv_aggr_self_bias,
         le_conv_aggr_neighbor_kernel, le_conv_aggr_neighbor_bias,
         k: Optional[int] = None, ratio: Optional[float] = None,
         le_conv_activation=jax.nn.sigmoid,
         drop_rate: float = 0.0, training=None, cache=None, dropout_key=None,
         num_graphs: Optional[int] = None):
    """ASAP pooling (reference nn/pool/asap.py:54-127): GCN cluster
    features, LeConv node scores, attention over (max-query ‖ member), top-k
    clusters, cluster_pool coarsening with self-loop fixup."""
    num_nodes = x.shape[0]

    fixed_mode = k is not None and num_graphs is not None
    if k is not None and ratio is not None:
        raise ValueError("provide either k or ratio for asap, not both")
    if fixed_mode:
        # jit/grad-safe: self-loops are masked (static shapes), not filtered
        from ...utils.graph_utils import mask_self_loop_edge
        edge_index, edge_weight = mask_self_loop_edge(
            jnp.asarray(edge_index), num_nodes,
            None if edge_weight is None else jnp.asarray(edge_weight))
        if edge_weight is None:
            edge_weight = jnp.where(edge_index[0] < num_nodes, 1.0, 0.0)
    else:
        edge_index, edge_weight = remove_self_loop_edge(
            convert_union_to_numpy(edge_index),
            None if edge_weight is None else convert_union_to_numpy(edge_weight))
    edge_index_sl, edge_weight_sl = add_self_loop_edge(
        edge_index, num_nodes=num_nodes, edge_weight=edge_weight)
    edge_index_sl = jnp.asarray(edge_index_sl)
    row_sl, col_sl = edge_index_sl[0], edge_index_sl[1]

    adj = SparseMatrix(edge_index, edge_weight, (num_nodes, num_nodes))
    # cache=None deliberately: this adjacency is the SELF-LOOP-STRIPPED graph
    # — sharing the caller's cache would collide with the full graph's
    # normalization under the same gcn key and silently serve the wrong Â
    attention_h = gcn(x, adj, attention_gcn_kernel, attention_gcn_bias,
                      cache=None)

    # query: per-cluster (per-node incl. self-loop) neighborhood max (asap.py:58-66)
    attention_query = aggregate_neighbors(
        attention_h, edge_index_sl, None,
        mapper=identity_mapper, reducer=max_reducer, num_nodes=num_nodes)
    attention_query = attention_query @ attention_query_kernel + attention_query_bias

    # NOTE: jnp.take fills NaN for out-of-bounds ids under jit — always clip
    # (masked/padded edges carry row == num_nodes)
    rep_query = jnp.take(attention_query, jnp.clip(row_sl, 0, num_nodes - 1), axis=0)
    rep_member = jnp.take(attention_h, jnp.clip(col_sl, 0, num_nodes - 1), axis=0)
    score_h = jnp.concatenate([rep_query, rep_member], axis=-1)
    att_score = score_h @ attention_score_kernel + attention_score_bias
    att_score = jax.nn.leaky_relu(att_score, negative_slope=0.2)

    normed_att_score = segment_softmax(att_score, row_sl, num_nodes)
    if training and drop_rate > 0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - drop_rate,
                                    normed_att_score.shape)
        normed_att_score = jnp.where(keep, normed_att_score / (1.0 - drop_rate), 0.0)

    cluster_h = aggregate_neighbors(
        x, edge_index_sl, normed_att_score.reshape(-1),
        mapper=gcn_mapper, reducer=sum_reducer, num_nodes=num_nodes)

    node_score = le_conv(cluster_h, jnp.asarray(edge_index),
                         None if edge_weight is None else jnp.asarray(edge_weight),
                         le_conv_self_kernel, le_conv_self_bias,
                         le_conv_aggr_self_kernel, le_conv_aggr_self_bias,
                         le_conv_aggr_neighbor_kernel, le_conv_aggr_neighbor_bias,
                         activation=None)

    if fixed_mode:
        # jit/grad-safe fixed-k path: padded G·k cluster capacity, invalid
        # slots dropped by out-of-range ids downstream
        from .topk_pool import topk_pool_fixed
        topk_idx, topk_valid = topk_pool_fixed(node_graph_index, node_score,
                                               num_graphs, k)
        num_clusters = int(topk_idx.shape[0])
        safe_idx = jnp.clip(topk_idx, 0, num_nodes - 1)
        topk_node_score = jnp.take(node_score, safe_idx, axis=0)
        if le_conv_activation is not None:
            topk_node_score = le_conv_activation(topk_node_score)
        pooled_x = jnp.where(topk_valid[:, None],
                             jnp.take(cluster_h, safe_idx, axis=0) * topk_node_score,
                             0.0)
        reverse = jnp.full((num_nodes + 1,), -1, jnp.int32)
        # invalid slots scatter out of bounds (dropped); reverse[num_nodes]
        # stays -1 so masked/padded edges never map to a cluster
        scatter_at = jnp.where(topk_valid, safe_idx, num_nodes + 1)
        reverse = reverse.at[scatter_at].set(
            jnp.arange(num_clusters, dtype=jnp.int32), mode="drop")
        assign_cluster = reverse[jnp.clip(row_sl, 0, num_nodes)]
        keep_edge = assign_cluster >= 0
        assign_edge_index = jnp.stack([
            jnp.where(keep_edge, col_sl, num_nodes),        # node side
            jnp.clip(assign_cluster, 0, num_clusters - 1),  # cluster side
        ], axis=0)
        assign_edge_weight = jax.lax.stop_gradient(
            jnp.where(keep_edge, normed_att_score.reshape(-1), 0.0))
        _, pooled_edge_index, pooled_edge_weight = cluster_pool(
            None, edge_index_sl, jnp.asarray(edge_weight_sl),
            assign_edge_index, assign_edge_weight,
            num_clusters, num_nodes=num_nodes, dense_output_edges=True)
        loops = pooled_edge_index[0] == pooled_edge_index[1]
        pooled_edge_weight = jnp.where(loops, 0.0, pooled_edge_weight)
        pooled_edge_index, pooled_edge_weight = add_self_loop_edge(
            pooled_edge_index, num_clusters, pooled_edge_weight)
        ngi = jnp.asarray(node_graph_index, jnp.int32)
        pooled_node_graph_index = jnp.where(
            topk_valid, jnp.take(ngi, safe_idx),
            num_graphs if num_graphs is not None else 0)
        return pooled_x, pooled_edge_index, pooled_edge_weight, pooled_node_graph_index

    topk_node_index = topk_pool(node_graph_index, node_score, k=k, ratio=ratio)
    topk_node_score = jnp.take(node_score, jnp.asarray(topk_node_index), axis=0)
    if le_conv_activation is not None:
        topk_node_score = le_conv_activation(topk_node_score)

    pooled_x = jnp.take(cluster_h, jnp.asarray(topk_node_index), axis=0) * topk_node_score

    # node → kept-cluster assignment from the attention rows (asap.py:100-119)
    num_clusters = len(topk_node_index)
    reverse = np.full(num_nodes, -1, np.int64)
    reverse[convert_union_to_numpy(topk_node_index, np.int64)] = np.arange(num_clusters)
    row_np = convert_union_to_numpy(row_sl, np.int64)
    col_np = convert_union_to_numpy(col_sl, np.int64)
    assign_row = reverse[row_np]
    assign_mask = assign_row >= 0
    assign_edge_index = np.stack([assign_row[assign_mask],
                                  col_np[assign_mask]], axis=0)
    # reference transposes to (cluster, node) == (row=cluster, col=node)
    assign_edge_weight = jax.lax.stop_gradient(
        normed_att_score.reshape(-1)[jnp.asarray(np.nonzero(assign_mask)[0])])

    # NOTE: cluster_pool expects node→cluster (row=node, col=cluster)
    assign_edge_index = assign_edge_index[::-1].copy()

    _, pooled_edge_index, pooled_edge_weight = cluster_pool(
        None, edge_index_sl, jnp.asarray(edge_weight_sl),
        np.asarray(assign_edge_index), assign_edge_weight,
        num_clusters, num_nodes=num_nodes)

    pooled_edge_index = convert_union_to_numpy(pooled_edge_index)
    keep = pooled_edge_index[0] != pooled_edge_index[1]
    kept_pos = np.nonzero(keep)[0]
    pooled_edge_index = pooled_edge_index[:, keep]
    pooled_edge_weight = jnp.take(jnp.asarray(pooled_edge_weight),
                                  jnp.asarray(kept_pos))
    pooled_edge_index, pooled_edge_weight = add_self_loop_edge(
        pooled_edge_index, num_clusters, pooled_edge_weight)

    pooled_node_graph_index = convert_union_to_numpy(
        node_graph_index, np.int32)[convert_union_to_numpy(topk_node_index, np.int64)]

    return pooled_x, np.asarray(pooled_edge_index), pooled_edge_weight, pooled_node_graph_index
