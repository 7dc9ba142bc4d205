"""GraphSAGE: six aggregator variants (reference: nn/conv/graph_sage.py).

All variants share the skeleton: aggregate neighbor features (mean / sum /
normalized-sum / MLP+mean-pool / MLP+max-pool / LSTM), project with
``neighbor_kernel``, project self features with ``self_kernel``, combine by
``concat`` or add, then bias/activation/optional L2-normalize.

Known reference bug NOT replicated (SURVEY §7): ``gcn_graph_sage`` /
``mean_pool_graph_sage`` / ``max_pool_graph_sage`` overwrite user-provided
``edge_weight`` with ones (`if edge_weight is not None: edge_weight =
tf.ones(...)`, graph_sage.py:139-140,190-191,253-254). Here edge weights
default to ones only when **absent**.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..kernel.map_reduce import gcn_mapper
from ..kernel.segment import segment_max, segment_mean, segment_sum
from .gcn import gcn_norm_edge

__all__ = [
    "mean_graph_sage", "sum_graph_sage", "gcn_graph_sage",
    "mean_pool_graph_sage", "max_pool_graph_sage", "lstm_graph_sage",
    "mean_graph_sage_fixed_k", "sum_graph_sage_fixed_k",
]


def _l2_normalize(h, eps: float = 1e-12):
    return h / jnp.sqrt(jnp.maximum(jnp.sum(h * h, axis=-1, keepdims=True), eps))


def _finish(from_x, from_neighbor, bias, activation, concat, normalize):
    h = (jnp.concatenate([from_x, from_neighbor], axis=1) if concat
         else from_x + from_neighbor)
    if bias is not None:
        h = h + bias
    if activation is not None:
        h = activation(h)
    if normalize:
        h = _l2_normalize(h)
    return h


def _gather_messages(x, edge_index, edge_weight):
    num_nodes = x.shape[0]
    row, col = edge_index[0], edge_index[1]
    neighbor_x = jnp.take(x, jnp.clip(col, 0, num_nodes - 1), axis=0)
    if edge_weight is not None:
        neighbor_x = gcn_mapper(None, neighbor_x, edge_weight=edge_weight)
    return row, neighbor_x


def mean_graph_sage(x, edge_index, edge_weight, self_kernel, neighbor_kernel,
                    bias=None, activation=None, concat=True, normalize=False):
    """graph_sage.py:9-60."""
    num_nodes = x.shape[0]
    row, neighbor_x = _gather_messages(x, edge_index, edge_weight)
    reduced = segment_mean(neighbor_x, row, num_nodes)
    return _finish(x @ self_kernel, reduced @ neighbor_kernel,
                   bias, activation, concat, normalize)


def _fixed_k_reduce(x, neighbor_idx, neighbor_weight, neighbor_kernel,
                    compute_dtype):
    """Weighted slot-lane SUM of sampled neighbors, matmul-first when the
    kernel narrows the features.

    ``neighbor_idx``/``neighbor_weight`` are SLOT-MAJOR [k, S]
    (``RandomNeighborSampler.sample_dense``): one contiguous row per slot
    lane, the measured-fast layout for jit-argument packing. The mean/sum
    aggregators are linear, so when ``neighbor_kernel`` narrows the feature
    dim the projection runs FIRST (one MXU matmul at [N, F_in]) and the k
    gather lanes move F_out-wide rows instead of F_in-wide ones — at Reddit
    scale (F 602→128) that is ~4.7× less gather traffic. The slot loop is
    Python-unrolled (fori_loop streams the [S, F] accumulator through HBM
    every iteration — docs/performance.md). Forward is scatter-free; only
    deeper layers pay a scatter in backward (layer-0 input features are
    non-differentiated arguments)."""
    n = x.shape[0]
    matmul_first = neighbor_kernel.shape[1] < x.shape[1]
    src = x @ neighbor_kernel if matmul_first else x
    if compute_dtype is not None:
        src = src.astype(compute_dtype)
    k = neighbor_idx.shape[0]
    acc = jnp.zeros((neighbor_idx.shape[1],) + src.shape[1:], src.dtype)
    for j in range(k):
        col_j = jnp.clip(neighbor_idx[j], 0, n - 1)
        acc = acc + jnp.take(src, col_j, axis=0) \
            * neighbor_weight[j][:, None].astype(src.dtype)
    acc = acc.astype(x.dtype)
    return acc if matmul_first else acc @ neighbor_kernel, k


def mean_graph_sage_fixed_k(x, neighbor_idx, neighbor_weight, self_kernel,
                            neighbor_kernel, bias=None, activation=None,
                            concat=True, normalize=False, compute_dtype=None):
    """TPU-native fixed-k variant of ``mean_graph_sage`` over a dense
    slot-major [k, S] neighbor draw (with-replacement ``padding=True``
    semantics: the mean divides by k, so weight-0 pad slots count as zeros —
    identical to ``segment_mean`` over the flattened fixed-k edge list)."""
    summed, k = _fixed_k_reduce(x, neighbor_idx, neighbor_weight,
                                neighbor_kernel, compute_dtype)
    return _finish(x @ self_kernel, summed / k,
                   bias, activation, concat, normalize)


def sum_graph_sage_fixed_k(x, neighbor_idx, neighbor_weight, self_kernel,
                           neighbor_kernel, bias=None, activation=None,
                           concat=True, normalize=False, compute_dtype=None):
    """Fixed-k variant of ``sum_graph_sage`` (see mean_graph_sage_fixed_k)."""
    summed, _ = _fixed_k_reduce(x, neighbor_idx, neighbor_weight,
                                neighbor_kernel, compute_dtype)
    return _finish(x @ self_kernel, summed,
                   bias, activation, concat, normalize)


def sum_graph_sage(x, edge_index, edge_weight, self_kernel, neighbor_kernel,
                   bias=None, activation=None, concat=True, normalize=False):
    """graph_sage.py:64-115."""
    num_nodes = x.shape[0]
    row, neighbor_x = _gather_messages(x, edge_index, edge_weight)
    reduced = segment_sum(neighbor_x, row, num_nodes)
    return _finish(x @ self_kernel, reduced @ neighbor_kernel,
                   bias, activation, concat, normalize)


def gcn_graph_sage(x, edge_index, edge_weight, kernel, bias=None, activation=None,
                   normalize=False, cache=None):
    """GCN-style aggregator (graph_sage.py:118-161): symmetric-normalized
    neighbor sum, single kernel, no self path.

    renorm=False matches the reference's executed behavior: graph_sage.py:141
    passes ``cache`` positionally into gcn_norm_edge's ``renorm`` slot, and
    every live call path hands it None or an empty dict — both falsy — so the
    reference always normalizes first and adds the self-loop after (pinned by
    tests/test_reference_parity.py::sage_gcn). Note the reference also
    overwrites user edge weights with ones there (:139-140); that bug is NOT
    replicated — pass unit weights for bit-parity."""
    num_nodes = x.shape[0]
    normed_index, normed_weight = gcn_norm_edge(edge_index, num_nodes,
                                                edge_weight, renorm=False,
                                                cache=cache)
    row = normed_index[0]
    neighbor_x = jnp.take(x, jnp.clip(normed_index[1], 0, num_nodes - 1), axis=0)
    neighbor_x = gcn_mapper(None, neighbor_x, edge_weight=normed_weight)
    reduced = segment_sum(neighbor_x, row, num_nodes)
    h = reduced @ kernel
    if bias is not None:
        h = h + bias
    if activation is not None:
        h = activation(h)
    if normalize:
        h = _l2_normalize(h)
    return h


def mean_pool_graph_sage(x, edge_index, edge_weight,
                         self_kernel, neighbor_mlp_kernel, neighbor_kernel,
                         neighbor_mlp_bias=None, bias=None, activation=None,
                         concat=True, normalize=False):
    """Per-edge MLP then mean (graph_sage.py:164-225; activation applied both
    to the edge MLP and the output, as in the reference)."""
    num_nodes = x.shape[0]
    row, neighbor_x = _gather_messages(x, edge_index, edge_weight)
    h = neighbor_x @ neighbor_mlp_kernel
    if neighbor_mlp_bias is not None:
        h = h + neighbor_mlp_bias
    if activation is not None:
        h = activation(h)
    reduced = segment_mean(h, row, num_nodes)
    return _finish(x @ self_kernel, reduced @ neighbor_kernel,
                   bias, activation, concat, normalize)


def max_pool_graph_sage(x, edge_index, edge_weight,
                        self_kernel, neighbor_mlp_kernel, neighbor_kernel,
                        neighbor_mlp_bias=None, bias=None, activation=None,
                        concat=True, normalize=False):
    """Per-edge MLP then max (graph_sage.py:228-287)."""
    num_nodes = x.shape[0]
    row, neighbor_x = _gather_messages(x, edge_index, edge_weight)
    h = neighbor_x @ neighbor_mlp_kernel
    if neighbor_mlp_bias is not None:
        h = h + neighbor_mlp_bias
    if activation is not None:
        h = activation(h)
    reduced = segment_max(h, row, num_nodes)
    return _finish(x @ self_kernel, reduced @ neighbor_kernel,
                   bias, activation, concat, normalize)


def lstm_graph_sage(x, edge_index, lstm, self_kernel, neighbor_kernel,
                    bias=None, activation=None, concat=True, normalize=False,
                    training=False, max_neighbors: Optional[int] = None):
    """LSTM aggregator (graph_sage.py:290-356): pack each node's neighbors
    into a dense [N, K, F] matrix (missing slots → a zero row), run the LSTM
    over the neighbor axis, mean over time.

    TPU note: ``max_neighbors`` (K) must be static under jit; if omitted it is
    derived from the data (eager only). ``lstm`` is any callable
    ``[N, K, F] → [N, K, H]`` (e.g. a flax RNN applied via closure).
    """
    num_nodes = x.shape[0]
    num_edges = edge_index.shape[1]
    row, col = edge_index[0], edge_index[1]

    order = jnp.argsort(row)
    row_s = jnp.take(row, order)
    col_s = jnp.take(col, order)

    degree = segment_sum(jnp.ones((num_edges,), jnp.int32), row_s, num_nodes)
    if max_neighbors is None:
        max_neighbors = int(jax.device_get(jnp.max(degree)))
    before = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(degree)[:-1].astype(jnp.int32)])
    slot = jnp.arange(num_edges, dtype=jnp.int32) - jnp.take(
        before, jnp.clip(row_s, 0, num_nodes - 1))

    # scatter col ids into [N, K]; overflow slots (slot >= K) and padded
    # edges land out of range and are dropped
    neighbor_matrix = jnp.full((num_nodes, max_neighbors), num_nodes, jnp.int32)
    in_range = (slot < max_neighbors) & (row_s >= 0) & (row_s < num_nodes)
    scatter_rows = jnp.where(in_range, row_s, num_nodes)
    neighbor_matrix = neighbor_matrix.at[
        scatter_rows, jnp.clip(slot, 0, max_neighbors - 1)
    ].set(col_s, mode="drop")

    padded_x = jnp.concatenate([x, jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0)
    neighbor_x = jnp.take(padded_x, neighbor_matrix, axis=0)  # [N, K, F]

    try:
        neighbor_h = lstm(neighbor_x, training=training)
    except TypeError:
        neighbor_h = lstm(neighbor_x)
    reduced = jnp.mean(neighbor_h, axis=1)

    return _finish(x @ self_kernel, reduced @ neighbor_kernel,
                   bias, activation, concat, normalize)
