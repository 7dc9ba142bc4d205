"""Pooling layer wrappers (reference: layers/pool/*.py).

Flax has no Keras ``add_loss``; MinCutPool instead ``sow``s its auxiliary
losses into the ``"losses"`` collection (retrieve via
``model.apply(..., mutable=["losses"])``) and also supports
``return_losses=True`` like the reference (layers/pool/min_cut_pool.py:63-77).

Known reference bug NOT replicated: the Mean/Min/Max/SumPool wrappers pass
``pool_func`` positionally into ``tf.keras.Model.__init__``
(layers/pool/common_pool.py:22-39); here they are plain modules.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax

from ...nn.pool.asap import asap
from ...nn.pool.common_pool import max_pool, mean_pool, min_pool, sum_pool
from ...nn.pool.diff_pool import diff_pool
from ...nn.pool.min_cut_pool import min_cut_pool
from ...nn.pool.sag_pool import sag_pool
from ...nn.pool.set2set import set2set
from ...nn.pool.sort_pool import sort_pool
from ..base import glorot_uniform, zeros_init

__all__ = ["CommonPool", "MeanPool", "SumPool", "MaxPool", "MinPool",
           "DiffPool", "MinCutPool", "SAGPool", "SortPool", "ASAP", "Set2Set"]


class CommonPool(nn.Module):
    """Whole-graph readout wrapper (layers/pool/common_pool.py)."""
    pool_func: Callable = None
    num_graphs: Optional[int] = None

    def __call__(self, inputs, training: bool = False):
        x, node_graph_index = inputs
        return self.pool_func(x, node_graph_index, num_graphs=self.num_graphs)


class MeanPool(CommonPool):
    pool_func: Callable = staticmethod(mean_pool)


class SumPool(CommonPool):
    pool_func: Callable = staticmethod(sum_pool)


class MaxPool(CommonPool):
    pool_func: Callable = staticmethod(max_pool)


class MinPool(CommonPool):
    pool_func: Callable = staticmethod(min_pool)


class DiffPool(nn.Module):
    """layers/pool/diff_pool.py (54 LoC): owns only the bias; GNNs injected."""
    feature_gnn: Callable = None
    assign_gnn: Callable = None
    units: Optional[int] = None
    num_clusters: int = 2
    activation: Optional[Callable] = None
    use_bias: bool = True
    num_graphs: Optional[int] = None

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight, node_graph_index = inputs
        bias = None
        if self.use_bias:
            if self.units is None:
                raise ValueError('"units" is required when use_bias=True')
            bias = self.param("bias", zeros_init(), (self.units,))
        return diff_pool(x, edge_index, edge_weight, node_graph_index,
                         self.feature_gnn, self.assign_gnn, self.num_clusters,
                         bias=bias, activation=self.activation,
                         training=training, cache=cache,
                         num_graphs=self.num_graphs)


class MinCutPool(nn.Module):
    """layers/pool/min_cut_pool.py (78 LoC): sows (cut, orth) losses."""
    feature_gnn: Callable = None
    assign_gnn: Callable = None
    units: Optional[int] = None
    num_clusters: int = 2
    activation: Optional[Callable] = None
    use_bias: bool = True
    gnn_use_normed_edge: bool = True
    num_graphs: Optional[int] = None

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False,
                 return_loss_func: bool = False, return_losses: bool = False):
        if return_loss_func and return_losses:
            raise ValueError("return_loss_func and return_losses are exclusive")
        x, edge_index, edge_weight, node_graph_index = inputs
        bias = None
        if self.use_bias:
            if self.units is None:
                raise ValueError('"units" is required when use_bias=True')
            bias = self.param("bias", zeros_init(), (self.units,))
        outputs, loss_func = min_cut_pool(
            x, edge_index, edge_weight, node_graph_index,
            self.feature_gnn, self.assign_gnn, self.num_clusters,
            bias=bias, activation=self.activation,
            gnn_use_normed_edge=self.gnn_use_normed_edge,
            training=training, cache=cache, return_loss_func=True,
            num_graphs=self.num_graphs)
        losses = loss_func()
        self.sow("losses", "min_cut_losses", losses,
                 reduce_fn=lambda prev, new: new)
        if return_loss_func:
            return outputs, (lambda: losses)
        if return_losses:
            return outputs, losses
        return outputs


class SAGPool(nn.Module):
    """layers/pool/sag_pool.py (39 LoC): GNN-injected scoring + top-k."""
    score_gnn: Callable = None
    k: Optional[int] = None
    ratio: Optional[float] = None
    score_activation: Optional[Callable] = None
    num_graphs: Optional[int] = None

    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight, node_graph_index = inputs
        return sag_pool(x, edge_index, edge_weight, node_graph_index,
                        self.score_gnn, k=self.k, ratio=self.ratio,
                        score_activation=self.score_activation,
                        training=training, cache=cache,
                        num_graphs=self.num_graphs)


class SortPool(nn.Module):
    """layers/pool/sort_pool.py (36 LoC)."""
    k: Optional[int] = None
    ratio: Optional[float] = None
    sort_index: int = -1
    num_graphs: Optional[int] = None

    def __call__(self, inputs, training: bool = False):
        x, edge_index, edge_weight, node_graph_index = inputs
        return sort_pool(x, edge_index, edge_weight, node_graph_index,
                         k=self.k, ratio=self.ratio, sort_index=self.sort_index,
                         training=training, num_graphs=self.num_graphs)


class ASAP(nn.Module):
    """layers/pool/asap.py (107 LoC): owns all 11 weight tensors
    (layers/pool/asap.py:59-87)."""
    units: int
    k: Optional[int] = None
    ratio: Optional[float] = None
    drop_rate: float = 0.0
    le_conv_activation: Callable = jax.nn.sigmoid
    use_bias: bool = True
    num_graphs: Optional[int] = None

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight, node_graph_index = inputs
        f = x.shape[-1]
        u = self.units

        def w(name, shape):
            return self.param(name, glorot_uniform(), shape)

        def b(name, shape):
            return self.param(name, zeros_init(), shape) if self.use_bias else None

        dropout_key = None
        if training and self.drop_rate > 0:
            dropout_key = self.make_rng("dropout")
        return asap(
            x, edge_index, edge_weight, node_graph_index,
            attention_gcn_kernel=w("attention_gcn_kernel", (f, u)),
            attention_gcn_bias=b("attention_gcn_bias", (u,)),
            attention_query_kernel=w("attention_query_kernel", (u, u)),
            attention_query_bias=b("attention_query_bias", (u,)),
            attention_score_kernel=w("attention_score_kernel", (2 * u, 1)),
            attention_score_bias=b("attention_score_bias", (1,)),
            le_conv_self_kernel=w("le_conv_self_kernel", (f, 1)),
            le_conv_self_bias=b("le_conv_self_bias", (1,)),
            le_conv_aggr_self_kernel=w("le_conv_aggr_self_kernel", (f, 1)),
            le_conv_aggr_self_bias=b("le_conv_aggr_self_bias", (1,)),
            le_conv_aggr_neighbor_kernel=w("le_conv_aggr_neighbor_kernel", (f, 1)),
            le_conv_aggr_neighbor_bias=b("le_conv_aggr_neighbor_bias", (1,)),
            k=self.k, ratio=self.ratio,
            le_conv_activation=self.le_conv_activation,
            drop_rate=self.drop_rate, training=training, cache=cache,
            dropout_key=dropout_key, num_graphs=self.num_graphs)


class Set2Set(nn.Module):
    """layers/pool/set2set.py (37 LoC): owns the LSTM cell."""
    num_iterations: int = 4
    num_graphs: Optional[int] = None

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        x, node_graph_index = inputs
        units = x.shape[-1]
        cell = nn.OptimizedLSTMCell(units)

        def lstm_fn(h, state):
            if state is None:
                state = cell.initialize_carry(jax.random.PRNGKey(0),
                                              h.shape[:1] + (units,))
            state, out = cell(state, h)
            return out, state

        return set2set(x, node_graph_index, lstm_fn, self.num_iterations,
                       training=training, num_graphs=self.num_graphs)
