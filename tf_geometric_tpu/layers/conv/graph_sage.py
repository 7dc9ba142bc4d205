"""GraphSAGE layers — six aggregator variants
(reference: layers/conv/graph_sage.py, 421 LoC).

Kernel sizing follows the reference: with ``concat=True`` each of
self/neighbor kernels produces ``units // 2`` features so the concat output
is ``units``; mean-/max-pool variants use a ``kernel_units·4``-wide edge MLP.
The LSTM variant uses a flax ``OptimizedLSTMCell`` scanned over the neighbor
axis (return_sequences semantics, graph_sage.py:392-394).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax

from ...nn.conv.graph_sage import (gcn_graph_sage, lstm_graph_sage,
                                   max_pool_graph_sage, mean_graph_sage,
                                   mean_pool_graph_sage, sum_graph_sage)
from ..base import glorot_uniform, unpack_edge_inputs, zeros_init

__all__ = ["MeanGraphSage", "SumGraphSage", "GCNGraphSage",
           "MeanPoolGraphSage", "MaxPoolGraphSage", "LSTMGraphSage"]


class _PairKernelSage(nn.Module):
    """Shared scaffolding for mean/sum variants (self + neighbor kernels)."""
    units: int
    activation: Optional[Callable] = jax.nn.relu
    use_bias: bool = True
    concat: bool = True
    normalize: bool = False

    _op = None

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        if self.concat and self.units % 2 != 0:
            raise ValueError("units must be an even number if concat is True")
        kernel_units = self.units // 2 if self.concat else self.units
        f = x.shape[-1]
        self_kernel = self.param("self_kernel", glorot_uniform(), (f, kernel_units))
        neighbor_kernel = self.param("neighbor_kernel", glorot_uniform(),
                                     (f, kernel_units))
        bias = self.param("bias", zeros_init(), (self.units,)) if self.use_bias else None
        return type(self)._op(x, edge_index, edge_weight, self_kernel,
                              neighbor_kernel, bias=bias,
                              activation=self.activation, concat=self.concat,
                              normalize=self.normalize)


class MeanGraphSage(_PairKernelSage):
    """layers/conv/graph_sage.py:8-81."""
    _op = staticmethod(mean_graph_sage)


class SumGraphSage(_PairKernelSage):
    """layers/conv/graph_sage.py:83-156."""
    _op = staticmethod(sum_graph_sage)


class GCNGraphSage(nn.Module):
    """layers/conv/graph_sage.py:159-203."""
    units: int
    activation: Optional[Callable] = jax.nn.relu
    use_bias: bool = True
    normalize: bool = False

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        kernel = self.param("kernel", glorot_uniform(), (x.shape[-1], self.units))
        bias = self.param("bias", zeros_init(), (self.units,)) if self.use_bias else None
        return gcn_graph_sage(x, edge_index, edge_weight, kernel, bias,
                              self.activation, self.normalize, cache=cache)


class _PoolSage(nn.Module):
    """Shared scaffolding for mean-/max-pool variants (edge MLP ×4 widening)."""
    units: int
    activation: Optional[Callable] = jax.nn.relu
    use_bias: bool = True
    concat: bool = True
    normalize: bool = False

    _op = None

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        if self.concat and self.units % 2 != 0:
            raise ValueError("units must be an even number if concat is True")
        kernel_units = self.units // 2 if self.concat else self.units
        f = x.shape[-1]
        self_kernel = self.param("self_kernel", glorot_uniform(), (f, kernel_units))
        neighbor_mlp_kernel = self.param("neighbor_mlp_kernel", glorot_uniform(),
                                         (f, kernel_units * 4))
        neighbor_mlp_bias = (self.param("neighbor_mlp_bias", zeros_init(),
                                        (kernel_units * 4,))
                             if self.use_bias else None)
        neighbor_kernel = self.param("neighbor_kernel", glorot_uniform(),
                                     (kernel_units * 4, kernel_units))
        bias = self.param("bias", zeros_init(), (self.units,)) if self.use_bias else None
        return type(self)._op(x, edge_index, edge_weight, self_kernel,
                              neighbor_mlp_kernel, neighbor_kernel,
                              neighbor_mlp_bias=neighbor_mlp_bias, bias=bias,
                              activation=self.activation, concat=self.concat,
                              normalize=self.normalize)


class MeanPoolGraphSage(_PoolSage):
    """layers/conv/graph_sage.py:206-281."""
    _op = staticmethod(mean_pool_graph_sage)


class MaxPoolGraphSage(_PoolSage):
    """layers/conv/graph_sage.py:284-354."""
    _op = staticmethod(max_pool_graph_sage)


class LSTMGraphSage(nn.Module):
    """layers/conv/graph_sage.py:357-421: LSTM over packed neighbor sequences."""
    units: int
    activation: Optional[Callable] = jax.nn.relu
    use_bias: bool = True
    concat: bool = True
    normalize: bool = False
    max_neighbors: Optional[int] = None  # static K under jit

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, _ = unpack_edge_inputs(inputs)
        if self.concat and self.units % 2 != 0:
            raise ValueError("units must be an even number if concat is True")
        kernel_units = self.units // 2 if self.concat else self.units
        f = x.shape[-1]
        self_kernel = self.param("self_kernel", glorot_uniform(), (f, kernel_units))
        neighbor_kernel = self.param("neighbor_kernel", glorot_uniform(),
                                     (kernel_units, kernel_units))
        bias = self.param("bias", zeros_init(), (self.units,)) if self.use_bias else None

        rnn = nn.RNN(nn.OptimizedLSTMCell(kernel_units), return_carry=False)

        def lstm_fn(neighbor_x, training=False):
            return rnn(neighbor_x)  # [N, K, kernel_units], full sequence

        return lstm_graph_sage(x, edge_index, lstm_fn, self_kernel,
                               neighbor_kernel, bias=bias,
                               activation=self.activation, concat=self.concat,
                               normalize=self.normalize, training=training,
                               max_neighbors=self.max_neighbors)
