"""Propagation-family layers: SGC, TAGCN, APPNP, SSGC, ChebyNet, GIN, LEConv
(reference: layers/conv/{sgc,tagcn,appnp,ssgc,chebynet,gin,le_conv}.py)."""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import flax.linen as nn
import jax

from ...nn.conv.appnp import appnp
from ...nn.conv.chebynet import chebynet, chebynet_norm_edge
from ...nn.conv.gin import gin
from ...nn.conv.le_conv import le_conv
from ...nn.conv.sgc import sgc
from ...nn.conv.ssgc import ssgc
from ...nn.conv.tagcn import tagcn
from ..base import glorot_uniform, unpack_edge_inputs, zeros_init

__all__ = ["SGC", "TAGCN", "APPNP", "SSGC", "ChebyNet", "GIN", "LEConv"]


class SGC(nn.Module):
    """layers/conv/sgc.py (106 LoC)."""
    units: int
    k: int = 1
    use_bias: bool = True
    activation: Optional[Callable] = None
    renorm: bool = True
    improved: bool = False

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        kernel = self.param("kernel", glorot_uniform(), (x.shape[-1], self.units))
        bias = self.param("bias", zeros_init(), (self.units,)) if self.use_bias else None
        return sgc(x, edge_index, edge_weight, self.k, kernel, bias,
                   self.activation, renorm=self.renorm, improved=self.improved,
                   cache=cache)


class TAGCN(nn.Module):
    """layers/conv/tagcn.py (114 LoC)."""
    units: int
    k: int = 3
    use_bias: bool = True
    activation: Optional[Callable] = None
    renorm: bool = False
    improved: bool = False

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        kernel = self.param("kernel", glorot_uniform(),
                            (x.shape[-1] * (self.k + 1), self.units))
        bias = self.param("bias", zeros_init(), (self.units,)) if self.use_bias else None
        return tagcn(x, edge_index, edge_weight, self.k, kernel, bias,
                     self.activation, renorm=self.renorm, improved=self.improved,
                     cache=cache)


class APPNP(nn.Module):
    """layers/conv/appnp.py (130 LoC): MLP over ``units_list`` then k-step PPR."""
    units_list: Sequence[int]
    k: int = 10
    alpha: float = 0.1
    dense_activation: Callable = jax.nn.relu
    activation: Optional[Callable] = None
    use_bias: bool = True
    dense_drop_rate: float = 0.0
    last_dense_drop_rate: float = 0.0
    edge_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        dims = [x.shape[-1]] + list(self.units_list)
        kernels = [self.param(f"kernel_{i}", glorot_uniform(), (dims[i], dims[i + 1]))
                   for i in range(len(self.units_list))]
        biases = [self.param(f"bias_{i}", zeros_init(), (dims[i + 1],))
                  if self.use_bias else None
                  for i in range(len(self.units_list))]
        needs_rng = (self.dense_drop_rate > 0 or self.last_dense_drop_rate > 0
                     or self.edge_drop_rate > 0)
        dropout_key = self.make_rng("dropout") if (training and needs_rng) else None
        return appnp(x, edge_index, edge_weight, kernels, biases,
                     dense_activation=self.dense_activation,
                     activation=self.activation, k=self.k, alpha=self.alpha,
                     dense_drop_rate=self.dense_drop_rate,
                     last_dense_drop_rate=self.last_dense_drop_rate,
                     edge_drop_rate=self.edge_drop_rate, cache=cache,
                     training=training, dropout_key=dropout_key)


class SSGC(nn.Module):
    """layers/conv/ssgc.py (140 LoC)."""
    units_list: Sequence[int]
    k: int = 10
    alpha: float = 0.1
    dense_activation: Callable = jax.nn.relu
    activation: Optional[Callable] = None
    use_bias: bool = True
    dense_drop_rate: float = 0.0
    last_dense_drop_rate: float = 0.0
    edge_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        dims = [x.shape[-1]] + list(self.units_list)
        kernels = [self.param(f"kernel_{i}", glorot_uniform(), (dims[i], dims[i + 1]))
                   for i in range(len(self.units_list))]
        biases = [self.param(f"bias_{i}", zeros_init(), (dims[i + 1],))
                  if self.use_bias else None
                  for i in range(len(self.units_list))]
        needs_rng = (self.dense_drop_rate > 0 or self.last_dense_drop_rate > 0
                     or self.edge_drop_rate > 0)
        dropout_key = self.make_rng("dropout") if (training and needs_rng) else None
        return ssgc(x, edge_index, edge_weight, kernels, biases,
                    k=self.k, alpha=self.alpha,
                    dense_activation=self.dense_activation,
                    activation=self.activation,
                    dense_drop_rate=self.dense_drop_rate,
                    last_dense_drop_rate=self.last_dense_drop_rate,
                    edge_drop_rate=self.edge_drop_rate, cache=cache,
                    training=training, dropout_key=dropout_key)


class ChebyNet(nn.Module):
    """layers/conv/chebynet.py (114 LoC): per-order kernels."""
    units: int
    k: int = 3
    use_bias: bool = True
    activation: Optional[Callable] = None
    normalization_type: str = "sym"
    use_dynamic_lambda_max: bool = False

    def build_cache_for_graph(self, graph, override=False):
        from ...nn.conv.chebynet import chebynet_cache_normed_edge
        chebynet_cache_normed_edge(graph, self.normalization_type,
                                   self.use_dynamic_lambda_max, override=override)
        return graph.cache

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        kernels = [self.param(f"kernel_{i}", glorot_uniform(),
                              (x.shape[-1], self.units)) for i in range(self.k)]
        bias = self.param("bias", zeros_init(), (self.units,)) if self.use_bias else None
        return chebynet(x, edge_index, edge_weight, self.k, kernels, bias,
                        self.activation, self.normalization_type,
                        self.use_dynamic_lambda_max, cache=cache)


class GIN(nn.Module):
    """layers/conv/gin.py (39 LoC): wraps a user MLP; optional trainable ε
    (layers/conv/gin.py:22-23)."""
    mlp_model: Callable = None
    eps: float = 0.0
    train_eps: bool = False

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, _ = unpack_edge_inputs(inputs)
        if self.train_eps:
            eps = self.param("eps", lambda key, shape: jax.numpy.full(shape, self.eps),
                             (1,))[0]
        else:
            eps = self.eps
        return gin(x, edge_index, self.mlp_model, eps=eps, training=training)


class LEConv(nn.Module):
    """layers/conv/le_conv.py (85 LoC): three kernels + biases."""
    units: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, inputs, cache=None, training: bool = False):
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        f = x.shape[-1]
        names = ["self", "aggr_self", "aggr_neighbor"]
        kernels = {n: self.param(f"{n}_kernel", glorot_uniform(), (f, self.units))
                   for n in names}
        biases = {n: (self.param(f"{n}_bias", zeros_init(), (self.units,))
                      if self.use_bias else None) for n in names}
        return le_conv(x, edge_index, edge_weight,
                       kernels["self"], biases["self"],
                       kernels["aggr_self"], biases["aggr_self"],
                       kernels["aggr_neighbor"], biases["aggr_neighbor"],
                       activation=self.activation)
