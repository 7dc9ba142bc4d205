"""GCN layer (reference: layers/conv/gcn.py, 156 LoC)."""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn

from ...nn.conv.gcn import (gcn, gcn_build_cache_by_adj, gcn_build_cache_for_graph)
from ..base import glorot_uniform, unpack_inputs, zeros_init

__all__ = ["GCN"]


class GCN(nn.Module):
    """Graph Convolutional Network layer (Kipf & Welling).

    Input contract matches the reference (layers/conv/gcn.py:129-156):
    ``layer([x, edge_index(, edge_weight)], cache=..., training=...)`` or
    ``layer([x, sparse_adj], ...)``. Weights: ``kernel`` (glorot) + optional
    ``bias`` (zeros), as in layers/conv/gcn.py build().
    """

    units: int
    activation: Optional[Callable] = None
    use_bias: bool = True
    norm: str = "both"
    add_self_loop: bool = True
    sym: bool = True
    renorm: bool = True
    improved: bool = False
    edge_drop_rate: float = 0.0
    num_or_size_splits: Optional[object] = None
    use_kernel: bool = True

    def build_cache_by_adj(self, sparse_adj, override=False, cache=None):
        """layers/conv/gcn.py:88-106."""
        return gcn_build_cache_by_adj(
            sparse_adj, norm=self.norm, add_self_loop=self.add_self_loop,
            sym=self.sym, renorm=self.renorm, improved=self.improved,
            override=override, cache=cache)

    def build_cache_for_graph(self, graph, override=False):
        """layers/conv/gcn.py:101-112."""
        return gcn_build_cache_for_graph(
            graph, norm=self.norm, add_self_loop=self.add_self_loop,
            sym=self.sym, renorm=self.renorm, improved=self.improved,
            override=override)

    @nn.compact
    def __call__(self, inputs, cache: Optional[dict] = None, training: bool = False):
        x, sparse_adj = unpack_inputs(inputs)
        kernel = None
        if self.use_kernel:
            kernel = self.param("kernel", glorot_uniform(),
                                (x.shape[-1], self.units))
        bias = (self.param("bias", zeros_init(), (self.units,))
                if self.use_bias else None)
        dropout_key = None
        if training and self.edge_drop_rate > 0:
            dropout_key = self.make_rng("dropout")
        return gcn(
            x, sparse_adj, kernel, bias=bias, activation=self.activation,
            norm=self.norm, add_self_loop=self.add_self_loop, sym=self.sym,
            renorm=self.renorm, improved=self.improved,
            edge_drop_rate=self.edge_drop_rate,
            num_or_size_splits=self.num_or_size_splits,
            training=training, cache=cache, dropout_key=dropout_key)
