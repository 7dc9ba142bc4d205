"""GAT layer (reference: layers/conv/gat.py, 101 LoC).

Weight shapes follow the reference: Q/K kernels are [F, attention_units];
V kernel is [F, units] when ``split_value_heads`` (heads split the value
features, outputs concat back to ``units``) and [F, units·num_heads] when not
(each head gets a full ``units``-wide value, outputs are head-averaged) —
layers/conv/gat.py:74-79.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax

from ...nn.conv.gat import gat
from ..base import glorot_uniform, unpack_edge_inputs, zeros_init

__all__ = ["GAT"]


class GAT(nn.Module):
    units: int
    attention_units: Optional[int] = None
    activation: Optional[Callable] = None
    query_activation: Callable = jax.nn.relu
    key_activation: Callable = jax.nn.relu
    num_heads: int = 1
    split_value_heads: bool = True
    edge_drop_rate: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, inputs, training: bool = False, cache: Optional[dict] = None):
        x, edge_index, _ = unpack_edge_inputs(inputs)  # edge_weight unused (gat.py:88)
        num_features = x.shape[-1]
        att_units = self.attention_units if self.attention_units is not None else self.units

        query_kernel = self.param("query_kernel", glorot_uniform(),
                                  (num_features, att_units))
        query_bias = self.param("query_bias", zeros_init(), (att_units,))
        key_kernel = self.param("key_kernel", glorot_uniform(),
                                (num_features, att_units))
        key_bias = self.param("key_bias", zeros_init(), (att_units,))
        value_units = (self.units if self.split_value_heads
                       else self.units * self.num_heads)
        kernel = self.param("kernel", glorot_uniform(), (num_features, value_units))
        bias = self.param("bias", zeros_init(), (self.units,)) if self.use_bias else None

        dropout_key = None
        if training and self.edge_drop_rate > 0:
            dropout_key = self.make_rng("dropout")
        return gat(x, edge_index,
                   query_kernel, query_bias, self.query_activation,
                   key_kernel, key_bias, self.key_activation,
                   kernel, bias, self.activation,
                   num_heads=self.num_heads,
                   split_value_heads=self.split_value_heads,
                   edge_drop_rate=self.edge_drop_rate,
                   training=training, dropout_key=dropout_key, cache=cache)
