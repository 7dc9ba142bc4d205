"""Set2Set readout: LSTM + content attention (reference: nn/pool/set2set.py:8-42).

Matches the reference's looping structure: per iteration, the LSTM consumes
the current query [G, 2F] and emits [G, F]; attention scores = <x, q[graph]>;
segment-softmax over each graph's nodes; attended sum concatenated back onto
the query. ``lstm`` is a callable ``(h [G, 2F], state) -> (out [G, F],
new_state)`` — the layer wraps a flax LSTMCell into this form.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..kernel.segment import segment_softmax, segment_sum

__all__ = ["set2set"]


def set2set(x, node_graph_index, lstm: Callable, num_iterations: int,
            training=None, num_graphs: Optional[int] = None):
    """Set2Set readout (reference nn/pool/set2set.py:8-42): LSTM + content
    attention for num_iterations; output [num_graphs, 2F]."""
    from .common_pool import _resolve_num_graphs
    node_graph_index = jnp.asarray(node_graph_index)
    num_graphs = _resolve_num_graphs(node_graph_index, num_graphs)
    units = x.shape[-1]

    h = jnp.zeros((num_graphs, units * 2), x.dtype)
    state = None
    safe_ngi = jnp.clip(node_graph_index, 0, num_graphs - 1)

    for _ in range(num_iterations):
        q, state = lstm(h, state)                       # [G, units]
        rep_q = jnp.take(q, safe_ngi, axis=0)
        att_score = jnp.sum(x * rep_q, axis=-1, keepdims=True)
        normed = segment_softmax(att_score, node_graph_index, num_graphs)
        att_h = segment_sum(x * normed, node_graph_index, num_graphs)
        h = jnp.concatenate([q, att_h], axis=-1)        # [G, 2·units]

    return h
