"""Whole-graph readouts (reference: nn/pool/common_pool.py:7-52).

``num_graphs`` must be static under jit (pass it explicitly for padded
batches; padded nodes carry out-of-range ``node_graph_index`` and vanish).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernel.segment import segment_count, segment_max, segment_min, segment_sum

__all__ = ["mean_pool", "sum_pool", "max_pool", "min_pool"]


def _resolve_num_graphs(node_graph_index, num_graphs):
    """Static num_graphs (python int) from an explicit value or a device_get
    of max(node_graph_index) — the shared resolver for every pooling op."""
    if num_graphs is None:
        return int(jax.device_get(jnp.max(jnp.asarray(node_graph_index)))) + 1
    return int(num_graphs)


def mean_pool(x, node_graph_index, num_graphs=None):
    """sum / (count + 1e-8), as in common_pool.py:7-13."""
    num_graphs = _resolve_num_graphs(node_graph_index, num_graphs)
    counts = segment_count(node_graph_index, num_graphs)
    total = segment_sum(x, node_graph_index, num_graphs)
    return total / (jnp.expand_dims(counts, -1) + 1e-8)


def sum_pool(x, node_graph_index, num_graphs=None):
    """Whole-graph sum readout (reference nn/pool/common_pool.py:30-33)."""
    num_graphs = _resolve_num_graphs(node_graph_index, num_graphs)
    return segment_sum(x, node_graph_index, num_graphs)


def max_pool(x, node_graph_index, num_graphs=None):
    """Whole-graph max readout (reference nn/pool/common_pool.py:36-45)."""
    num_graphs = _resolve_num_graphs(node_graph_index, num_graphs)
    return segment_max(x, node_graph_index, num_graphs)


def min_pool(x, node_graph_index, num_graphs=None):
    """Whole-graph min readout (reference nn/pool/common_pool.py:48-52)."""
    num_graphs = _resolve_num_graphs(node_graph_index, num_graphs)
    return segment_min(x, node_graph_index, num_graphs)
