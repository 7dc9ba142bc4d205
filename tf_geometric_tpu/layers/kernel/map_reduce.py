"""MapReduceGNN: abstract layer with overridable map/reduce/update
(reference: layers/kernel/map_reduce.py:6-41)."""
from __future__ import annotations

import flax.linen as nn

from ...nn.kernel.map_reduce import aggregate_neighbors

__all__ = ["MapReduceGNN"]


class MapReduceGNN(nn.Module):
    """Subclass and override ``map`` / ``reduce`` / ``update``."""

    def map(self, repeated_x, neighbor_x, edge_weight=None):
        raise NotImplementedError

    def reduce(self, neighbor_msg, node_index, num_nodes=None):
        raise NotImplementedError

    def update(self, x, reduced_neighbor_msg):
        raise NotImplementedError

    def get_mapper(self):
        return lambda repeated_x, neighbor_x, edge_weight=None: self.map(
            repeated_x, neighbor_x, edge_weight)

    def get_reducer(self):
        return lambda neighbor_msg, node_index, num_nodes=None: self.reduce(
            neighbor_msg, node_index, num_nodes)

    def get_updater(self):
        return lambda x, reduced_neighbor_msg: self.update(x, reduced_neighbor_msg)

    def __call__(self, inputs, training: bool = False):
        from ..base import unpack_edge_inputs
        x, edge_index, edge_weight = unpack_edge_inputs(inputs)
        return aggregate_neighbors(
            x, edge_index, edge_weight,
            self.get_mapper(), self.get_reducer(), self.get_updater())
