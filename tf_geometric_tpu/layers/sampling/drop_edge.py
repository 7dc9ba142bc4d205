"""DropEdge layer (reference: layers/sampling/drop_edge.py, 24 LoC)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ...nn.sampling.drop_edge import drop_edge

__all__ = ["DropEdge"]


class DropEdge(nn.Module):
    rate: float = 0.5
    force_undirected: bool = False
    num_nodes: Optional[int] = None  # out-of-range sentinel; static under jit

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        key = self.make_rng("dropout") if (training and self.rate > 0) else None
        return drop_edge(inputs, rate=self.rate,
                         force_undirected=self.force_undirected,
                         training=training, key=key, num_nodes=self.num_nodes)
