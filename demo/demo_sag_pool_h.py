"""Hierarchical SAGPool graph classification (reference: demo/demo_sag_pool_h.py):
GCN → SAGPool → GCN → SAGPool, summed readouts at each level."""
import jax
import jax.numpy as jnp
import flax.linen as nn

from demo_utils import run_graph_classification
from tf_geometric_tpu.layers import GCN, SAGPool
from tf_geometric_tpu.nn import mean_pool


class SAGPoolHModel(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        readouts = []
        h, ei, ew, ngi = x, edge_index, edge_weight, node_graph_index
        for level in range(2):
            h = GCN(units=32, activation=jax.nn.relu)([h, ei, ew])
            score_layer = GCN(units=1, name=f"score_gnn_{level}")
            # calling the flax submodule inside this compact context registers
            # its params; SAGPool itself owns no weights
            def score_fn(inputs, training=None, cache=None, _l=score_layer):
                return _l(inputs, training=training)
            h, ei, ew, ngi = SAGPool(score_gnn=score_fn, k=8,
                                     score_activation=jax.nn.tanh,
                                     num_graphs=self.num_graphs)([h, ei, ew, ngi])
            readouts.append(mean_pool(h, ngi, num_graphs=self.num_graphs))
        h = jnp.concatenate(readouts, axis=-1)
        h = nn.Dropout(0.4, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_steps=300):
    return run_graph_classification(
        lambda c, g: SAGPoolHModel(num_classes=c, num_graphs=g),
        num_steps=num_steps)


if __name__ == "__main__":
    main()
