"""SortPool graph classification (reference: demo/demo_sort_pool.py):
GCN stack → per-graph top-k by last feature → dense readout."""
import jax
import jax.numpy as jnp
import flax.linen as nn

from demo_utils import run_graph_classification
from tf_geometric_tpu.layers import GCN, SortPool

K = 8


class SortPoolModel(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        h = GCN(units=32, activation=jax.nn.tanh)([x, edge_index, edge_weight])
        h = GCN(units=32, activation=jax.nn.tanh)([h, edge_index, edge_weight])
        px, _, _, _ = SortPool(k=K, num_graphs=self.num_graphs)(
            [h, edge_index, edge_weight, node_graph_index])
        # [G*K, F] → [G, K*F] fixed-size readout
        h = px.reshape(self.num_graphs, -1)
        h = nn.Dense(64)(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(0.4, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_steps=300):
    return run_graph_classification(
        lambda c, g: SortPoolModel(num_classes=c, num_graphs=g),
        num_steps=num_steps)


if __name__ == "__main__":
    main()
