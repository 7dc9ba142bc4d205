"""Set2Set readout graph classification (reference: demo/demo_set2set.py)."""
import jax
import flax.linen as nn

from demo_utils import run_graph_classification
from tf_geometric_tpu.layers import GCN, Set2Set


class Set2SetModel(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        h = GCN(units=32, activation=jax.nn.relu)([x, edge_index, edge_weight])
        h = GCN(units=32, activation=jax.nn.relu)([h, edge_index, edge_weight])
        h = Set2Set(num_iterations=3, num_graphs=self.num_graphs)(
            [h, node_graph_index], training=training)
        h = nn.Dropout(0.4, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_steps=300):
    return run_graph_classification(
        lambda c, g: Set2SetModel(num_classes=c, num_graphs=g),
        num_steps=num_steps)


if __name__ == "__main__":
    main()
