"""GIN graph classification (reference: demo/demo_gin.py): stacked GIN
layers with per-layer MLPs + sum-pool readout."""
import jax
import flax.linen as nn

from demo_utils import run_graph_classification
from tf_geometric_tpu.layers import GIN
from tf_geometric_tpu.nn import sum_pool


class MLP(nn.Module):
    units: int

    @nn.compact
    def __call__(self, h, training=False):
        h = nn.Dense(self.units)(h)
        h = jax.nn.relu(h)
        return nn.Dense(self.units)(h)


class GINModel(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        h = x
        for _ in range(3):
            h = GIN(mlp_model=MLP(32), train_eps=True)([h, edge_index],
                                                       training=training)
            h = jax.nn.relu(h)
        h = sum_pool(h, node_graph_index, num_graphs=self.num_graphs)
        h = nn.Dropout(0.4, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_steps=300):
    return run_graph_classification(
        lambda c, g: GINModel(num_classes=c, num_graphs=g), num_steps=num_steps)


if __name__ == "__main__":
    main()
