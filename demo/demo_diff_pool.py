"""DiffPool hierarchical graph classification (reference: demo/demo_diff_pool.py):
two DiffPool levels, max-pool readout per level, concat → MLP."""
import jax
import jax.numpy as jnp
import flax.linen as nn

from demo_utils import run_graph_classification
from tf_geometric_tpu.layers import GCN, DiffPool
from tf_geometric_tpu.nn import max_pool


class DiffPoolModel(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        readouts = []
        h, ei, ew, ngi = x, edge_index, edge_weight, node_graph_index
        for level, clusters in enumerate([8, 4]):
            feature_layer = GCN(units=32, activation=jax.nn.relu,
                                name=f"feature_gnn_{level}")
            assign_layer = GCN(units=clusters, name=f"assign_gnn_{level}")

            def feature_fn(inputs, training=None, cache=None, _l=feature_layer):
                return _l(inputs, training=training)

            def assign_fn(inputs, training=None, cache=None, _l=assign_layer):
                return _l(inputs, training=training)

            h, ei, ew, ngi = DiffPool(
                feature_gnn=feature_fn, assign_gnn=assign_fn, units=32,
                num_clusters=clusters, num_graphs=self.num_graphs,
                name=f"diff_pool_{level}")([h, ei, ew, ngi], training=training)
            readouts.append(max_pool(h, ngi, num_graphs=self.num_graphs))
        h = jnp.concatenate(readouts, axis=-1)
        h = nn.Dense(64)(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(0.4, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_steps=300):
    return run_graph_classification(
        lambda c, g: DiffPoolModel(num_classes=c, num_graphs=g),
        num_steps=num_steps)


if __name__ == "__main__":
    main()
