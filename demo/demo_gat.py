"""Multi-head GAT node classification (reference: demo/demo_gat.py:
64 units, 8 heads, dropout 0.6 on inputs and attention edges)."""
import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from demo_utils import load_cora, train_node_classifier
from tf_geometric_tpu.layers import GAT

DROP_RATE = 0.6


class GATModel(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, edge_index, training=False):
        x = nn.Dropout(DROP_RATE, deterministic=not training)(x)
        h = GAT(units=64, attention_units=64, activation=jax.nn.relu,
                num_heads=8, edge_drop_rate=DROP_RATE)(
            [x, edge_index], training=training)
        h = nn.Dropout(DROP_RATE, deterministic=not training)(h)
        return GAT(units=self.num_classes, attention_units=self.num_classes,
                   num_heads=1)([h, edge_index], training=training)


def main():
    graph, splits = load_cora()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    model = GATModel(num_classes=num_classes)
    edge_index = jnp.asarray(graph.edge_index)

    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        graph.x, edge_index)["params"]

    def forward(p, training, dropout_key):
        rngs = {"dropout": dropout_key} if training else {}
        return model.apply({"params": p}, graph.x, edge_index,
                           training=training, rngs=rngs)

    return train_node_classifier(forward, params, jnp.asarray(graph.y), splits,
                                 learning_rate=5e-3, num_steps=200)


if __name__ == "__main__":
    main()
