"""TAGCN node classification (reference: demo/demo_tagcn.py)."""
import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from demo_utils import load_cora, train_node_classifier
from tf_geometric_tpu.layers import TAGCN


class TAGCNModel(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, cache=None, training=False):
        x = nn.Dropout(0.5, deterministic=not training)(x)
        h = TAGCN(units=16, k=3, activation=jax.nn.relu)(
            [x, edge_index, edge_weight], cache=cache, training=training)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        return TAGCN(units=self.num_classes, k=3)(
            [h, edge_index, edge_weight], cache=cache, training=training)


def main():
    graph, splits = load_cora()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    from tf_geometric_tpu.nn.conv.gcn import gcn_build_cache_for_graph
    gcn_build_cache_for_graph(graph, renorm=False)
    cache = graph.cache
    edge_index = jnp.asarray(graph.edge_index)
    edge_weight = jnp.asarray(graph.edge_weight)

    model = TAGCNModel(num_classes=num_classes)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, graph.x, edge_index,
                        edge_weight, cache=cache)["params"]

    def forward(p, training, dropout_key):
        rngs = {"dropout": dropout_key} if training else {}
        return model.apply({"params": p}, graph.x, edge_index, edge_weight,
                           cache=cache, training=training, rngs=rngs)

    return train_node_classifier(forward, params, jnp.asarray(graph.y), splits)


if __name__ == "__main__":
    main()
