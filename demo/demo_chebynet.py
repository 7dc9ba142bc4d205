"""ChebyNet node classification (reference: demo/demo_chebynet.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from demo_utils import load_cora, train_node_classifier
from tf_geometric_tpu.layers import ChebyNet


def main():
    graph, splits = load_cora()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    layer = ChebyNet(units=num_classes, k=3)
    layer.build_cache_for_graph(graph)
    cache = graph.cache
    edge_index = jnp.asarray(graph.edge_index)
    edge_weight = jnp.asarray(graph.edge_weight)

    key = jax.random.PRNGKey(0)
    params = layer.init(key, [graph.x, edge_index, edge_weight],
                        cache=cache)["params"]

    def forward(p, training, dropout_key):
        return layer.apply({"params": p}, [graph.x, edge_index, edge_weight],
                           cache=cache, training=training)

    return train_node_classifier(forward, params, jnp.asarray(graph.y), splits)


if __name__ == "__main__":
    main()
