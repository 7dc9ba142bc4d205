"""SSGC (S²GC) node classification (reference: demo/demo_ssgc.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from demo_utils import load_cora, train_node_classifier
from tf_geometric_tpu.layers import SSGC
from tf_geometric_tpu.nn.conv.gcn import gcn_build_cache_for_graph


def main():
    graph, splits = load_cora()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    gcn_build_cache_for_graph(graph)
    cache = graph.cache
    edge_index = jnp.asarray(graph.edge_index)
    edge_weight = jnp.asarray(graph.edge_weight)

    model = SSGC(units_list=[num_classes], k=10, alpha=0.1)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        [graph.x, edge_index, edge_weight], cache=cache)["params"]

    def forward(p, training, dropout_key):
        rngs = {"dropout": dropout_key} if training else {}
        return model.apply({"params": p}, [graph.x, edge_index, edge_weight],
                           cache=cache, training=training, rngs=rngs)

    return train_node_classifier(forward, params, jnp.asarray(graph.y), splits)


if __name__ == "__main__":
    main()
