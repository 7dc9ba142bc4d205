"""The 'elegant API' tour (reference: demo/demo_elegant_api.py): functional
ops and OOP layers over the same Graph, caches, and jit compilation."""
import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import tf_geometric_tpu as tfg
from tf_geometric_tpu.utils import jax_utils


def main():
    graph = tfg.Graph(
        x=np.random.randn(5, 20).astype(np.float32),
        edge_index=[[0, 0, 1, 3], [1, 2, 2, 1]],
    ).to_directed()
    print(graph)

    # functional API
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
    h = tfg.nn.gcn(jnp.asarray(graph.x), graph.adj(), kernel,
                   activation=jax.nn.relu, cache=graph.cache)
    print("functional gcn:", h.shape)

    # OOP API
    layer = tfg.layers.GAT(units=4, num_heads=2)
    variables = layer.init(jax.random.PRNGKey(0),
                           [jnp.asarray(graph.x), jnp.asarray(graph.edge_index)])
    h = layer.apply(variables, [jnp.asarray(graph.x), jnp.asarray(graph.edge_index)])
    print("oop gat:", h.shape)

    # jit compilation via the function decorator
    @jax_utils.function
    def fast_forward(x):
        return tfg.nn.gcn(x, graph.adj(), kernel, cache=graph.cache)

    print("jitted:", fast_forward(jnp.asarray(graph.x)).shape)
    return True


if __name__ == "__main__":
    main()
