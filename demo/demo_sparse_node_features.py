"""Sparse (one-hot) node features through a GCN (reference:
demo/demo_sparse_node_features.py): x as a SparseMatrix — e.g. feature-less
nodes with identity features — multiplied directly against the first kernel."""
import jax
import jax.numpy as jnp
import numpy as np

from demo_utils import load_cora, train_node_classifier
from tf_geometric_tpu import sparse as tfs
from tf_geometric_tpu.nn import gcn
from tf_geometric_tpu.sparse import SparseMatrix


def main(num_steps=150):
    graph, splits = load_cora()
    num_nodes = graph.num_nodes
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1

    # identity sparse features (tfs.eye, demo_sparse_node_features.py:22)
    sparse_x = tfs.eye(num_nodes)
    adj = graph.adj()
    from tf_geometric_tpu.nn import gcn_build_cache_by_adj
    cache = gcn_build_cache_by_adj(adj)  # normalization + ELL as jit constants

    rng = np.random.default_rng(0)
    params = {
        "w0": jnp.asarray(rng.normal(scale=0.05, size=(num_nodes, 32)),
                          jnp.float32),
        "b0": jnp.zeros(32),
        "w1": jnp.asarray(rng.normal(scale=0.05, size=(32, num_classes)),
                          jnp.float32),
        "b1": jnp.zeros(num_classes),
    }

    def forward(p, training, dropout_key):
        h = gcn(sparse_x, adj, p["w0"], p["b0"], activation=jax.nn.relu,
                cache=cache)
        return gcn(h, adj, p["w1"], p["b1"], cache=cache)

    return train_node_classifier(forward, params, jnp.asarray(graph.y), splits,
                                 num_steps=num_steps)


if __name__ == "__main__":
    main()
