"""Introductory tutorial (counterpart of the reference's tutorial_intro.py):
build a graph, run functional ops and OOP layers, train a tiny GCN."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import tf_geometric_tpu as tfg


def main():
    # ---- 1. build a graph ---------------------------------------------------
    graph = tfg.Graph(
        x=np.random.randn(5, 20).astype(np.float32),   # 5 nodes, 20 features
        edge_index=[[0, 0, 1, 3], [1, 2, 2, 1]],       # 4 undirected pairs
    ).to_directed()
    print(graph)

    # ---- 2. functional API --------------------------------------------------
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
    h = tfg.nn.gcn(jnp.asarray(graph.x), graph.adj(), kernel,
                   activation=jax.nn.relu, cache=graph.cache)
    print("gcn output:", h.shape)

    h = tfg.nn.mean_pool(h, jnp.zeros(5, jnp.int32), num_graphs=1)
    print("graph readout:", h.shape)

    # ---- 3. OOP API (flax layers) ------------------------------------------
    gat_layer = tfg.layers.GAT(units=4, num_heads=2)
    variables = gat_layer.init(
        jax.random.PRNGKey(0),
        [jnp.asarray(graph.x), jnp.asarray(graph.edge_index)])
    h = gat_layer.apply(variables,
                        [jnp.asarray(graph.x), jnp.asarray(graph.edge_index)])
    print("gat output:", h.shape)

    # ---- 4. train a 2-layer GCN on synthetic Cora ---------------------------
    from tf_geometric_tpu.datasets import FakePlanetoidDataset
    cora, (train_idx, valid_idx, test_idx) = FakePlanetoidDataset("cora").load_data()
    cora.convert_data_to_tensor()
    tfg.nn.gcn_build_cache_for_graph(cora)  # normalization + ELL packing, once
    num_classes = int(np.max(np.asarray(jax.device_get(cora.y)))) + 1

    params = {
        "w0": jnp.asarray(rng.normal(scale=0.05, size=(cora.num_features, 16)),
                          jnp.float32),
        "w1": jnp.asarray(rng.normal(scale=0.05, size=(16, num_classes)),
                          jnp.float32),
    }
    adj = cora.adj()
    cache = cora.cache
    y = jnp.asarray(cora.y)
    tr = jnp.asarray(np.asarray(train_idx, np.int32))
    te = jnp.asarray(np.asarray(test_idx, np.int32))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(p, s):
        def loss_fn(pp):
            h = tfg.nn.gcn(cora.x, adj, pp["w0"], activation=jax.nn.relu,
                           cache=cache)
            logits = tfg.nn.gcn(h, adj, pp["w1"], cache=cache)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[tr], y[tr]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for i in range(100):
        params, opt_state, loss = train_step(params, opt_state)
    h = tfg.nn.gcn(cora.x, adj, params["w0"], activation=jax.nn.relu, cache=cache)
    logits = tfg.nn.gcn(h, adj, params["w1"], cache=cache)
    acc = float(jnp.mean((jnp.argmax(logits, -1)[te] == y[te]).astype(jnp.float32)))
    print(f"tutorial GCN test accuracy: {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
