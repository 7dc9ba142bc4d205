"""Mini-batch GraphSAGE with neighbor sampling (reference: demo/demo_graph_sage.py).

Per layer, a host-side RandomNeighborSampler draws fixed-k neighbor sets
(``padding=True`` yields exactly k per node — the TPU-friendly mode: the
edge count is static, so the jitted forward compiles once per layer config);
multi-label PPI-style objective with micro-F1 evaluation.
"""
import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import optax

from demo_utils import demo_steps, load_cora
from tf_geometric_tpu.datasets.ppi import PPIDataset
from tf_geometric_tpu.layers import MeanGraphSage
from tf_geometric_tpu.utils.graph_utils import RandomNeighborSampler

NUM_SAMPLED_NEIGHBORS = [10, 5]


def load_graphs():
    try:
        train_graphs, valid_graphs, test_graphs = PPIDataset().load_data()
        multi_label = True
    except Exception:
        print("PPI unavailable — using synthetic multi-label graphs")
        from tf_geometric_tpu.datasets.synthetic_citation import synthetic_citation_graph
        from tf_geometric_tpu.data.graph import Graph
        rng = np.random.default_rng(0)
        def make(seed):
            g = synthetic_citation_graph(num_nodes=300, num_features=50,
                                         num_classes=4, seed=seed)
            y = np.zeros((300, 8), np.int32)
            y[np.arange(300), g.y] = 1
            y[np.arange(300), 4 + (np.asarray(g.y) + 1) % 4] = 1
            return Graph(x=g.x, edge_index=g.edge_index, y=y)
        train_graphs = [make(s) for s in range(3)]
        valid_graphs = [make(10)]
        test_graphs = [make(20)]
        multi_label = True
    return train_graphs, valid_graphs, test_graphs


class SageNet(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, edge_lists, training=False):
        h = x
        for i, (ei, ew) in enumerate(edge_lists):
            h = MeanGraphSage(units=128, activation=jax.nn.relu)(
                [h, ei, ew], training=training)
        h = nn.Dropout(0.3, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_epochs=8):
    from sklearn.metrics import f1_score
    train_graphs, valid_graphs, test_graphs = load_graphs()
    for g in train_graphs + valid_graphs + test_graphs:
        g.cache["sampler"] = RandomNeighborSampler(g.edge_index, rng=0)
    num_classes = train_graphs[0].y.shape[1]

    model = SageNet(num_classes=num_classes)

    def sample_edges(graph):
        sampler = graph.cache["sampler"]
        return tuple(
            tuple(jnp.asarray(a) for a in sampler.sample(k=k, padding=True))
            for k in NUM_SAMPLED_NEIGHBORS)

    g0 = train_graphs[0]
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, jnp.asarray(g0.x),
                        sample_edges(g0))["params"]
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, x, edge_lists, y, step_key):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, edge_lists, training=True,
                                 rngs={"dropout": step_key})
            return optax.sigmoid_binary_cross_entropy(
                logits, y.astype(jnp.float32)).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, x, edge_lists):
        return model.apply({"params": params}, x, edge_lists) > 0

    num_epochs = demo_steps(num_epochs)
    for epoch in range(num_epochs):
        losses = []
        for g in train_graphs:
            key, subkey = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(g.x), sample_edges(g),
                jnp.asarray(g.y), subkey)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss={np.mean(losses):.4f}")

    f1s = []
    for g in test_graphs:
        preds = np.asarray(predict(params, jnp.asarray(g.x), sample_edges(g)))
        f1s.append(f1_score(np.asarray(g.y), preds, average="micro"))
    f1 = float(np.mean(f1s))
    print(f"test micro-F1: {f1:.4f}")
    return f1


if __name__ == "__main__":
    main()
