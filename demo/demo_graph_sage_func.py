"""GraphSAGE functional API with sampling OUTSIDE the compiled step
(reference: demo/demo_graph_sage_func.py, which uses tf.function with
explicit TensorSpec signatures to avoid retracing on changing edge counts).

The TPU-native equivalent: the sampler's ``padding=True`` mode yields
**fixed-k** edge lists — a static shape per layer config — so the jitted
functional forward compiles exactly once even though a fresh sample is drawn
per step on the host. This is the production pattern SURVEY §3.3 calls out.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from demo_graph_sage import load_graphs
from demo_utils import demo_steps
from tf_geometric_tpu.nn import mean_graph_sage
from tf_geometric_tpu.utils.graph_utils import RandomNeighborSampler

NUM_SAMPLED_NEIGHBORS = [10, 5]
UNITS = 128


def main(num_epochs=8):
    from sklearn.metrics import f1_score
    train_graphs, valid_graphs, test_graphs = load_graphs()
    for g in train_graphs + valid_graphs + test_graphs:
        g.cache["sampler"] = RandomNeighborSampler(g.edge_index, rng=0)
    num_classes = train_graphs[0].y.shape[1]
    f = train_graphs[0].x.shape[1]

    rng = np.random.default_rng(0)

    def dense(shape):
        return jnp.asarray(rng.normal(scale=np.sqrt(2.0 / shape[0]), size=shape),
                           jnp.float32)

    params = {
        "sage0_self": dense((f, UNITS // 2)),
        "sage0_neigh": dense((f, UNITS // 2)),
        "sage1_self": dense((UNITS, UNITS // 2)),
        "sage1_neigh": dense((UNITS, UNITS // 2)),
        "fc_w": dense((UNITS, num_classes)),
        "fc_b": jnp.zeros(num_classes),
    }

    @jax.jit
    def forward(p, x, edge_lists):
        (ei0, ew0), (ei1, ew1) = edge_lists
        h = mean_graph_sage(x, ei0, ew0, p["sage0_self"], p["sage0_neigh"],
                            activation=jax.nn.relu)
        h = mean_graph_sage(h, ei1, ew1, p["sage1_self"], p["sage1_neigh"],
                            activation=jax.nn.relu)
        return h @ p["fc_w"] + p["fc_b"]

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(p, s, x, edge_lists, y):
        def loss_fn(pp):
            logits = forward(pp, x, edge_lists)
            return optax.sigmoid_binary_cross_entropy(
                logits, y.astype(jnp.float32)).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def sample(graph):
        sampler = graph.cache["sampler"]
        return tuple(
            tuple(jnp.asarray(a) for a in sampler.sample(k=k, padding=True))
            for k in NUM_SAMPLED_NEIGHBORS)

    num_epochs = demo_steps(num_epochs)
    for epoch in range(num_epochs):
        losses = []
        for g in train_graphs:
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(g.x), sample(g), jnp.asarray(g.y))
            losses.append(float(loss))
        print(f"epoch {epoch}: loss={np.mean(losses):.4f}")

    f1s = []
    for g in test_graphs:
        preds = np.asarray(forward(params, jnp.asarray(g.x), sample(g))) > 0
        f1s.append(f1_score(np.asarray(g.y), preds, average="micro"))
    f1 = float(np.mean(f1s))
    print(f"test micro-F1: {f1:.4f}")
    return f1


if __name__ == "__main__":
    main()
