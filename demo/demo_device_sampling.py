"""Neighbor-sampled GraphSAGE with DEVICE-RESIDENT sampling — the TPU-native
upgrade of demo_graph_sage.py (reference: demo/demo_graph_sage.py +
utils/graph_utils.py:630-802, where sampling is host-side numpy and control
crosses host↔device every layer).

Here the CSR adjacency is uploaded once and each training step draws its
fixed-k neighbors INSIDE the jit (`DeviceNeighborSampler`), feeding the
scatter-free `mean_graph_sage_fixed_k` aggregator (slot-major [k, S] lanes,
matmul-first projection). One compiled function per epoch step; zero
per-step host work. At Reddit scale this is 6.1× faster end-to-end than
host-side COO sampling (benchmarks/sage_sampling_throughput.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from demo_utils import demo_steps, load_cora
from tf_geometric_tpu.nn import (DeviceNeighborSampler,
                                 mean_graph_sage_fixed_k)

NUM_SAMPLED_NEIGHBORS = (10, 5)
HIDDEN = 64
NUM_STEPS = 120


def main():
    graph, (train_idx, valid_idx, test_idx) = load_cora()
    num_classes = int(np.asarray(graph.y).max()) + 1
    x = jnp.asarray(graph.x)
    y = jnp.asarray(graph.y)

    sampler = DeviceNeighborSampler(graph.edge_index, graph.edge_weight,
                                    num_nodes=int(x.shape[0]))
    csr = sampler.csr_pytree()

    rng = np.random.default_rng(0)
    def dense(shape):
        return jnp.asarray(rng.normal(scale=0.1, size=shape), jnp.float32)
    params = {
        "s0": dense((x.shape[1], HIDDEN // 2)), "n0": dense((x.shape[1], HIDDEN // 2)),
        "b0": jnp.zeros(HIDDEN),
        "s1": dense((HIDDEN, HIDDEN // 2)), "n1": dense((HIDDEN, HIDDEN // 2)),
        "b1": jnp.zeros(HIDDEN),
        "wd": dense((HIDDEN, num_classes)), "bd": jnp.zeros(num_classes),
    }
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    train_mask = jnp.asarray(np.isin(np.arange(x.shape[0]), train_idx)
                             .astype(np.float32))

    def forward(p, key, xs):
        k0, k1 = jax.random.split(key)
        i0, w0 = sampler.sample(k0, NUM_SAMPLED_NEIGHBORS[0], csr=csr)
        i1, w1 = sampler.sample(k1, NUM_SAMPLED_NEIGHBORS[1], csr=csr)
        h = mean_graph_sage_fixed_k(xs, i0, w0, p["s0"], p["n0"], bias=p["b0"],
                                    activation=jax.nn.relu)
        h = mean_graph_sage_fixed_k(h, i1, w1, p["s1"], p["n1"], bias=p["b1"],
                                    activation=jax.nn.relu)
        return h @ p["wd"] + p["bd"]

    @jax.jit
    def train_step(p, s, key):
        def loss_fn(p):
            logits = forward(p, key, x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ce * train_mask) / jnp.sum(train_mask)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def evaluate(p, key):
        logits = forward(p, key, x)
        return jnp.argmax(logits, axis=-1)

    keys = jax.random.split(jax.random.PRNGKey(42), NUM_STEPS + 1)
    for i in range(demo_steps(NUM_STEPS)):
        params, opt_state, loss = train_step(params, opt_state, keys[i])
        if i % 20 == 0:
            pred = np.asarray(evaluate(params, keys[-1]))
            acc = (pred[valid_idx] == np.asarray(y)[valid_idx]).mean()
            print(f"step {i}: loss={float(loss):.4f} valid_acc={acc:.4f}")

    pred = np.asarray(evaluate(params, keys[-1]))
    test_acc = (pred[test_idx] == np.asarray(y)[test_idx]).mean()
    print(f"test accuracy: {test_acc:.4f}")
    return float(test_acc)


if __name__ == "__main__":
    main()
