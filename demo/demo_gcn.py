"""End-to-end 2-layer GCN node classification — the canonical path (SURVEY §3.1).

Mirrors the reference demo (demo/demo_gcn.py): dropout → GCN(16, relu) →
dropout → GCN(C), masked softmax cross-entropy + L2 on kernels, Adam(1e-2),
plus a forward-latency speed test. Uses the real Cora files when present
under the dataset root, otherwise a synthetic Cora-shaped graph.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from demo_utils import demo_steps

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from tf_geometric_tpu.layers.conv.gcn import GCN
from tf_geometric_tpu.layers.base import l2_loss
from tf_geometric_tpu.datasets.planetoid import CoraDataset
from tf_geometric_tpu.datasets.synthetic_citation import FakePlanetoidDataset

NUM_CLASSES = 7
DROP_RATE = 0.5
LEARNING_RATE = 1e-2
L2_COEF = 5e-4


def load_cora():
    try:
        return CoraDataset().load_data()
    except Exception:
        print("real Cora unavailable — using synthetic Cora-shaped graph")
        return FakePlanetoidDataset("cora").load_data()


class GCNModel(nn.Module):
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x, sparse_adj, cache=None, training=False):
        x = nn.Dropout(DROP_RATE, deterministic=not training)(x)
        h = GCN(units=16, activation=jax.nn.relu)([x, sparse_adj],
                                                  cache=cache, training=training)
        h = nn.Dropout(DROP_RATE, deterministic=not training)(h)
        return GCN(units=self.num_classes)([h, sparse_adj],
                                           cache=cache, training=training)


def main(num_steps=201):
    graph, (train_index, valid_index, test_index) = load_cora()
    graph.convert_data_to_tensor()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1

    model = GCNModel(num_classes=num_classes)
    # prebuild the normalization cache so jit captures it as constants
    GCN(units=16).build_cache_for_graph(graph)
    adj = graph.adj()
    cache = graph.cache

    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        graph.x, adj, cache=cache, training=False)["params"]
    optimizer = optax.adam(LEARNING_RATE)
    opt_state = optimizer.init(params)

    train_idx = jnp.asarray(np.asarray(train_index, np.int32))
    y = jnp.asarray(graph.y)

    def compute_loss(params, logits):
        masked_logits = logits[train_idx]
        labels = y[train_idx]
        ce = optax.softmax_cross_entropy_with_integer_labels(masked_logits, labels).mean()
        return ce + l2_loss(params, L2_COEF)

    @jax.jit
    def train_step(params, opt_state, dropout_key):
        def loss_fn(p):
            logits = model.apply({"params": p}, graph.x, adj, cache=cache,
                                 training=True, rngs={"dropout": dropout_key})
            return compute_loss(p, logits)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params):
        logits = model.apply({"params": params}, graph.x, adj, cache=cache)
        preds = jnp.argmax(logits, axis=-1)
        def acc(idx):
            return jnp.mean((preds[idx] == y[idx]).astype(jnp.float32))
        return (acc(train_idx),
                acc(jnp.asarray(np.asarray(valid_index, np.int32))),
                acc(jnp.asarray(np.asarray(test_index, np.int32))))

    num_steps = demo_steps(num_steps)
    for step in range(num_steps):
        key, subkey = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, subkey)
        if step % 20 == 0:
            train_acc, valid_acc, test_acc = evaluate(params)
            print(f"step {step}: loss={float(loss):.4f} "
                  f"train={float(train_acc):.4f} valid={float(valid_acc):.4f} "
                  f"test={float(test_acc):.4f}")

    # forward-latency speed test (demo_gcn.py:99-105)
    @jax.jit
    def forward(params):
        return model.apply({"params": params}, graph.x, adj, cache=cache)

    # block_until_ready is a NO-OP on the axon TPU tunnel — drain the queue
    # with a tiny device_get instead (CLAUDE.md timing protocol)
    _ = np.asarray(forward(params)[0, :1])
    start = time.time()
    iters = demo_steps(100)
    for _ in range(iters):
        out = forward(params)
    _ = np.asarray(out[0, :1])
    print(f"mean forward latency: {(time.time() - start) / iters * 1000:.3f} ms")
    return float(evaluate(params)[2])


if __name__ == "__main__":
    main()
