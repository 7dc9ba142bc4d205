"""Batched graph classification: GCN encoder + mean-pool readout
(reference: demo/demo_mean_pool.py). Batches are padded to fixed capacities
so the jitted train step compiles once (the TPU static-shape discipline)."""
import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import optax

from demo_utils import (demo_steps, load_graph_classification_data,
                        padded_batch_generator)
from tf_geometric_tpu.layers import GCN
from tf_geometric_tpu.nn import mean_pool

BATCH_SIZE = 32
DROP_RATE = 0.4


class MeanPoolNetwork(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        h = GCN(units=64, activation=jax.nn.relu)([x, edge_index, edge_weight])
        h = nn.Dropout(DROP_RATE, deterministic=not training)(h)
        h = GCN(units=32, activation=jax.nn.relu)([h, edge_index, edge_weight])
        h = mean_pool(h, node_graph_index, num_graphs=self.num_graphs)
        h = nn.Dropout(DROP_RATE, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_steps=300):
    from sklearn.model_selection import train_test_split
    graphs, num_classes = load_graph_classification_data("NCI1")
    train_graphs, test_graphs = train_test_split(graphs, test_size=0.1,
                                                 random_state=0)
    model = MeanPoolNetwork(num_classes=num_classes, num_graphs=BATCH_SIZE)

    gen = padded_batch_generator(train_graphs, BATCH_SIZE)
    batch, _ = next(gen)
    key = jax.random.PRNGKey(0)

    def to_args(batch):
        return (jnp.asarray(batch.x), jnp.asarray(batch.edge_index),
                jnp.asarray(batch.edge_weight), jnp.asarray(batch.node_graph_index))

    params = model.init({"params": key, "dropout": key}, *to_args(batch))["params"]
    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, args, y, valid_mask, step_key):
        def loss_fn(p):
            logits = model.apply({"params": p}, *args, training=True,
                                 rngs={"dropout": step_key})
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(y, 0, None))
            return jnp.sum(ce * valid_mask) / jnp.maximum(valid_mask.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, args):
        return jnp.argmax(model.apply({"params": params}, *args), axis=-1)

    def batch_labels(batch, real_graphs):
        y = np.zeros(BATCH_SIZE, np.int32)
        y[:real_graphs] = np.asarray(batch.y).flatten()[:real_graphs]
        mask = np.zeros(BATCH_SIZE, np.float32)
        mask[:real_graphs] = 1.0
        return jnp.asarray(y), jnp.asarray(mask)

    num_steps = demo_steps(num_steps)
    for step in range(num_steps):
        batch, real = next(gen)
        y, mask = batch_labels(batch, real)
        key, subkey = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, to_args(batch),
                                             y, mask, subkey)
        if step % 50 == 0:
            print(f"step {step}: loss={float(loss):.4f}")

    correct = total = 0
    for batch, real in padded_batch_generator(test_graphs, BATCH_SIZE,
                                              shuffle=False, infinite=False):
        preds = np.asarray(predict(params, to_args(batch)))[:real]
        labels = np.asarray(batch.y).flatten()[:real]
        correct += (preds == labels).sum()
        total += real
    acc = correct / max(total, 1)
    print(f"test accuracy: {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
