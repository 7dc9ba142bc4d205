"""Graph Auto-Encoder link prediction (reference: demo/demo_gae.py):
GCN encoder → inner-product edge decoder, sigmoid CE on positive +
negative-sampled edges, AUC evaluation."""
import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import optax

from demo_utils import demo_steps, load_cora
from tf_geometric_tpu.layers import GCN
from tf_geometric_tpu.utils.graph_utils import (edge_train_test_split,
                                                negative_sampling)
from tf_geometric_tpu.data.graph import Graph


class GAEEncoder(nn.Module):
    @nn.compact
    def __call__(self, x, edge_index, edge_weight, training=False):
        h = GCN(units=32, activation=jax.nn.relu)([x, edge_index, edge_weight])
        h = nn.Dropout(0.3, deterministic=not training)(h)
        return GCN(units=16)([h, edge_index, edge_weight])


def predict_edge(embedded, edge_index):
    row, col = edge_index[0], edge_index[1]
    return jnp.sum(jnp.take(embedded, row, axis=0)
                   * jnp.take(embedded, col, axis=0), axis=-1)


def main(num_steps=150):
    graph, _ = load_cora()
    num_nodes = graph.num_nodes

    train_edge_index, test_edge_index, _, _ = edge_train_test_split(
        np.asarray(jax.device_get(graph.edge_index)), test_size=0.15,
        random_state=0)
    test_neg_edge_index = negative_sampling(
        test_edge_index.shape[1], num_nodes,
        edge_index=np.asarray(jax.device_get(graph.edge_index)),
        replace=False, rng=0)

    train_graph = Graph(x=np.asarray(jax.device_get(graph.x)),
                        edge_index=train_edge_index).to_directed()
    x = jnp.asarray(train_graph.x)
    ei = jnp.asarray(train_graph.edge_index)
    ew = jnp.asarray(train_graph.edge_weight)
    pos_train = jnp.asarray(train_edge_index.astype(np.int32))

    model = GAEEncoder()
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, x, ei, ew)["params"]
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, neg_edge_index, step_key):
        def loss_fn(p):
            embedded = model.apply({"params": p}, x, ei, ew, training=True,
                                   rngs={"dropout": step_key})
            pos_logits = predict_edge(embedded, pos_train)
            neg_logits = predict_edge(embedded, neg_edge_index)
            pos_losses = optax.sigmoid_binary_cross_entropy(
                pos_logits, jnp.ones_like(pos_logits))
            neg_losses = optax.sigmoid_binary_cross_entropy(
                neg_logits, jnp.zeros_like(neg_logits))
            return jnp.mean(pos_losses) + jnp.mean(neg_losses)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    num_steps = demo_steps(num_steps)
    for step in range(num_steps):
        key, subkey = jax.random.split(key)
        neg = negative_sampling(pos_train.shape[1], num_nodes,
                                edge_index=np.asarray(train_edge_index),
                                rng=step)
        params, opt_state, loss = train_step(params, opt_state,
                                             jnp.asarray(neg.astype(np.int32)),
                                             subkey)
        if step % 30 == 0:
            print(f"step {step}: loss={float(loss):.4f}")

    from sklearn.metrics import roc_auc_score
    embedded = model.apply({"params": params}, x, ei, ew)
    pos_scores = jax.nn.sigmoid(predict_edge(embedded, jnp.asarray(
        test_edge_index.astype(np.int32))))
    neg_scores = jax.nn.sigmoid(predict_edge(embedded, jnp.asarray(
        test_neg_edge_index.astype(np.int32))))
    y_true = np.concatenate([np.ones(len(pos_scores)), np.zeros(len(neg_scores))])
    y_score = np.concatenate([np.asarray(pos_scores), np.asarray(neg_scores)])
    auc = roc_auc_score(y_true, y_score)
    print(f"test AUC: {auc:.4f}")
    return auc


if __name__ == "__main__":
    main()
