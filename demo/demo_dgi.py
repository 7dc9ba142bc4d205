"""Deep Graph Infomax unsupervised embedding (reference: demo/demo_dgi.py):
positive = GCN(x), negative = GCN(row-shuffled x); bilinear discriminator
against a sigmoid mean-pooled summary; embeddings evaluated with logistic
regression on the node-classification splits."""
import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import optax

from demo_utils import demo_steps, load_cora
from tf_geometric_tpu.layers import GCN


class DGIEncoder(nn.Module):
    units: int = 64

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, training=False):
        h = GCN(units=self.units, activation=None)([x, edge_index, edge_weight])
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(h >= 0, h, alpha * h)  # PReLU


class Discriminator(nn.Module):
    units: int = 64

    @nn.compact
    def __call__(self, summary, h):
        bilinear = self.param("bilinear", nn.initializers.glorot_uniform(),
                              (self.units, self.units))
        return jnp.sum(h * (summary @ bilinear), axis=-1)


def main(num_steps=150):
    graph, (train_index, valid_index, test_index) = load_cora()
    x = jnp.asarray(graph.x)
    ei = jnp.asarray(graph.edge_index)
    ew = jnp.asarray(graph.edge_weight)
    y = np.asarray(jax.device_get(graph.y))

    encoder = DGIEncoder()
    disc = Discriminator()
    key = jax.random.PRNGKey(0)
    enc_params = encoder.init(key, x, ei, ew)["params"]
    h0 = encoder.apply({"params": enc_params}, x, ei, ew)
    disc_params = disc.init(key, jnp.ones((1, 64)), h0)["params"]
    params = {"enc": enc_params, "disc": disc_params}
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, perm, step_key):
        def loss_fn(p):
            pos_h = encoder.apply({"params": p["enc"]}, x, ei, ew, training=True)
            neg_h = encoder.apply({"params": p["enc"]}, x[perm], ei, ew,
                                  training=True)
            summary = jax.nn.sigmoid(jnp.mean(pos_h, axis=0, keepdims=True))
            pos_logits = disc.apply({"params": p["disc"]}, summary, pos_h)
            neg_logits = disc.apply({"params": p["disc"]}, summary, neg_h)
            return (optax.sigmoid_binary_cross_entropy(
                        pos_logits, jnp.ones_like(pos_logits)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        neg_logits, jnp.zeros_like(neg_logits)).mean())
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    num_steps = demo_steps(num_steps)
    for step in range(num_steps):
        key, k1, k2 = jax.random.split(key, 3)
        perm = jax.random.permutation(k1, x.shape[0])
        params, opt_state, loss = train_step(params, opt_state, perm, k2)
        if step % 30 == 0:
            print(f"step {step}: loss={float(loss):.4f}")

    from sklearn.linear_model import LogisticRegression
    embedded = np.asarray(encoder.apply({"params": params["enc"]}, x, ei, ew))
    clf = LogisticRegression(max_iter=500)
    tr = np.asarray(train_index)
    te = np.asarray(test_index)
    clf.fit(embedded[tr], y[tr])
    acc = clf.score(embedded[te], y[te])
    print(f"test accuracy (logreg on DGI embeddings): {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
