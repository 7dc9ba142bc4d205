"""Checkpoint save/restore mid-training (reference: demo/demo_checkpoint.py,
which uses tf.train.Checkpoint). TPU-native counterpart: orbax checkpointing
of the (params, opt_state, step) pytree."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from demo_utils import demo_steps, load_cora, masked_softmax_loss
from tf_geometric_tpu.layers import GCN
import flax.linen as nn


class GCNModel(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, training=False):
        h = GCN(units=16, activation=jax.nn.relu)([x, edge_index, edge_weight])
        return GCN(units=self.num_classes)([h, edge_index, edge_weight])


def main():
    import orbax.checkpoint as ocp

    graph, (train_index, valid_index, test_index) = load_cora()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    x = jnp.asarray(graph.x)
    ei = jnp.asarray(graph.edge_index)
    ew = jnp.asarray(graph.edge_weight)
    y = jnp.asarray(graph.y)

    model = GCNModel(num_classes=num_classes)
    key = jax.random.PRNGKey(0)
    params = model.init(key, x, ei, ew)["params"]
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, ei, ew, training=True)
            return masked_softmax_loss(p, logits, y, train_index)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ckpt_dir = os.path.join(tempfile.mkdtemp(), "gcn_ckpt")
    checkpointer = ocp.StandardCheckpointer()

    # phase 1: train 50 steps, checkpoint
    half = demo_steps(50)
    for step in range(half):
        params, opt_state, loss = train_step(params, opt_state)
    state = {"params": params, "opt_state": opt_state, "step": half}
    ckpt_path = os.path.join(ckpt_dir, f"step_{half}")
    checkpointer.save(ckpt_path, state)
    checkpointer.wait_until_finished()
    print(f"saved checkpoint at step {half} (loss={float(loss):.4f})")

    # phase 2: restore into freshly-initialized state and continue
    fresh_params = model.init(jax.random.PRNGKey(1), x, ei, ew)["params"]
    fresh_state = {"params": fresh_params,
                   "opt_state": optimizer.init(fresh_params), "step": 0}
    restored = checkpointer.restore(
        ckpt_path,
        jax.tree.map(ocp.utils.to_shape_dtype_struct, fresh_state)
        if hasattr(ocp.utils, "to_shape_dtype_struct") else fresh_state)
    params, opt_state = restored["params"], restored["opt_state"]
    print(f"restored checkpoint from step {restored['step']}")

    for step in range(half, 2 * half):
        params, opt_state, loss = train_step(params, opt_state)

    logits = model.apply({"params": params}, x, ei, ew)
    preds = jnp.argmax(logits, -1)
    acc = float(jnp.mean((preds[test_index] == y[test_index]).astype(jnp.float32)))
    print(f"test accuracy after resume: {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
