"""Single-file weight save/load (reference: demo/demo_save_and_load_model.py,
model.save_weights/load_weights): flax params serialized via
``flax.serialization.to_bytes``/``from_bytes``."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import flax

from demo_utils import load_cora
from tf_geometric_tpu.layers import GCN
import flax.linen as nn


class GCNModel(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, training=False):
        h = GCN(units=16, activation=jax.nn.relu)([x, edge_index, edge_weight])
        return GCN(units=self.num_classes)([h, edge_index, edge_weight])


def main():
    graph, _ = load_cora()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    x = jnp.asarray(graph.x)
    ei = jnp.asarray(graph.edge_index)
    ew = jnp.asarray(graph.edge_weight)

    model = GCNModel(num_classes=num_classes)
    params = model.init(jax.random.PRNGKey(0), x, ei, ew)["params"]
    logits_before = model.apply({"params": params}, x, ei, ew)

    path = os.path.join(tempfile.mkdtemp(), "gcn_weights.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    print(f"saved weights to {path}")

    fresh = model.init(jax.random.PRNGKey(42), x, ei, ew)["params"]
    with open(path, "rb") as f:
        loaded = flax.serialization.from_bytes(fresh, f.read())
    logits_after = model.apply({"params": loaded}, x, ei, ew)

    np.testing.assert_allclose(np.asarray(logits_before),
                               np.asarray(logits_after), rtol=1e-6)
    print("loaded weights reproduce identical outputs")
    return True


if __name__ == "__main__":
    main()
