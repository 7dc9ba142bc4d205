"""DropEdge + deep GCN (reference: demo/demo_drop_edge_gcn.py: 8 GCN layers
with DropEdge regularization + forward-latency speed test)."""
import time

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from demo_utils import demo_steps, load_cora, train_node_classifier
from tf_geometric_tpu.layers import GCN, DropEdge

NUM_LAYERS = 8
HIDDEN = 128


class DropEdgeGCNModel(nn.Module):
    num_classes: int
    num_nodes: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, training=False):
        edge_index, edge_weight = DropEdge(rate=0.5, num_nodes=self.num_nodes)(
            [edge_index, edge_weight], training=training)
        h = x
        for _ in range(NUM_LAYERS - 1):
            h = GCN(units=HIDDEN, activation=jax.nn.relu)(
                [h, edge_index, edge_weight], training=training)
            h = nn.Dropout(0.5, deterministic=not training)(h)
        return GCN(units=self.num_classes)([h, edge_index, edge_weight],
                                           training=training)


def main():
    graph, splits = load_cora()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    model = DropEdgeGCNModel(num_classes=num_classes, num_nodes=graph.num_nodes)
    edge_index = jnp.asarray(graph.edge_index)
    edge_weight = jnp.asarray(graph.edge_weight)

    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, graph.x, edge_index,
                        edge_weight)["params"]

    def forward(p, training, dropout_key):
        rngs = {"dropout": dropout_key} if training else {}
        return model.apply({"params": p}, graph.x, edge_index, edge_weight,
                           training=training, rngs=rngs)

    test_acc = train_node_classifier(forward, params, jnp.asarray(graph.y),
                                     splits, num_steps=400)

    # speed test (demo_drop_edge_gcn.py:104-110)
    fwd = jax.jit(lambda p: forward(p, False, None))
    _ = np.asarray(fwd(params)[0, :1])
    start = time.time()
    out = None
    for _ in range(demo_steps(100)):
        out = fwd(params)
    _ = np.asarray(out[0, :1])
    print(f"mean forward latency ({NUM_LAYERS}x{HIDDEN} GCN): "
          f"{(time.time() - start) / 100 * 1000:.3f} ms")
    return test_acc


if __name__ == "__main__":
    main()
