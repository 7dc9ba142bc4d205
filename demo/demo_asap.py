"""ASAP hierarchical pooling graph classification (reference: demo/demo_asap.py).

Uses the fixed-k jit/grad-safe ASAP path (padded G·k clusters) so the whole
training step differentiates and compiles once over padded batches."""
import jax
import flax.linen as nn

from demo_utils import run_graph_classification
from tf_geometric_tpu.layers import ASAP, GCN
from tf_geometric_tpu.nn import mean_pool


class ASAPModel(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        h = GCN(units=32, activation=jax.nn.relu)([x, edge_index, edge_weight])
        h, ei, ew, ngi = ASAP(units=32, k=8, num_graphs=self.num_graphs)(
            [h, edge_index, edge_weight, node_graph_index], training=training)
        h = mean_pool(h, ngi, num_graphs=self.num_graphs)
        h = nn.Dropout(0.4, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_steps=200):
    return run_graph_classification(
        lambda c, g: ASAPModel(num_classes=c, num_graphs=g),
        batch_size=16, num_steps=num_steps)


if __name__ == "__main__":
    main()
