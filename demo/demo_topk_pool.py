"""Top-k pooling graph classification (reference: demo/demo_topk_pool.py):
direct use of the fixed-k top-k selection as a readout."""
import jax
import jax.numpy as jnp
import flax.linen as nn

from demo_utils import run_graph_classification
from tf_geometric_tpu.layers import GCN
from tf_geometric_tpu.nn.pool.topk_pool import topk_pool_fixed

K = 4


class TopKPoolModel(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        h = GCN(units=32, activation=jax.nn.relu)([x, edge_index, edge_weight])
        score = GCN(units=1)([h, edge_index, edge_weight]).reshape(-1)
        idx, valid = topk_pool_fixed(node_graph_index, score,
                                     self.num_graphs, K)
        safe = jnp.clip(idx, 0, h.shape[0] - 1)
        picked = jnp.where(valid[:, None], jnp.take(h, safe, axis=0), 0.0)
        h = picked.reshape(self.num_graphs, -1)   # [G, K*F]
        h = nn.Dropout(0.4, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def main(num_steps=300):
    return run_graph_classification(
        lambda c, g: TopKPoolModel(num_classes=c, num_graphs=g),
        num_steps=num_steps)


if __name__ == "__main__":
    main()
