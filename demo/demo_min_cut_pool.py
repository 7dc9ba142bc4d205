"""MinCutPool graph classification (reference: demo/demo_min_cut_pool.py):
spectral-clustering pooling with auxiliary min-cut + orthogonality losses
added to the objective via the flax "losses" collection."""
import jax
import jax.numpy as jnp
import flax.linen as nn

from demo_utils import run_graph_classification
from tf_geometric_tpu.layers import GCN, MinCutPool
from tf_geometric_tpu.nn import mean_pool


class MinCutPoolModel(nn.Module):
    num_classes: int
    num_graphs: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, node_graph_index,
                 training=False):
        h = GCN(units=32, activation=jax.nn.relu)([x, edge_index, edge_weight])

        feature_layer = GCN(units=32, activation=jax.nn.relu, name="feature_gnn")
        assign_layer = GCN(units=8, name="assign_gnn")

        def feature_fn(inputs, training=None, cache=None):
            return feature_layer(inputs, training=training)

        def assign_fn(inputs, training=None, cache=None):
            return assign_layer(inputs, training=training)

        h, ei, ew, ngi = MinCutPool(
            feature_gnn=feature_fn, assign_gnn=assign_fn, units=32,
            num_clusters=8, num_graphs=self.num_graphs)(
            [h, edge_index, edge_weight, node_graph_index], training=training)
        h = mean_pool(h, ngi, num_graphs=self.num_graphs)
        h = nn.Dropout(0.4, deterministic=not training)(h)
        return nn.Dense(self.num_classes)(h)


def _find_sown(tree, name):
    """The sown value lives under the sub-module's path in the collection."""
    if isinstance(tree, dict):
        if name in tree:
            return tree[name]
        for v in tree.values():
            found = _find_sown(v, name)
            if found is not None:
                return found
    return None


def _aux_loss(state):
    cut, orth = _find_sown(state["losses"], "min_cut_losses")
    return cut + orth


def main(num_steps=300):
    return run_graph_classification(
        lambda c, g: MinCutPoolModel(num_classes=c, num_graphs=g),
        num_steps=num_steps, extra_loss_from_state=_aux_loss)


if __name__ == "__main__":
    main()
