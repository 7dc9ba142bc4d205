"""Early-stopping GAT node-classification benchmark
(reference: benchmarks/node_classification/bench_node_cls_early_stop_gat.py).

Protocol (reference :18-24,121-156): 16 hidden, dropout 0.5, lr 1e-2,
L2 5e-4, patience 100 on validation accuracy, ≤400 steps; the test accuracy
at the best validation step is appended to results.txt.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "demo"))

import jax
if os.environ.get("BENCH_PLATFORM", "cpu") == "cpu":
    # accuracy runs don't need the TPU — keep the fragile tunnel free
    # (CLAUDE.md: never run two TPU clients at once)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from demo_utils import load_cora, train_node_classifier
from tf_geometric_tpu.layers import GAT

DATASET = os.environ.get("BENCH_DATASET", "cora")
PATIENCE = 100
MAX_STEPS = 400

# per-dataset settings, verbatim from the reference (gat.py:51-64):
# cora drop 0.7 / l2 1e-3; citeseer drop 0.6 / l2 2e-3; pubmed drop 0.0 /
# l2 2e-3 with the single-head-encoder + 8-head-mean-decoder architecture
DROP = {"cora": 0.7, "citeseer": 0.6, "pubmed": 0.0}.get(DATASET, 0.6)
L2 = {"cora": 1e-3, "citeseer": 2e-3, "pubmed": 2e-3}.get(DATASET, 1e-3)


class GATModel(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, training=False):
        x = nn.Dropout(DROP, deterministic=not training)(x)
        if DATASET != "pubmed":
            h = GAT(units=64, attention_units=8, num_heads=8,
                    activation=jax.nn.relu, edge_drop_rate=DROP)(
                [x, edge_index], training=training)
            h = nn.Dropout(DROP, deterministic=not training)(h)
            return GAT(units=self.num_classes, attention_units=1,
                       edge_drop_rate=DROP)([h, edge_index], training=training)
        h = GAT(units=64, attention_units=1, num_heads=1,
                activation=jax.nn.relu, edge_drop_rate=DROP)(
            [x, edge_index], training=training)
        h = nn.Dropout(DROP, deterministic=not training)(h)
        return GAT(units=self.num_classes, attention_units=8, num_heads=8,
                   split_value_heads=False, edge_drop_rate=DROP)(
            [h, edge_index], training=training)


def run(seed=0):
    graph, splits = load_cora()
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    model = GATModel(num_classes=num_classes)
    ei = jnp.asarray(graph.edge_index)
    ew = jnp.asarray(graph.edge_weight)
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key},
                        graph.x, ei, ew)["params"]

    def forward(p, training, dropout_key):
        rngs = {"dropout": dropout_key} if training else {}
        return model.apply({"params": p}, graph.x, ei, ew, training=training,
                           rngs=rngs)

    return train_node_classifier(forward, params, jnp.asarray(graph.y), splits,
                                 num_steps=MAX_STEPS, patience=PATIENCE,
                                 learning_rate=5e-3, l2_coef=L2, seed=seed)


if __name__ == "__main__":
    # accepts any number of seeds — one process compiles once per shape and
    # reuses the dataset across seeds (20-seed protocol, run_multi_times.sh)
    seeds = [int(v) for v in sys.argv[1:]] or [0]
    results_path = os.environ.get(
        "TFG_RESULTS_PATH",
        os.path.join(os.path.dirname(__file__), "results.txt"))
    for seed in seeds:
        test_acc = run(seed)
        with open(results_path, "a", encoding="utf-8") as f:
            f.write(f"{test_acc}\n")
        print(f"seed {seed}: test accuracy {test_acc:.4f}")
