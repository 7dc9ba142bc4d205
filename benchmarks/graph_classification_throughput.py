"""Batched graph-classification training throughput (BASELINE.json config 4):
GIN + sum-pool readout and GIN + SortPool over TU-scale padded batches.

Synthetic NCI1-shaped graph set (mean ~30 nodes / ~32 undirected edges per
graph), padded disjoint-union batches via data/padding.py. The batch is fixed
(compute throughput; host-side batch packing measured separately in the
demos) and rides as inlined jit constants — the layout rule from
benchmarks/README.md. Run alone on the TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))

import numpy as np

BATCH = 128
UNITS = 64
LAYERS = 3


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from demo_utils import load_graph_classification_data, padded_batch_generator
    from tf_geometric_tpu.layers import GIN
    from tf_geometric_tpu.nn import sum_pool
    from tf_geometric_tpu.nn.pool.sort_pool import sort_pool
    from tf_geometric_tpu.utils.profiling import measure_step_time

    graphs, num_classes = load_graph_classification_data("NCI1", seed=0)
    # shuffle=False so the first batch is graphs[:BATCH] and the labels below
    # correspond to the graphs actually in the batch
    gen = padded_batch_generator(graphs, BATCH, shuffle=False, seed=0)
    batch, real = next(gen)
    num_nodes = batch.x.shape[0]
    num_edges = batch.edge_index.shape[1]
    print(f"batch: {BATCH} graphs, {num_nodes} padded nodes, "
          f"{num_edges} padded edges", flush=True)

    class MLP(nn.Module):
        units: int

        @nn.compact
        def __call__(self, h, training=False):
            h = nn.Dense(self.units)(h)
            return nn.Dense(self.units)(jax.nn.relu(h))

    class GINSum(nn.Module):
        @nn.compact
        def __call__(self, x, edge_index, edge_weight, node_graph_index):
            h = x
            for _ in range(LAYERS):
                h = jax.nn.relu(GIN(mlp_model=MLP(UNITS))([h, edge_index]))
            h = sum_pool(h, node_graph_index, num_graphs=BATCH)
            return nn.Dense(num_classes)(h)

    class GINSort(nn.Module):
        @nn.compact
        def __call__(self, x, edge_index, edge_weight, node_graph_index):
            h = x
            for _ in range(LAYERS):
                h = jax.nn.relu(GIN(mlp_model=MLP(UNITS))([h, edge_index]))
            pooled = sort_pool(h, edge_index, edge_weight, node_graph_index,
                               k=16, num_graphs=BATCH)
            return nn.Dense(num_classes)(pooled[0].reshape(BATCH, -1))

    x = jnp.asarray(batch.x)
    ei = jnp.asarray(batch.edge_index)
    ew = jnp.asarray(batch.edge_weight)
    ngi = jnp.asarray(batch.node_graph_index)
    y = jnp.asarray(np.array([g.y for g in graphs[:BATCH]], np.int32).reshape(-1))

    for name, model in (("GIN+sum_pool", GINSum()), ("GIN+sort_pool", GINSort())):
        key = jax.random.PRNGKey(0)
        params = model.init(key, x, ei, ew, ngi)["params"]
        optimizer = optax.adam(1e-3)

        @jax.jit
        def train_step(p, s):
            def loss_fn(p):
                logits = model.apply({"params": p}, x, ei, ew, ngi)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s

        s = optimizer.init(params)
        t = measure_step_time(train_step, (params, s), lo=3, hi=15)
        print(f"{name:14s} {t*1e3:8.2f} ms/step  "
              f"{BATCH/t:9.0f} graphs/s  {num_edges/t/1e6:7.1f} M edges/s",
              flush=True)


if __name__ == "__main__":
    main()
