"""Driver benchmark: GCN fwd+bwd throughput on an ogbn-arxiv-scale graph.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs on whatever accelerator JAX resolves (the axon TPU v5e in this
environment; CPU elsewhere). The workload is the reference's north-star
config (BASELINE.json): 2-layer GCN full training step (forward + backward +
Adam) over a graph with ogbn-arxiv's node/edge counts. ``vs_baseline`` is
measured throughput / SpMM HBM-bandwidth roofline estimate (target ≥0.8).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_ogbn_arxiv_like
    from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
    from tf_geometric_tpu.sparse import SparseMatrix

    NUM_CLASSES, HIDDEN = 40, 256

    graph = synthetic_ogbn_arxiv_like()
    num_nodes, num_features = graph.x.shape
    normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                       (num_nodes, num_nodes)))
    index = jnp.asarray(normed.index)
    value = jnp.asarray(normed.value)
    num_edges_normed = int(index.shape[1])
    x = jnp.asarray(graph.x)
    y = jnp.asarray(graph.y)

    rng = np.random.default_rng(0)
    params = {
        "w0": jnp.asarray(rng.normal(scale=0.05, size=(num_features, HIDDEN)),
                          jnp.float32),
        "b0": jnp.zeros(HIDDEN),
        "w1": jnp.asarray(rng.normal(scale=0.05, size=(HIDDEN, NUM_CLASSES)),
                          jnp.float32),
        "b1": jnp.zeros(NUM_CLASSES),
    }
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    adj = SparseMatrix(index, value, (num_nodes, num_nodes))

    def loss_fn(p):
        h = jax.nn.relu(adj.matmul(x @ p["w0"]) + p["b0"])
        logits = adj.matmul(h @ p["w1"]) + p["b1"]
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    @jax.jit
    def train_step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    # warmup / compile
    params, opt_state, loss = train_step(params, opt_state)
    jax.block_until_ready(loss)

    iters = 30
    start = time.time()
    for _ in range(iters):
        params, opt_state, loss = train_step(params, opt_state)
    jax.block_until_ready(loss)
    elapsed = time.time() - start

    step_time = elapsed / iters
    edges_per_sec = num_edges_normed / step_time

    # SpMM HBM roofline: per fwd SpMM, bytes ≈ E·(4B val + 8B idx + F·4B
    # gathered rows) + N·F·4B output; fwd+bwd ≈ 2 layers × (1 fwd + 2 bwd
    # SpMM-shaped passes). v5e HBM BW ≈ 819 GB/s.
    backend = jax.default_backend()
    hbm_bw = 819e9 if backend == "tpu" else 50e9
    f_avg = (num_features + HIDDEN) / 2
    bytes_per_spmm = (num_edges_normed * (4 + 8 + f_avg * 4)
                      + num_nodes * f_avg * 4)
    spmm_passes = 2 * 3  # 2 layers × (fwd + dh + dvalue-sized traffic)
    roofline_step_time = spmm_passes * bytes_per_spmm / hbm_bw
    roofline_edges_per_sec = num_edges_normed / roofline_step_time

    print(json.dumps({
        "metric": "gcn_arxiv_fwd_bwd_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / roofline_edges_per_sec, 4),
    }))


if __name__ == "__main__":
    main()
