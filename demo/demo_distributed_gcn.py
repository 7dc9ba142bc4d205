"""Distributed (graph-parallel) GCN training (reference:
demo/demo_distributed_gcn.py, which replicates the full graph per GPU via
MirroredStrategy).

The TPU-native replacement does real graph parallelism instead: the node set
is partitioned into contiguous row blocks across the mesh's ``graph`` axis,
edges live with their destination block, and each SpMM all-gathers the
layer's activations over ICI while segment-reducing locally (SURVEY §2.8).
Runs on any device count — including a CPU-simulated 8-device mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python demo/demo_distributed_gcn.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from demo_utils import demo_steps, load_cora
from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
from tf_geometric_tpu.parallel.partition import partition_edges_by_row
from tf_geometric_tpu.parallel.sharded import build_mesh, make_graph_parallel_gcn_step
from tf_geometric_tpu.sparse import SparseMatrix


def main(num_steps=100):
    graph, (train_index, valid_index, test_index) = load_cora()
    num_devices = len(jax.devices())
    graph_parts = num_devices
    mesh = build_mesh({"graph": graph_parts})

    num_nodes = graph.num_nodes
    num_classes = int(np.max(np.asarray(jax.device_get(graph.y)))) + 1
    normed = gcn_norm_adj(graph.adj())
    part = partition_edges_by_row(jax.device_get(normed.index),
                                  jax.device_get(normed.value),
                                  num_nodes, graph_parts)

    n_pad = part.num_nodes_padded
    x_np = np.asarray(jax.device_get(graph.x))
    x_p = np.zeros((n_pad, x_np.shape[1]), np.float32)
    x_p[:num_nodes] = x_np
    y_p = np.zeros(n_pad, np.int32)
    y_p[:num_nodes] = np.asarray(jax.device_get(graph.y))
    train_mask = np.zeros(n_pad, np.float32)
    train_mask[np.asarray(train_index)] = 1.0

    step, optimizer = make_graph_parallel_gcn_step(
        mesh, hidden=16, num_classes=num_classes)

    rng = np.random.default_rng(0)
    params = [
        (jnp.asarray(rng.normal(scale=0.1, size=(x_np.shape[1], 16)), jnp.float32),
         jnp.zeros(16)),
        (jnp.asarray(rng.normal(scale=0.1, size=(16, num_classes)), jnp.float32),
         jnp.zeros(num_classes)),
    ]
    opt_state = optimizer.init(params)
    rows = jnp.asarray(part.local_row.reshape(-1))
    cols = jnp.asarray(part.global_col.reshape(-1))
    vals = jnp.asarray(part.value.reshape(-1))

    with mesh:
        for s in range(demo_steps(num_steps)):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x_p), rows, cols, vals,
                jnp.asarray(y_p), jnp.asarray(train_mask))
            if s % 20 == 0:
                print(f"step {s}: loss={float(loss):.4f}")

    # evaluate on a single device with the trained params
    adj = SparseMatrix(normed.index, normed.value, (num_nodes, num_nodes))
    h = jax.nn.relu(adj.matmul(jnp.asarray(x_np) @ params[0][0]) + params[0][1])
    logits = adj.matmul(h @ params[1][0]) + params[1][1]
    preds = jnp.argmax(logits, -1)
    y = jnp.asarray(y_p[:num_nodes])
    acc = float(jnp.mean((preds[test_index] == y[test_index]).astype(jnp.float32)))
    print(f"test accuracy ({graph_parts}-way graph-parallel training): {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
