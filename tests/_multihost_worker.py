"""Worker process for the multi-host correctness test (tests/test_multihost.py).

Each invocation is one "host": 4 virtual CPU devices, joined into a 2-process
jax.distributed cluster (8 global devices, Gloo collectives). Builds the same
deterministic problem as the single-process oracle, loads ONLY its own shards
(parallel/multihost.distribute*), runs 3 halo-GCN training steps, prints the
per-step losses for the parent to compare.

Usage: python _multihost_worker.py <port> <process_id> <two_level:0|1> [layout]
"""
import os
import sys

if __name__ == "__main__":  # when imported by pytest, conftest owns the env
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_problem(num_parts, layout="coo"):
    """Deterministic problem shared with the single-process oracle."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
    from tf_geometric_tpu.parallel.halo import build_halo_spec
    from tf_geometric_tpu.parallel.partition import partition_edges_by_row
    from tf_geometric_tpu.sparse import SparseMatrix

    num_nodes, num_edges, f, num_classes = 96, 400, 12, 5
    rng = np.random.default_rng(3)
    x = rng.normal(size=(num_nodes, f)).astype(np.float32)
    ei = rng.integers(0, num_nodes, size=(2, num_edges)).astype(np.int32)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    normed = gcn_norm_adj(SparseMatrix(ei, None, (num_nodes, num_nodes)))
    index, value = np.asarray(normed.index), np.asarray(normed.value)

    part = partition_edges_by_row(index, value, num_nodes, num_parts,
                                  pad_multiple=16)
    halo = build_halo_spec(part, layout=layout)
    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, f), np.float32); x_p[:num_nodes] = x
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = y
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    prng = np.random.default_rng(0)
    hidden = 8
    params = [
        (np.asarray(prng.normal(scale=0.1, size=(f, hidden)), np.float32),
         np.zeros(hidden, np.float32)),
        (np.asarray(prng.normal(scale=0.1, size=(hidden, num_classes)), np.float32),
         np.zeros(num_classes, np.float32)),
    ]
    return x_p, y_p, mask, halo, params, hidden, num_classes


def run_steps(mesh, graph_axis, x_p, y_p, mask, halo, params, hidden,
              num_classes, num_steps=3):
    from jax.sharding import PartitionSpec as P

    from tf_geometric_tpu.parallel import multihost
    from tf_geometric_tpu.parallel.sharded import make_graph_parallel_gcn_step

    plan = multihost.distribute_halo_plan(mesh, graph_axis, halo)
    step, optimizer = make_graph_parallel_gcn_step(
        mesh, graph_axis=graph_axis, hidden=hidden, num_classes=num_classes,
        halo_spec=plan)

    x_d = multihost.distribute(mesh, P(graph_axis, None), x_p)
    y_d = multihost.distribute(mesh, P(graph_axis), y_p)
    m_d = multihost.distribute(mesh, P(graph_axis), mask)
    params = jax.tree.map(lambda a: multihost.distribute(mesh, P(), a), params,
                          is_leaf=lambda a: isinstance(a, np.ndarray))
    opt_state = jax.jit(optimizer.init)(params)

    losses = []
    with mesh:
        for _ in range(num_steps):
            params, opt_state, loss = step(params, opt_state, x_d, y_d, m_d)
            losses.append(float(np.asarray(jax.device_get(loss))))
    return losses


def main():
    from tf_geometric_tpu.parallel import multihost

    port, process_id, two_level_arg = (int(sys.argv[1]), int(sys.argv[2]),
                                       int(sys.argv[3]))
    layout = sys.argv[4] if len(sys.argv) > 4 else "coo"
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=process_id)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    two_level = bool(two_level_arg)
    mesh = multihost.build_multihost_mesh(two_level=two_level)
    num_parts = 4 if two_level else 8
    x_p, y_p, mask, halo, params, hidden, num_classes = build_problem(
        num_parts, layout=layout)
    losses = run_steps(mesh, "graph", x_p, y_p, mask, halo, params, hidden,
                       num_classes)
    print("LOSSES", " ".join(f"{v:.8f}" for v in losses), flush=True)


if __name__ == "__main__":
    main()
