"""Measure (or refute) the claimed all_to_all/compute overlap in the halo
SpMM (parallel/halo.py:19-23): the local partial aggregation has no data
dependency on the collective, so the scheduler MAY run it while the
exchange is in flight.

Method: time three shard_map'd programs over the same P-device mesh and
arxiv-scale partitioned graph —

    t_full    = halo_exchange + split aggregation (the production layer)
    t_compute = split aggregation with the recv buffer supplied as input
    t_comm    = halo_exchange alone

overlap_fraction = (t_comm + t_compute − t_full) / min(t_comm, t_compute):
1.0 → the cheaper phase fully hides under the other; ≤0 → fully serialized.

On the 8-virtual-device CPU mesh this measures XLA's *scheduling* (thunks
may serialize on CPU — a lower bound for ICI behavior, where the DMA engine
runs collectives asynchronously); run with TFG_SCALING_REAL=1 on a pod
slice for ICI numbers. Writes a jax.profiler trace when TFG_TRACE_DIR is
set.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    if os.environ.get("TFG_SCALING_REAL") != "1":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_citation_graph
    from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
    from tf_geometric_tpu.parallel.halo import (build_halo_spec, halo_exchange,
                                                halo_spmm_split)
    from tf_geometric_tpu.parallel.partition import (apply_node_permutation,
                                                     partition_edges_by_row,
                                                     partition_order)
    from tf_geometric_tpu.parallel.sharded import (_plan_arrays, _plan_specs,
                                                   _squeeze_plan, build_mesh)
    from tf_geometric_tpu.sparse import SparseMatrix

    P_DEV = int(os.environ.get("TFG_OVERLAP_DEVICES", len(jax.devices())))
    N = int(os.environ.get("TFG_SCALING_NODES", 169_343))
    F = int(os.environ.get("TFG_SCALING_FEATURES", 128))
    graph = synthetic_citation_graph(num_nodes=N, num_features=F,
                                     num_classes=40, avg_degree=8, seed=0)
    perm = partition_order(graph.edge_index, graph.num_nodes, P_DEV)
    graph, _ = apply_node_permutation(graph, perm)
    normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                       (N, N)))
    part = partition_edges_by_row(np.asarray(jax.device_get(normed.index)),
                                  np.asarray(jax.device_get(normed.value)),
                                  N, P_DEV)
    spec = build_halo_spec(part)
    mesh = build_mesh({"graph": P_DEV})
    npp = spec.nodes_per_part
    plan = _plan_arrays(spec)
    send_idx, loc_row, loc_col, loc_val, rem_row, rem_addr, rem_val = plan

    x = np.zeros((part.num_nodes_padded, F), np.float32)
    x[:N] = np.asarray(graph.x)
    x = jnp.asarray(x)

    def full_fn(h_local, send_idx, *plan_rest):
        send_idx = send_idx[0]
        plan_rest = tuple(a[0] for a in plan_rest)
        recv = halo_exchange(h_local, send_idx, "graph")
        out = halo_spmm_split(h_local, recv, *plan_rest, npp)
        return out

    def compute_fn(h_local, recv, send_idx, *plan_rest):
        plan_rest = tuple(a[0] for a in plan_rest)
        return halo_spmm_split(h_local, recv[0], *plan_rest, npp)

    def comm_fn(h_local, send_idx, *plan_rest):
        send_idx = send_idx[0]
        recv = halo_exchange(h_local, send_idx, "graph")
        return recv.reshape(-1, h_local.shape[1])

    shard = P("graph", None)
    pspecs = _plan_specs("graph")

    full = jax.jit(shard_map(full_fn, mesh=mesh,
                             in_specs=(shard,) + pspecs, out_specs=shard))
    compute = jax.jit(shard_map(
        compute_fn, mesh=mesh,
        in_specs=(shard, P("graph", None, None)) + pspecs, out_specs=shard))
    comm = jax.jit(shard_map(comm_fn, mesh=mesh,
                             in_specs=(shard,) + pspecs, out_specs=shard))

    recv_buf = comm(x, *plan)  # [P*P*cap, F] global → reshaped per device
    recv_in = recv_buf.reshape(P_DEV, spec.num_parts * spec.capacity, F)

    def timeit(fn, args, iters=20):
        out = fn(*args)
        _ = np.asarray(out[:1])
        t = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(out[:1])
        return (time.time() - t) / iters

    with mesh:
        t_full = timeit(full, (x, *plan))
        t_compute = timeit(compute, (x, recv_in, *plan))
        t_comm = timeit(comm, (x, *plan))

    overlap = (t_comm + t_compute - t_full) / max(min(t_comm, t_compute), 1e-12)
    result = {
        "devices": P_DEV, "nodes": N, "features": F,
        "halo_fraction": round(spec.halo_fraction, 4),
        "t_full_ms": round(t_full * 1e3, 3),
        "t_compute_ms": round(t_compute * 1e3, 3),
        "t_comm_ms": round(t_comm * 1e3, 3),
        "overlap_fraction": round(float(overlap), 4),
    }
    trace_dir = os.environ.get("TFG_TRACE_DIR")
    if trace_dir is None and os.environ.get("TFG_SCALING_REAL") == "1":
        # on real hardware the trace IS the result — capture it unasked so
        # overlap_trace_analysis.py can settle the ICI-overlap claim from
        # the profiler timeline rather than wall-clock inference
        trace_dir = "/tmp/halo_trace"
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            with mesh:
                for _ in range(3):
                    out = full(x, *plan)
                _ = np.asarray(out[:1])
        result["trace_dir"] = trace_dir
    print(json.dumps(result))
    out_path = os.environ.get("TFG_SCALING_OUT")
    if out_path:
        with open(out_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
