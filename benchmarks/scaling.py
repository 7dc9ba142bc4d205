"""Graph-parallel scaling-efficiency harness (BASELINE.md: ≥70% edges/s
scaling efficiency on a 2-host slice; report 1 chip → 1 host → N hosts).

Measures full-training-step edges/s of the edge-partitioned GCN at several
device counts. On real multi-chip hardware run as-is; without it, simulate
with virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure(num_devices, graph, use_rcm=True, steps=10, model="gcn"):
    import jax
    import jax.numpy as jnp
    from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
    from tf_geometric_tpu.parallel.halo import build_halo_spec
    from tf_geometric_tpu.parallel.partition import (apply_node_permutation,
                                                     partition_edges_by_row,
                                                     partition_order)
    from tf_geometric_tpu.parallel.sharded import (build_mesh,
                                                   make_graph_parallel_gat_step,
                                                   make_graph_parallel_gcn_step,
                                                   make_graph_parallel_mincut_step)
    from tf_geometric_tpu.sparse import SparseMatrix
    from tf_geometric_tpu.utils.graph_utils import add_self_loop_edge, adj_norm_edge

    if use_rcm and num_devices > 1 and model != "sage":
        # balanced block-aligned partition (LPA + bin-packing + refinement)
        # (sage samples uniformly over the whole graph: ordering is moot)
        perm = partition_order(graph.edge_index, graph.num_nodes, num_devices)
        graph, _ = apply_node_permutation(graph, perm)

    num_nodes = graph.num_nodes

    if model == "sage":
        from tf_geometric_tpu.parallel import (build_csr_shards,
                                               make_sampled_sage_step)
        if os.environ.get("TFG_SAGE_EXCHANGE") == "bf16":
            from tf_geometric_tpu.parallel import sampled_sage
            sampled_sage.set_exchange_dtype(jnp.bfloat16)
        k = (25, 10)
        n_pad = -(-num_nodes // (128 * num_devices)) * (128 * num_devices)
        x_np = np.asarray(graph.x)
        x_p = np.zeros((n_pad, x_np.shape[1]), np.float32)
        x_p[:num_nodes] = x_np
        y_p = np.zeros(n_pad, np.int32)
        y_p[:num_nodes] = np.asarray(graph.y)
        mask = np.zeros(n_pad, np.float32)
        mask[:num_nodes] = 1.0
        shards = build_csr_shards(np.asarray(graph.edge_index), n_pad,
                                  num_devices)
        mesh = build_mesh({"graph": num_devices})
        step, init_params, optimizer = make_sampled_sage_step(
            mesh, shards, num_features=x_np.shape[1], num_classes=40,
            k=k, hidden=128)
        params = init_params(np.random.default_rng(0))
        opt_state = optimizer.init(params)
        import jax as _jax
        with mesh:
            params, opt_state, loss = step(
                params, opt_state, _jax.random.PRNGKey(0), jnp.asarray(x_p),
                jnp.asarray(y_p), jnp.asarray(mask))
            _ = np.asarray(loss)
            t = time.time()
            for i in range(steps):
                params, opt_state, loss = step(
                    params, opt_state, _jax.random.PRNGKey(i + 1),
                    jnp.asarray(x_p), jnp.asarray(y_p), jnp.asarray(mask))
            _ = np.asarray(loss)
            elapsed = (time.time() - t) / steps
        return num_nodes * sum(k) / elapsed, 0.0
    if model in ("gat", "gat_full"):
        ei, ew = add_self_loop_edge(np.asarray(graph.edge_index), num_nodes)
        index, value = ei, np.asarray(ew, np.float32)
    elif model == "mincut":
        # MinCut semantics: sym-normalized Ã without self-loops drives both
        # the encoder GNNs and the losses (reference min_cut_pool.py:163)
        idx, val = adj_norm_edge(graph.edge_index, num_nodes, graph.edge_weight,
                                 add_self_loop=False)
        index, value = np.asarray(idx), np.asarray(val)
    else:
        normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                           (num_nodes, num_nodes)))
        index, value = jax.device_get(normed.index), jax.device_get(normed.value)
    part = partition_edges_by_row(index, value, num_nodes, num_devices)
    # TFG_SCALING_LAYOUT=ell runs the packed production kernels per shard
    spec = build_halo_spec(part,
                           layout=os.environ.get("TFG_SCALING_LAYOUT", "coo"))
    mesh = build_mesh({"graph": num_devices})
    num_classes = 40
    rng = np.random.default_rng(0)
    x_np = np.asarray(graph.x)
    if model == "gat_full":
        # the reference's ARXIV-SHAPED two-layer stack: 8-head 64-wide
        # encoder + single-head decoder layer, attention AND feature dropout
        # 0.6 (reference gat.py:51-64, demo_gat.py:14-23), on the fused
        # packed kernel (VERDICT r3 item 7: size the SDDMM halo path
        # realistically)
        from tf_geometric_tpu.parallel.halo import build_gat_halo_spec
        from tf_geometric_tpu.parallel.sharded import \
            make_graph_parallel_gat_fused_step
        gspec = build_gat_halo_spec(part)
        dims = ((8, 8), (1, 64))
        fused_step, optimizer = make_graph_parallel_gat_fused_step(
            mesh, gspec, layer_dims=dims, num_classes=num_classes,
            edge_drop_rate=0.6, feat_drop_rate=0.6)
        layers, fin = [], x_np.shape[1]
        for (h_, d_) in dims:
            hd = h_ * d_
            layers.append(
                (jnp.asarray(rng.normal(scale=0.1, size=(fin, hd)), jnp.float32),
                 jnp.zeros(hd),
                 jnp.asarray(rng.normal(scale=0.1, size=(fin, hd)), jnp.float32),
                 jnp.zeros(hd),
                 jnp.asarray(rng.normal(scale=0.1, size=(fin, hd)), jnp.float32),
                 jnp.zeros(hd)))
            fin = hd
        params = (layers,
                  (jnp.asarray(rng.normal(scale=0.1, size=(fin, num_classes)),
                               jnp.float32), jnp.zeros(num_classes)))
        import jax as _jax

        def step(p, s, *a, _s=fused_step):  # throughput: fixed dropout key
            return _s(p, s, _jax.random.PRNGKey(0), *a)
    elif model == "gat":
        H, d = 8, 8
        step, optimizer = make_graph_parallel_gat_step(
            mesh, spec, num_heads=H, units=d, num_classes=num_classes)
        params = (
            (jnp.asarray(rng.normal(scale=0.1, size=(x_np.shape[1], H * d)), jnp.float32),
             jnp.zeros(H * d),
             jnp.asarray(rng.normal(scale=0.1, size=(x_np.shape[1], H * d)), jnp.float32),
             jnp.zeros(H * d),
             jnp.asarray(rng.normal(scale=0.1, size=(x_np.shape[1], H * d)), jnp.float32),
             jnp.zeros(H * d)),
            (jnp.asarray(rng.normal(scale=0.1, size=(H * d, num_classes)), jnp.float32),
             jnp.zeros(num_classes)),
        )
    elif model == "mincut":
        hidden, C = 64, 32
        step, optimizer = make_graph_parallel_mincut_step(
            mesh, num_clusters=C, hidden=hidden, num_classes=num_classes)
        params = (
            (jnp.asarray(rng.normal(scale=0.1, size=(x_np.shape[1], hidden)), jnp.float32),
             jnp.zeros(hidden)),
            (jnp.asarray(rng.normal(scale=0.1, size=(x_np.shape[1], C)), jnp.float32),
             jnp.zeros(C)),
            (jnp.asarray(rng.normal(scale=0.1, size=(hidden, hidden)), jnp.float32),
             jnp.zeros(hidden)),
            (jnp.asarray(rng.normal(scale=0.1, size=(2 * hidden, num_classes)), jnp.float32),
             jnp.zeros(num_classes)),
        )
    else:
        step, optimizer = make_graph_parallel_gcn_step(
            mesh, hidden=64, num_classes=num_classes, halo_spec=spec)
        params = [
            (jnp.asarray(rng.normal(scale=0.1, size=(x_np.shape[1], 64)), jnp.float32),
             jnp.zeros(64)),
            (jnp.asarray(rng.normal(scale=0.1, size=(64, num_classes)), jnp.float32),
             jnp.zeros(num_classes)),
        ]

    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, x_np.shape[1]), np.float32)
    x_p[:num_nodes] = x_np
    y_p = np.zeros(n_pad, np.int32)
    y_p[:num_nodes] = np.asarray(graph.y)
    mask = np.zeros(n_pad, np.float32)
    mask[:num_nodes] = 1.0

    opt_state = optimizer.init(params)
    if model == "mincut":
        args = (jnp.asarray(x_p),
                jnp.asarray(part.local_row.reshape(-1)),
                jnp.asarray(part.global_col.reshape(-1)),
                jnp.asarray(part.value.reshape(-1)),
                jnp.asarray(y_p), jnp.asarray(mask), jnp.asarray(mask))
    else:
        args = (jnp.asarray(x_p), jnp.asarray(y_p), jnp.asarray(mask))

    def _drain(loss):
        return np.asarray(loss[0] if isinstance(loss, tuple) else loss)

    with mesh:
        params, opt_state, loss = step(params, opt_state, *args)
        _ = _drain(loss)  # compile + drain
        t = time.time()
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, *args)
        _ = _drain(loss)
        elapsed = (time.time() - t) / steps
    num_edges = int((part.local_row < part.nodes_per_part).sum())
    return num_edges / elapsed, spec.halo_fraction


def _multiprocess_worker(port, pid, nproc, local_devices):
    """One 'host' of the multiprocess measurement: jax.distributed over a
    local CPU cluster, flat graph mesh spanning every process, halo GCN."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_citation_graph
    from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
    from tf_geometric_tpu.parallel import multihost
    from tf_geometric_tpu.parallel.halo import build_halo_spec
    from tf_geometric_tpu.parallel.partition import (apply_node_permutation,
                                                     partition_edges_by_row,
                                                     partition_order)
    from tf_geometric_tpu.parallel.sharded import make_graph_parallel_gcn_step
    from tf_geometric_tpu.sparse import SparseMatrix

    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    mesh = multihost.build_multihost_mesh(two_level=False)
    num_devices = len(jax.devices())

    graph = synthetic_citation_graph(
        num_nodes=int(os.environ.get("TFG_SCALING_NODES", 20_000)),
        num_features=int(os.environ.get("TFG_SCALING_FEATURES", 64)),
        num_classes=40,
        avg_degree=int(os.environ.get("TFG_SCALING_DEGREE", 8)), seed=0)
    perm = partition_order(graph.edge_index, graph.num_nodes, num_devices)
    graph, _ = apply_node_permutation(graph, perm)
    num_nodes = graph.num_nodes
    normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                       (num_nodes, num_nodes)))
    index, value = jax.device_get(normed.index), jax.device_get(normed.value)
    part = partition_edges_by_row(index, value, num_nodes, num_devices)
    spec = build_halo_spec(part)
    plan = multihost.distribute_halo_plan(mesh, "graph", spec)
    step, optimizer = make_graph_parallel_gcn_step(
        mesh, hidden=64, num_classes=40, halo_spec=plan)

    rng = np.random.default_rng(0)
    x_np = np.asarray(graph.x)
    n_pad = part.num_nodes_padded
    x_p = np.zeros((n_pad, x_np.shape[1]), np.float32); x_p[:num_nodes] = x_np
    y_p = np.zeros(n_pad, np.int32); y_p[:num_nodes] = np.asarray(graph.y)
    mask = np.zeros(n_pad, np.float32); mask[:num_nodes] = 1.0

    params = [
        (np.asarray(rng.normal(scale=0.1, size=(x_np.shape[1], 64)), np.float32),
         np.zeros(64, np.float32)),
        (np.asarray(rng.normal(scale=0.1, size=(64, 40)), np.float32),
         np.zeros(40, np.float32)),
    ]
    params = jax.tree.map(lambda a: multihost.distribute(mesh, P(), a), params,
                          is_leaf=lambda a: isinstance(a, np.ndarray))
    opt_state = jax.jit(optimizer.init)(params)
    x_d = multihost.distribute(mesh, P("graph", None), x_p)
    y_d = multihost.distribute(mesh, P("graph"), y_p)
    m_d = multihost.distribute(mesh, P("graph"), mask)

    steps = 10
    with mesh:
        params, opt_state, loss = step(params, opt_state, x_d, y_d, m_d)
        _ = np.asarray(jax.device_get(loss))
        t = time.time()
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, x_d, y_d, m_d)
        _ = np.asarray(jax.device_get(loss))
        elapsed = (time.time() - t) / steps
    num_edges = int((part.local_row < part.nodes_per_part).sum())
    if pid == 0:
        print("MP_RESULT " + json.dumps({
            "mode": "multiprocess", "num_processes": nproc,
            "devices": num_devices,
            "edges_per_sec": round(num_edges / elapsed, 1),
            "halo_fraction": round(spec.halo_fraction, 4)}), flush=True)


def _multiprocess_launch(nproc=2, local_devices=4):
    """--multiprocess entry: spawn a real N-process jax.distributed CPU
    cluster (one process per simulated host) and report GCN edges/s."""
    import socket
    import subprocess
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = (os.path.join(os.path.dirname(__file__), "..")
                         + os.pathsep + env.get("PYTHONPATH", ""))
    import tempfile
    # worker stdout goes to FILES, not pipes: a worker blocked on a full
    # 64KB pipe stops participating in the Gloo collectives and deadlocks
    # the whole cluster
    logs = [tempfile.NamedTemporaryFile("w+", suffix=f".mp{pid}.log",
                                        delete=False) for pid in range(nproc)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--mp-worker", str(port),
         str(pid), str(nproc), str(local_devices)],
        stdout=logs[pid], stderr=subprocess.STDOUT, env=env)
        for pid in range(nproc)]
    for p, log in zip(procs, logs):
        p.wait(timeout=1200)
        log.flush()
        log.seek(0)
        out = log.read()
        for line in out.splitlines():
            if line.startswith("MP_RESULT"):
                print(line[len("MP_RESULT "):])
        if p.returncode != 0:
            sys.stderr.write(out[-3000:])
            raise SystemExit(p.returncode)


def main():
    if "--mp-worker" in sys.argv:
        i = sys.argv.index("--mp-worker")
        _multiprocess_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                             int(sys.argv[i + 3]), int(sys.argv[i + 4]))
        return
    if "--multiprocess" in sys.argv:
        i = sys.argv.index("--multiprocess")
        nproc = (int(sys.argv[i + 1]) if len(sys.argv) > i + 1
                 and sys.argv[i + 1].isdigit() else 2)
        _multiprocess_launch(nproc)
        return
    if os.environ.get("TFG_SCALING_REAL") != "1":
        # default to the 8-device virtual CPU mesh: the JAX_PLATFORMS env
        # var alone is ignored when the harness pins another platform, and
        # running here on a single tunneled TPU both measures nothing useful
        # and collides with any other TPU client. Set TFG_SCALING_REAL=1 on
        # an actual pod slice.
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_citation_graph

    # gcn | gat | gat_full (fused two-layer 8-head + dropout) | mincut | sage
    model = os.environ.get("TFG_SCALING_MODEL", "gcn")
    graph = synthetic_citation_graph(
        num_nodes=int(os.environ.get("TFG_SCALING_NODES", 20_000)),
        num_features=int(os.environ.get("TFG_SCALING_FEATURES", 64)),
        num_classes=40,
        avg_degree=int(os.environ.get("TFG_SCALING_DEGREE", 8)), seed=0)
    max_devices = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16) if c <= max_devices]
    if os.environ.get("TFG_SCALING_COUNTS"):
        counts = [int(c) for c in os.environ["TFG_SCALING_COUNTS"].split(",")]
    results = {"model": model}
    base = None
    for c in counts:
        eps, halo_frac = measure(c, graph, model=model)
        if base is None:
            base = eps
        eff = eps / (base * c)
        results[c] = dict(edges_per_sec=round(eps, 1),
                          scaling_efficiency=round(eff, 4),
                          halo_fraction=round(halo_frac, 4))
        print(f"{c} devices: {eps/1e6:8.2f} M edges/s  "
              f"eff={eff:.2%}  halo={halo_frac:.2%}", flush=True)
    print(json.dumps(results))
    out_path = os.environ.get("TFG_SCALING_OUT")
    if out_path:
        with open(out_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(results) + "\n")


if __name__ == "__main__":
    main()
