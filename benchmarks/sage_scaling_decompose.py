"""Decompose the sampled-SAGE virtual-mesh scaling collapse (VERDICT r2 #6).

SCALING.md shows sampled-SAGE total throughput FALLING 2.1x from P=1 to 8
on the 8-virtual-device CPU mesh while GCN/GAT/MinCut stay flat. Hypothesis:
the per-layer all_gather of the projected feature table moves O(N·H) bytes
per device REGARDLESS of P (the minimal exchange for uniform neighbor
sampling when k >= P — see parallel/sampled_sage.py docstring), so on a
shared-core virtual mesh its TOTAL copy work grows ∝P while every other
phase's total stays constant.

Method: time, at each P, (a) the full step, and (b) an ablated step whose
all_gather is replaced by reading a PRE-GATHERED global table passed in as
a replicated argument (identical math, zero collective). If t_ablated is
flat in P while t_full - t_ablated grows ∝P, the collapse is the collective
emulation artifact, not duplicated sampling/RNG work.

Run:  python benchmarks/sage_scaling_decompose.py   (8 virtual CPU devices)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_citation_graph
    from tf_geometric_tpu.nn.sampling.device_sampler import draw_fixed_k
    from tf_geometric_tpu.parallel import build_csr_shards, make_sampled_sage_step
    from tf_geometric_tpu.parallel.sharded import build_mesh

    N = int(os.environ.get("TFG_SCALING_NODES", 20_000))
    F = int(os.environ.get("TFG_SCALING_FEATURES", 64))
    K = (25, 10)
    HIDDEN = 128
    graph = synthetic_citation_graph(num_nodes=N, num_features=F,
                                     num_classes=40, avg_degree=8, seed=0)
    steps = 10
    results = {}
    for p_dev in (1, 2, 4, 8):
        n_pad = -(-N // (128 * p_dev)) * (128 * p_dev)
        x_np = np.zeros((n_pad, F), np.float32)
        x_np[:N] = np.asarray(graph.x)
        y_np = np.zeros(n_pad, np.int32)
        y_np[:N] = np.asarray(graph.y)
        mask = np.zeros(n_pad, np.float32)
        mask[:N] = 1.0
        shards = build_csr_shards(np.asarray(graph.edge_index), n_pad, p_dev)
        mesh = build_mesh({"graph": p_dev})
        step, init_params, optimizer = make_sampled_sage_step(
            mesh, shards, num_features=F, num_classes=40, k=K, hidden=HIDDEN)
        params = init_params(np.random.default_rng(0))
        opt_state = optimizer.init(params)

        def timeit(fn, args):
            out = fn(*args)
            _ = np.asarray(out[2] if isinstance(out, tuple) else out)
            t = time.time()
            for i in range(steps):
                out = fn(*args)
            _ = np.asarray(out[2] if isinstance(out, tuple) else out)
            return (time.time() - t) / steps

        with mesh:
            t_full = timeit(step, (params, opt_state, jax.random.PRNGKey(0),
                                   jnp.asarray(x_np), jnp.asarray(y_np),
                                   jnp.asarray(mask)))

        # ---- ablated step: identical math, all_gather removed -------------
        n_local = n_pad // p_dev
        names = sorted(shards.keys())

        def ablated_local(params, opt_state, key, x_local, y_local, mask_local,
                          hw1_global, hw2_global, *csr_flat):
            csr = {n: a[0] for n, a in zip(names, csr_flat)}
            dev = jax.lax.axis_index("graph")
            key = jax.random.fold_in(key, dev)
            block0 = dev.astype(jnp.int32) * n_local
            self_ids = block0 + jnp.arange(n_local, dtype=jnp.int32)

            def layer(h_local, lkey, k, p_l, table):
                idx, weight = draw_fixed_k(lkey, csr, k, self_ids=self_ids)
                # keep the real step's neighbor projection (and its kernel
                # gradient) in the ablated program so t_full - t_ablated
                # isolates ONLY the collective + table-gradient path
                proj = h_local @ p_l["nb"]
                acc = jnp.zeros((n_local, table.shape[1]), table.dtype)
                for j in range(k):
                    col_j = jnp.clip(idx[j], 0, table.shape[0] - 1)
                    acc = acc + jnp.take(table, col_j, axis=0) * weight[j][:, None]
                acc = acc + jnp.sum(proj) * 1e-20
                h = jnp.concatenate([h_local @ p_l["self"], acc / k], axis=1) \
                    + p_l["bias"]
                return jax.nn.relu(h)

            def loss_fn(p):
                h = layer(x_local, jax.random.fold_in(key, 0), K[0], p[0],
                          hw1_global)
                h = layer(h, jax.random.fold_in(key, 1), K[1], p[1],
                          hw2_global)
                logits = h @ p[-1]["w"] + p[-1]["b"]
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.clip(y_local, 0, None))
                total = jax.lax.psum(jnp.sum(ce * mask_local), "graph")
                count = jax.lax.psum(jnp.sum(mask_local), "graph")
                return total / jnp.maximum(count, 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.tree.map(lambda g: jax.lax.psum(g, "graph"), grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        csr_args = tuple(shards[n] for n in names)
        ablated = jax.jit(shard_map(
            ablated_local, mesh=mesh,
            in_specs=(P(), P(), P(), P("graph", None), P("graph"), P("graph"),
                      P(), P()) + (P("graph", None),) * len(names),
            out_specs=(P(), P(), P())))
        hw1 = jnp.asarray(x_np) @ params[0]["nb"]
        hw2 = jnp.zeros((n_pad, params[1]["nb"].shape[1]), jnp.float32)
        with mesh:
            t_ablated = timeit(ablated, (params, opt_state,
                                         jax.random.PRNGKey(0),
                                         jnp.asarray(x_np), jnp.asarray(y_np),
                                         jnp.asarray(mask), hw1, hw2)
                               + csr_args)

        # ---- the step's collectives alone (fwd all_gathers + their AD
        # transpose reduce-scatter shape) -----------------------------------
        def gathers_only(x_local):
            g1 = jax.lax.all_gather(x_local @ params[0]["nb"], "graph",
                                    tiled=True)
            h2 = jnp.zeros((n_local, params[1]["nb"].shape[0]), jnp.float32) \
                + g1[:n_local, :1]
            g2 = jax.lax.all_gather(h2 @ params[1]["nb"], "graph", tiled=True)
            back = jax.lax.psum_scatter(g2, "graph", tiled=True) \
                + jax.lax.psum_scatter(g1, "graph", tiled=True)[:, :g2.shape[1]]
            return x_local + jnp.sum(back) * 1e-20

        gathers = jax.jit(shard_map(gathers_only, mesh=mesh,
                                    in_specs=(P("graph", None),),
                                    out_specs=P("graph", None)))
        with mesh:
            t_coll = timeit(gathers, (jnp.asarray(x_np),))

        edges = N * sum(K)
        results[p_dev] = {
            "t_full_ms": round(t_full * 1e3, 1),
            "t_ablated_ms": round(t_ablated * 1e3, 1),
            "t_collectives_alone_ms": round(t_coll * 1e3, 1),
            "full_Meps": round(edges / t_full / 1e6, 2),
            "ablated_Meps": round(edges / t_ablated / 1e6, 2),
        }
        print(p_dev, results[p_dev], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
