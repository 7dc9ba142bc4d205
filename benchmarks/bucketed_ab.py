"""A/B: classic uniform-K EllAdj vs degree-BucketedEllAdj on the headline
GCN workload (bench.py graph, F=40 runtime SpMMs).

Measures the forward pass, the transpose (backward dh) pass, and the full
2-layer GCN training step with each layout.

Run alone on the TPU:  nohup python benchmarks/bucketed_ab.py > log &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_ogbn_arxiv_like
    from tf_geometric_tpu.nn.conv.gcn import (gcn_norm_adj,
                                              precompute_propagated_features)
    from tf_geometric_tpu.ops import config as kernel_config
    from tf_geometric_tpu.ops.ell import EllAdj, ell_spmm
    from tf_geometric_tpu.ops.ell_bucketed import BucketedEllAdj, bucketed_spmm
    from tf_geometric_tpu.sparse import SparseMatrix
    from tf_geometric_tpu.utils.profiling import measure_step_time

    kernel_config.set_ell_compute_dtype(jnp.bfloat16)

    NUM_CLASSES, HIDDEN = 40, 256
    graph = synthetic_ogbn_arxiv_like()
    n, num_features = graph.x.shape
    normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                       (n, n)))
    index = np.asarray(jax.device_get(normed.index))
    value = np.asarray(jax.device_get(normed.value))
    num_edges = index.shape[1]

    classic = EllAdj.from_coo(index, value, (n, n), split_diag=True)
    bucketed = BucketedEllAdj.from_coo(index, value, (n, n), split_diag=True)
    print("classic:", repr(classic), flush=True)
    print("bucketed:", repr(bucketed), flush=True)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, NUM_CLASSES)).astype(np.float32))

    def probe(name, adj, spmm):
        fn = jax.jit(lambda l: (spmm(adj, l),))
        _ = np.asarray(fn(x0)[0].reshape(-1)[:1])
        t_f = measure_step_time(fn, (x0,))

        def t_pass(ct):
            g = jax.grad(lambda hh: jnp.sum(spmm(adj, hh) * ct))(x0)
            return (g,)
        jt = jax.jit(t_pass)
        _ = np.asarray(jt(x0)[0].reshape(-1)[:1])
        t_b = measure_step_time(jt, (x0,))
        print(f"{name:>9} fwd: {t_f*1e3:6.2f} ms   transpose: {t_b*1e3:6.2f} ms",
              flush=True)

    probe("classic", classic, lambda a, l: ell_spmm(a, l))
    probe("bucketed", bucketed, lambda a, l: bucketed_spmm(a, l))

    # full training step with each layout
    x = jnp.asarray(graph.x)
    y = jnp.asarray(graph.y)
    cache = {}
    px = precompute_propagated_features(
        x, SparseMatrix(graph.edge_index, graph.edge_weight, (n, n)),
        cache=cache)
    w0 = jnp.asarray(rng.normal(scale=0.05, size=(num_features, HIDDEN)),
                     jnp.float32)
    w1 = jnp.asarray(rng.normal(scale=0.05, size=(HIDDEN, NUM_CLASSES)),
                     jnp.float32)
    optimizer = optax.adam(1e-2)

    for name, adj in (("classic", classic), ("bucketed", bucketed)):
        params = {"w0": w0, "b0": jnp.zeros(HIDDEN), "w1": w1,
                  "b1": jnp.zeros(NUM_CLASSES)}
        opt_state = optimizer.init(params)

        def loss_fn(p):
            h = jax.nn.relu((px.astype(jnp.bfloat16)
                             @ p["w0"].astype(jnp.bfloat16)).astype(jnp.float32)
                            + p["b0"])
            logits = adj.matmul(h @ p["w1"]) + p["b1"]
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        @jax.jit
        def step(p, s):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s

        p, s = step(params, opt_state)
        _ = np.asarray(jax.tree.leaves(p)[0].reshape(-1)[:1])
        t = measure_step_time(step, (p, s))
        print(f"{name:>9} full step: {t*1e3:6.2f} ms   "
              f"{num_edges/t/1e6:6.1f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
