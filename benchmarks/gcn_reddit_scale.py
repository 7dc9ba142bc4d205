"""Full-batch GCN training step at Reddit scale (N=233k, E=23M — 20× the
headline's edge count): validates the bucketed layout + row-splitting on a
hub-heavy graph an order of magnitude past arxiv, and reports edges/s.

Same protocol as bench.py (constants-closure jit, chained-slope timing,
propagated-feature precompute, bf16 policies).

Run alone on the TPU:  nohup python benchmarks/gcn_reddit_scale.py > log &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_NODES = 232_965
N_EDGES = 23_000_000
N_FEATURES = 602
N_CLASSES = 41
HIDDEN = 128


def main():
    import jax
    try:
        # REDDIT_CACHE_DIR overrides the persistent cache location — point
        # it at an empty dir to measure a genuinely COLD compile without
        # disturbing the warm production cache
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("REDDIT_CACHE_DIR",
                                         "/root/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from tf_geometric_tpu.datasets.synthetic_citation import \
        synthetic_ogbn_arxiv_like
    from tf_geometric_tpu.nn.conv.gcn import (compute_cache_key, gcn_norm_adj,
                                              maybe_compile_ell,
                                              precompute_propagated_features)
    from tf_geometric_tpu.ops import config as kernel_config
    from tf_geometric_tpu.sparse import SparseMatrix

    kernel_config.set_ell_compute_dtype(jnp.bfloat16)
    if os.environ.get("REDDIT_ELL_LAYOUT"):
        # cold-start lever: "uniform" (classic fori_loop ELL) keeps the HLO
        # O(1) in slot count — the bucketed layout's unrolled slot loops
        # dominate cold compile time at this scale (see benchmarks/README.md
        # Reddit section)
        kernel_config.set_ell_layout(os.environ["REDDIT_ELL_LAYOUT"])

    t0 = time.time()
    graph = synthetic_ogbn_arxiv_like(num_nodes=N_NODES, num_edges=N_EDGES,
                                      num_features=N_FEATURES,
                                      num_classes=N_CLASSES)
    print(f"generate: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    cache = {}
    normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                       (N_NODES, N_NODES)), cache=cache)
    num_edges_normed = int(normed.index.shape[1])
    adj = maybe_compile_ell(normed, cache,
                            compute_cache_key("both", True, True, True, False))
    print(f"normalize+pack: {time.time()-t0:.1f}s  layout: {adj!r}",
          flush=True)

    x = jnp.asarray(graph.x)
    y = jnp.asarray(graph.y)
    t0 = time.time()
    px = precompute_propagated_features(
        x, SparseMatrix(graph.edge_index, graph.edge_weight,
                        (N_NODES, N_NODES)), cache=cache)
    _ = np.asarray(px[:1])
    print(f"propagate precompute: {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    params = {
        "w0": jnp.asarray(rng.normal(scale=0.05, size=(N_FEATURES, HIDDEN)),
                          jnp.float32),
        "b0": jnp.zeros(HIDDEN),
        "w1": jnp.asarray(rng.normal(scale=0.05, size=(HIDDEN, N_CLASSES)),
                          jnp.float32),
        "b1": jnp.zeros(N_CLASSES),
    }
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    # At this scale the FULL packed layout cannot ride as inlined jit
    # constants: the literal-embedding HLO is ~600MB and the remote compile
    # service rejects it (HTTP 413). Default mode is HYBRID — int32 index
    # arrays stay constants (where the measured constants advantage lives:
    # constant-specialization/fusion, benchmarks/README.md) while float
    # value arrays + activations ride as arguments, shrinking the literal
    # payload ~3×. REDDIT_MODE=args restores the all-arguments fallback.
    def loss_fn(p, adj_, px_, y_):
        h = jax.nn.relu((px_.astype(jnp.bfloat16)
                         @ p["w0"].astype(jnp.bfloat16)).astype(jnp.float32)
                        + p["b0"])
        logits = adj_.matmul(h @ p["w1"]) + p["b1"]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y_).mean()

    if os.environ.get("REDDIT_MODE") == "args":
        @jax.jit
        def train_step_impl(p, s, adj_, px_, y_):
            loss, grads = jax.value_and_grad(loss_fn)(p, adj_, px_, y_)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        def train_step(p, s):
            return train_step_impl(p, s, adj, px, y)
    else:  # hybrid (default)
        import jax.tree_util as jtu
        from tf_geometric_tpu.utils.jax_utils import split_hybrid_constants
        val_leaves, rebuild_adj = split_hybrid_constants(adj)
        const_bytes = sum(l.size * l.dtype.itemsize
                          for l in jtu.tree_leaves(adj)
                          if not jnp.issubdtype(l.dtype, jnp.floating))
        print(f"hybrid mode: {const_bytes/1e6:.0f}MB index constants, "
              f"{sum(l.size*l.dtype.itemsize for l in val_leaves)/1e6:.0f}MB "
              "value arguments", flush=True)

        @jax.jit
        def train_step_hybrid(p, s, vals, px_, y_):
            adj_ = rebuild_adj(vals)
            loss, grads = jax.value_and_grad(loss_fn)(p, adj_, px_, y_)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        def train_step(p, s):
            return train_step_hybrid(p, s, val_leaves, px, y)

    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state)
    _ = np.asarray(loss)
    print(f"compile+first step: {time.time()-t0:.1f}s  loss={float(loss):.4f}",
          flush=True)

    def run(iters, p, s):
        t = time.time()
        for _ in range(iters):
            p, s, l = train_step(p, s)
        _ = np.asarray(l)
        return time.time() - t, p, s

    _, params, opt_state = run(2, params, opt_state)
    t_los, t_his = [], []
    for _ in range(3):
        t_lo, params, opt_state = run(3, params, opt_state)
        t_hi, params, opt_state = run(9, params, opt_state)
        t_los.append(t_lo)
        t_his.append(t_hi)
    step_time = (min(t_his) - min(t_los)) / 6
    print(json.dumps({
        "metric": "gcn_reddit_scale_fwd_bwd_edges_per_sec_per_chip",
        "value": round(num_edges_normed / step_time, 1),
        "unit": "edges/s",
        "step_ms": round(step_time * 1e3, 2),
        "edges": num_edges_normed,
    }), flush=True)


if __name__ == "__main__":
    main()
