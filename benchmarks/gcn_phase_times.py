"""Phase budget of the headline GCN training step (bench.py workload).

Times each phase of the 2-layer GCN step in isolation (chained-dependency
slope fits, constants-closure jits — same protocol as bench.py) and compares
the sum to the measured full step, to locate any non-SpMM slack:

    spmm_f40      forward SpMM of the output layer (ELL, F=num_classes)
    spmm_T_f40    its transpose pass (the backward dh SpMM)
    encoder       px @ W0 (+relu) in bf16 — forward MXU work
    encoder_bwd   the two encoder backward matmuls (dW0, masked dh)
    head_mm       h @ W1 forward + its two backward matmuls
    ce            softmax CE + its gradient at [N, classes]
    adam          optimizer update on the 4-tensor param pytree

Run alone on the TPU:  nohup python benchmarks/gcn_phase_times.py > log &
"""
import json
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
    from tf_geometric_tpu.nn.conv.gcn import (compute_cache_key, gcn_norm_adj,
                                              maybe_compile_ell,
                                              precompute_propagated_features)
    from tf_geometric_tpu.ops import config as kernel_config
    from tf_geometric_tpu.sparse import SparseMatrix
    from tf_geometric_tpu.utils.profiling import measure_step_time

    kernel_config.set_ell_compute_dtype(jnp.bfloat16)

    NUM_CLASSES, HIDDEN = 40, 256
    graph = synthetic_ogbn_arxiv_like()
    num_nodes, num_features = graph.x.shape
    cache = {}
    normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                       (num_nodes, num_nodes)), cache=cache)
    adj = maybe_compile_ell(normed, cache,
                            compute_cache_key("both", True, True, True, False))
    num_edges = int(normed.index.shape[1])
    x = jnp.asarray(graph.x)
    y = jnp.asarray(graph.y)
    px = precompute_propagated_features(
        x, SparseMatrix(graph.edge_index, graph.edge_weight,
                        (num_nodes, num_nodes)), cache=cache)

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.normal(scale=0.05, size=(num_features, HIDDEN)),
                     jnp.float32)
    w1 = jnp.asarray(rng.normal(scale=0.05, size=(HIDDEN, NUM_CLASSES)),
                     jnp.float32)
    h = jnp.asarray(rng.normal(size=(num_nodes, HIDDEN)), jnp.float32)
    logits0 = jnp.asarray(rng.normal(size=(num_nodes, NUM_CLASSES)), jnp.float32)

    times = {}

    def chain(name, fn, *args):
        jf = jax.jit(fn)
        out = jf(*args)  # compile
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        times[name] = measure_step_time(jf, args)
        print(f"{name:>14}: {times[name]*1e3:7.2f} ms", flush=True)

    # SpMM fwd at F=NUM_CLASSES (the runtime width post-precompute):
    # l -> adj @ l keeps a dependency chain (adj may be EllAdj or
    # BucketedEllAdj — both expose @)
    print("layout:", repr(adj), flush=True)
    chain("spmm_f40", lambda l: (adj @ l,), logits0)

    # transpose pass: d/dh of sum(adj@h * ct) = adj^T @ ct — chain on ct
    def t_pass(ct):
        g = jax.grad(lambda hh: jnp.sum((adj @ hh) * ct))(logits0)
        return (g,)
    chain("spmm_T_f40", t_pass, logits0)

    # encoder fwd: relu((px@w0) bf16). The chain dependency must consume the
    # FULL output — slicing before reduction lets XLA compute one row only
    # (a sum reduction forces the whole matmul)
    def enc(w):
        o = jax.nn.relu((px.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16))
                        .astype(jnp.float32))
        return (w + o.sum() * 1e-30,)
    chain("encoder", enc, w0)

    # encoder bwd: dW0 = px^T @ dh (bf16) ; relu mask apply
    def enc_bwd(w):
        g = jax.grad(lambda ww: jnp.sum(jax.nn.relu(
            (px.astype(jnp.bfloat16) @ ww.astype(jnp.bfloat16))
            .astype(jnp.float32)) * h))(w)
        return (w - 0.0 * g,)
    chain("encoder_bwd", enc_bwd, w0)

    # head matmuls: h@w1 fwd + both backward matmuls
    def head(w):
        g = jax.grad(lambda ww: jnp.sum((h @ ww) * logits0))(w)
        return (w - 0.0 * g,)
    chain("head_mm", head, w1)

    # CE + grad at [N, classes]
    def ce(l):
        g = jax.grad(lambda ll: optax.softmax_cross_entropy_with_integer_labels(
            ll, y).mean())(l)
        return (l - 0.0 * g,)
    chain("ce", ce, logits0)

    # Adam on the param pytree
    params = {"w0": w0, "b0": jnp.zeros(HIDDEN), "w1": w1,
              "b1": jnp.zeros(NUM_CLASSES)}
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    def adam_step(p, s):
        grads = jax.tree.map(lambda a: a * 1e-4, p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s
    chain("adam", adam_step, params, opt_state)

    # full step (identical to bench.py's constants variant)
    def loss_fn(p):
        hh = jax.nn.relu((px.astype(jnp.bfloat16)
                          @ p["w0"].astype(jnp.bfloat16)).astype(jnp.float32)
                         + p["b0"])
        logits = adj.matmul(hh @ p["w1"]) + p["b1"]
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    def full_step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s
    chain("full_step", full_step, params, opt_state)

    phase_sum = sum(v for k, v in times.items() if k != "full_step")
    print(json.dumps({
        "phases_ms": {k: round(v * 1e3, 2) for k, v in times.items()},
        "phase_sum_ms": round(phase_sum * 1e3, 2),
        "slack_ms": round((times["full_step"] - phase_sum) * 1e3, 2),
        "edges_per_sec_full": round(num_edges / times["full_step"], 1),
    }))


if __name__ == "__main__":
    main()
