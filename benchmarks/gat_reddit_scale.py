"""Fused bucketed GAT attention at Reddit scale (N=233k, E=23M) — the
large-graph counterpart of benchmarks/gcn_reddit_scale.py for the SDDMM +
segment-softmax + SpMM triple (reference nn/conv/gat.py:73-89 at
datasets/reddit.py scale).

Differences from the GCN Reddit path, by construction:

* NO row-splitting of hub rows. The GCN kernel row-splits deg>256 hubs
  into virtual rows because segment-SUM distributes over the split; the
  attention softmax does NOT — each destination's softmax normalizer
  spans ALL its incoming edges, so virtual rows would need a second
  normalization pass merging per-virtual-row (max, sum-exp) pairs.
  Instead hubs overflow the bucketed caps (max 256) into the sorted
  tail, whose segment-softmax handles arbitrary degrees correctly
  (~6x slot cost per tail edge — measured on v5e, docs/performance.md).
* Layout rides as jit ARGUMENTS, not constants. The GCN hybrid trick
  (int32 indices as constants, float values as arguments) cannot help
  here: the attention layout is ALL int32 index arrays (values are
  computed on the fly), so constants-mode would put the entire ~0.5GB
  payload in the HLO literal pool and hit the remote-compile 413 limit
  with nothing left to offload.

Timing protocol: chained-slope fit as bench.py (block_until_ready is a
no-op on axon). Set GAT_REDDIT_EDGES / GAT_REDDIT_WAIT_GO env vars for a
reduced-scale ladder / to hold the timing loop until /tmp/gat_reddit_go
exists (so a concurrent CPU job queue can be SIGSTOPped first — host
contention skews tunnel timing up to 2x).

Run alone on the TPU:  python benchmarks/gat_reddit_scale.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_NODES = 232_965
N_EDGES = int(os.environ.get("GAT_REDDIT_EDGES", 23_000_000))
N_FEATURES = 602
# GAT_REDDIT_UNITS: 256 (the arxiv headline config, 8 heads x 32) needs
# 52.03GB HBM at 23M edges -- the 2.24M-edge hub tail materializes
# [T, 256] K/V gathers on both passes (measured OOM, see
# benchmarks/README.md). 64 (the reference's own demo GAT shape,
# demo/demo_gat.py:14 -- 8 heads x 8) fits.
HEADS, UNITS, CLASSES = 8, int(os.environ.get("GAT_REDDIT_UNITS", 64)), 41


def main():
    import jax
    try:
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
    from tf_geometric_tpu.nn.conv.gat import _gat_edge_cache, gat
    from tf_geometric_tpu.ops import config as kernel_config

    if os.environ.get("GAT_REDDIT_DTYPE", "fp32") == "bf16":
        kernel_config.set_ell_compute_dtype(jnp.bfloat16)

    t0 = time.time()
    graph = synthetic_ogbn_arxiv_like(num_nodes=N_NODES, num_edges=N_EDGES,
                                      num_features=N_FEATURES,
                                      num_classes=CLASSES)
    print(f"generate: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    cache = {}
    sorted_ei, _, layout = _gat_edge_cache(jnp.asarray(graph.edge_index),
                                           N_NODES, cache)
    num_edges_looped = int(sorted_ei.shape[1])
    print(f"layout build: {time.time()-t0:.1f}s  {layout!r}", flush=True)

    x = jnp.asarray(graph.x)
    y = jnp.asarray(graph.y)
    rng = np.random.default_rng(0)
    params = {
        "wq": jnp.asarray(rng.normal(scale=0.05, size=(N_FEATURES, UNITS)),
                          jnp.float32),
        "bq": jnp.zeros(UNITS),
        "wk": jnp.asarray(rng.normal(scale=0.05, size=(N_FEATURES, UNITS)),
                          jnp.float32),
        "bk": jnp.zeros(UNITS),
        "wv": jnp.asarray(rng.normal(scale=0.05, size=(N_FEATURES, UNITS)),
                          jnp.float32),
        "wd": jnp.asarray(rng.normal(scale=0.05, size=(UNITS, CLASSES)),
                          jnp.float32),
        "bd": jnp.zeros(CLASSES),
    }
    optimizer = optax.adam(1e-3)

    # x (233k x 602 fp32 = 561MB) and y must ride as jit ARGUMENTS as
    # well: closed-over device arrays inline as HLO literals, and the first
    # attempt 413'd the remote compile service on x alone
    def loss_fn(p, layout_, sorted_ei_, x_, y_):
        h = gat(x_, None, p["wq"], p["bq"], jax.nn.relu,
                p["wk"], p["bk"], jax.nn.relu, p["wv"],
                num_heads=HEADS, num_nodes=N_NODES,
                ell_layout=layout_, sorted_edge_index=sorted_ei_)
        logits = h @ p["wd"] + p["bd"]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y_).mean()

    @jax.jit
    def step_impl(p, s, layout_, sorted_ei_, x_, y_):
        loss, grads = jax.value_and_grad(loss_fn)(p, layout_, sorted_ei_,
                                                  x_, y_)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def train_step(p, s):
        return step_impl(p, s, layout, sorted_ei, x, y)

    opt_state = optimizer.init(params)
    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state)
    _ = np.asarray(loss)
    compile_s = time.time() - t0
    print(f"compile+first step: {compile_s:.1f}s  loss={float(loss):.4f}",
          flush=True)

    if os.environ.get("GAT_REDDIT_WAIT_GO") == "1":
        print("waiting for /tmp/gat_reddit_go (quiesce CPU jobs now)",
              flush=True)
        while not os.path.exists("/tmp/gat_reddit_go"):
            time.sleep(10)

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
        "metric": "gat_reddit_scale_fwd_bwd_edges_per_sec_per_chip",
        "value": round(num_edges_looped / step_time, 1),
        "unit": "edges/s",
        "step_ms": round(step_time * 1e3, 2),
        "edges": num_edges_looped,
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
