"""A/B: tiled one-hot MXU SpMM vs the production ELL path (cost-model §0c).

Two arxiv-scale graphs:
  * ``random``   — the bench graph (synthetic_ogbn_arxiv_like): NO community
                   structure, the ordering cannot create dense tiles;
  * ``community``— same N/E with 1024 planted communities (intra-community
                   probability ~0.85), nodes block-ordered — the best case a
                   METIS-quality ordering (partition_order) can deliver.

For each: tile occupancy at t∈{128, 256}, then measured fwd and fwd+bwd
step times of the ELL production path vs the tiled formulation at F=128.
Decision rule printed at the end; docs/performance.md §0c records the
verdict. Run alone on the TPU (CLAUDE.md: one TPU client at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
if os.environ.get("BENCH_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass
import jax.numpy as jnp

from tf_geometric_tpu.datasets.synthetic_citation import synthetic_ogbn_arxiv_like
from tf_geometric_tpu.nn.conv.gcn import (compute_cache_key, gcn_norm_adj,
                                          maybe_compile_ell)
from tf_geometric_tpu.ops.tiled_spmm import build_tiled_spmm, tiled_spmm
from tf_geometric_tpu.sparse import SparseMatrix
from tf_geometric_tpu.utils.profiling import measure_step_time

N = int(os.environ.get("BENCH_NUM_NODES", 169_343))
E = int(os.environ.get("BENCH_NUM_EDGES", 1_166_243))
F = int(os.environ.get("BENCH_F", 128))
TILE = int(os.environ.get("BENCH_TILE", 128))
INTRA = float(os.environ.get("BENCH_INTRA", 0.95))


def community_graph(seed=0, intra=INTRA, size=TILE):
    """MOST-FAVORABLE planted structure for the tiled formulation: contiguous
    communities of exactly the tile size (every intra edge lands in a
    diagonal tile) and ``intra`` of edges staying in-community. If tiled
    can't win here, no realizable ordering saves it."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, size=E)
    blk = src // size
    local = rng.integers(0, size, size=E)
    intra_dst = np.minimum(blk * size + local, N - 1)
    dst = np.where(rng.random(E) < intra, intra_dst, rng.integers(0, N, size=E))
    return np.stack([dst, src]).astype(np.int32)


def time_paths(name, edge_index):
    num_nodes = N
    cache = {}
    normed = gcn_norm_adj(SparseMatrix(edge_index,
                                       np.ones(edge_index.shape[1], np.float32),
                                       (num_nodes, num_nodes)), cache=cache)
    adj = maybe_compile_ell(normed, cache,
                            compute_cache_key("both", True, True, True, False))
    idx = np.asarray(jax.device_get(normed.index))
    val = np.asarray(jax.device_get(normed.value))

    # occupancy stats WITHOUT materializing tiles (a random graph at t=128
    # would allocate ~40 GB of stat-only zeros)
    rows_h, cols_h = idx[0], idx[1]
    results = {}
    for t in (128, 256):
        n_tiles = -(-num_nodes // t)
        pair = (rows_h // t).astype(np.int64) * (n_tiles + 1) + cols_h // t
        B = len(np.unique(pair))
        results[f"occupancy_t{t}"] = round(len(rows_h) / (B * t * t), 5)
        results[f"B_t{t}"] = B
        results[f"tile_GB_t{t}"] = round((B * t * t * 2 + B * t * F * 4) / 1e9,
                                         2)
    print(f"[{name}] " + " ".join(f"{k}={v}" for k, v in results.items()),
          flush=True)

    t_sel = TILE
    # memory guard: the materialized tiles (fwd + transpose) must fit —
    # a random graph at arxiv scale would need ~57 GB at t=256, which is
    # itself the rejection evidence (occupancy above tells the story)
    est = 2 * results[f"B_t{t_sel}"] * t_sel * t_sel * 2
    budget = float(os.environ.get("BENCH_TILE_BUDGET_GB", 6)) * 1e9
    if est > budget:
        print(f"[{name}] SKIP timing: tile matrices would need "
              f"{est / 1e9:.1f} GB (> {budget / 1e9:.0f} GB budget) — "
              f"occupancy {results[f'occupancy_t{t_sel}']} decides",
              flush=True)
        return None
    ts = build_tiled_spmm(idx, val, (num_nodes, num_nodes), tile=t_sel,
                          dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    h0 = jnp.asarray(rng.normal(size=(num_nodes, F)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(num_nodes, F)), jnp.float32)

    # hybrid split (the measured production mode, utils/jax_utils): the GB-
    # scale tile matrices ride as jit ARGUMENTS (constants 413 the remote
    # compile past ~100 MB), the small int32 tile-id arrays stay constants
    a_arg, ta_arg = ts.a_tiles, ts.t_a_tiles
    ts_holder = ts._replace(a_tiles=None, t_a_tiles=None)

    @jax.jit
    def ell_fwd(h):
        return (adj.matmul(h) * 1e-6 + h,)

    @jax.jit
    def tiled_fwd(h, a, ta):
        ts2 = ts_holder._replace(a_tiles=a, t_a_tiles=ta)
        return (tiled_spmm(ts2, h) * 1e-6 + h, a, ta)

    def loss_ell(h):
        return jnp.vdot(adj.matmul(h), c)

    @jax.jit
    def ell_fb(h):
        return (h - 1e-9 * jax.grad(loss_ell)(h),)

    @jax.jit
    def tiled_fb(h, a, ta):
        def loss(hh):
            ts2 = ts_holder._replace(a_tiles=a, t_a_tiles=ta)
            return jnp.vdot(tiled_spmm(ts2, hh), c)
        return (h - 1e-9 * jax.grad(loss)(h), a, ta)

    out = {}
    for label, fn, args in (
            ("ell_fwd", ell_fwd, (h0,)),
            ("tiled_fwd", tiled_fwd, (h0, a_arg, ta_arg)),
            ("ell_fwd_bwd", ell_fb, (h0,)),
            ("tiled_fwd_bwd", tiled_fb, (h0, a_arg, ta_arg))):
        dt = measure_step_time(lambda *a: fn(*a), args, lo=4, hi=16)
        out[label] = dt
        print(f"[{name}] {label}: {dt * 1e3:.2f} ms "
              f"({E / dt / 1e6:.1f}M edges/s)", flush=True)
    return out


def main():
    random_graph = synthetic_ogbn_arxiv_like(num_nodes=N, num_edges=E)
    graphs = [("random", np.asarray(random_graph.edge_index)),
              ("community", community_graph())]
    verdicts = {}
    for name, ei in graphs:
        verdicts[name] = time_paths(name, ei)
    for name, o in verdicts.items():
        if o is None:
            print(f"VERDICT {name}: tiles don't fit memory — ELL wins by "
                  f"default (occupancy too low)")
            continue
        speedup = o["ell_fwd_bwd"] / o["tiled_fwd_bwd"]
        print(f"VERDICT {name}: tiled/ELL fwd+bwd speedup {speedup:.2f}x "
              f"({'tiled wins' if speedup > 1 else 'ELL wins'})")


if __name__ == "__main__":
    main()
