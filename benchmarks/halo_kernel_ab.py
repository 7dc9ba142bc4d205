"""Single-chip A/B of the per-shard halo aggregation kernels (VERDICT r3 #2).

On a pod, each device of the graph axis runs ``halo_spmm_*`` over its own
edge shard. This benchmark isolates ONE device's shard (arxiv-scale graph,
partition-ordered, P=8 shards) and times the per-shard aggregation on the
real chip:

  * ``coo``: the r3 path — jnp.take + segment_sum over local + remote edges
    (parallel/halo.halo_spmm_split);
  * ``ell``: the packed production path — scatter-free ELL blocks
    (parallel/halo.halo_spmm_ell, layout="ell").

The halo exchange itself is not timed (single chip); the recv buffer is a
materialized array, exactly what the collective would deliver. fwd and
fwd+bwd (bwd = cotangents to both h_local and recv, as in training).

Run ALONE on the TPU (CLAUDE.md).
"""
import os
import sys

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
from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
from tf_geometric_tpu.parallel.halo import build_halo_spec
from tf_geometric_tpu.parallel.partition import (apply_node_permutation,
                                                 partition_edges_by_row,
                                                 partition_order)
from tf_geometric_tpu.sparse import SparseMatrix
from tf_geometric_tpu.utils.profiling import measure_step_time

N = int(os.environ.get("BENCH_NUM_NODES", 169_343))
E = int(os.environ.get("BENCH_NUM_EDGES", 1_166_243))
F = int(os.environ.get("BENCH_F", 128))
P = int(os.environ.get("BENCH_PARTS", 8))
DEV = int(os.environ.get("BENCH_SHARD", 0))


def main():
    graph = synthetic_ogbn_arxiv_like(num_nodes=N, num_edges=E)
    perm = partition_order(np.asarray(graph.edge_index), N, P)
    graph, _ = apply_node_permutation(graph, perm)
    normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                       (N, N)))
    part = partition_edges_by_row(np.asarray(jax.device_get(normed.index)),
                                  np.asarray(jax.device_get(normed.value)),
                                  N, P)
    spec_coo = build_halo_spec(part)
    spec_ell = build_halo_spec(part, layout="ell")
    npp = spec_coo.nodes_per_part
    R = spec_coo.num_parts * spec_coo.capacity
    shard_edges = int((part.local_row[DEV] < npp).sum())
    print(f"shard {DEV}/{P}: npp={npp} edges={shard_edges} "
          f"recv_rows={R} halo_fraction={spec_coo.halo_fraction:.3f}",
          flush=True)

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(npp, F)), jnp.float32)
    recv0 = jnp.asarray(rng.normal(size=(P, spec_coo.capacity, F)),
                        jnp.float32)
    c = jnp.asarray(rng.normal(size=(npp, F)), jnp.float32)

    coo_plan = tuple(jnp.asarray(a[DEV]) for a in
                     (spec_coo.loc_row, spec_coo.loc_col, spec_coo.loc_val,
                      spec_coo.rem_row, spec_coo.rem_addr, spec_coo.rem_val))
    ell_plan = tuple(jnp.asarray(a[DEV]) for a in
                     (tuple(spec_ell.local) + tuple(spec_ell.remote)))

    from tf_geometric_tpu.parallel.halo import halo_spmm_ell, halo_spmm_split

    def agg_coo(h, recv):
        return halo_spmm_split(h, recv, *coo_plan, npp)

    def agg_ell(h, recv):
        return halo_spmm_ell(h, recv, ell_plan)

    # correctness first
    np.testing.assert_allclose(np.asarray(agg_ell(h0, recv0)),
                               np.asarray(agg_coo(h0, recv0)),
                               rtol=1e-4, atol=1e-4)
    print("equivalence OK", flush=True)

    for label, agg in (("coo", agg_coo), ("ell", agg_ell)):
        @jax.jit
        def fwd(h):
            return (agg(h, recv0) * 1e-6 + h,)

        def loss(h, recv):
            return jnp.vdot(agg(h, recv), c)

        @jax.jit
        def fwd_bwd(h, recv):
            dh, drecv = jax.grad(loss, argnums=(0, 1))(h, recv)
            return (h - 1e-9 * dh, recv - 1e-9 * drecv)

        t1 = measure_step_time(lambda h: fwd(h), (h0,), lo=5, hi=25)
        t2 = measure_step_time(lambda h, r: fwd_bwd(h, r), (h0, recv0),
                               lo=4, hi=16)
        print(f"{label}: fwd {t1 * 1e3:.3f} ms "
              f"({shard_edges / t1 / 1e6:.1f}M e/s), "
              f"fwd+bwd {t2 * 1e3:.3f} ms "
              f"({shard_edges / t2 / 1e6:.1f}M e/s)", flush=True)


if __name__ == "__main__":
    main()
