"""Sweep the ELL slot count K for the FORWARD SpMM pass on the headline
graph (bench.py workload, F=num_classes=40 post-precompute).

Motivation (gcn_phase_times.py): the forward pass measured 6.55 ms vs the
transpose's 4.10 ms — the in-degree side is heavy-tailed (24.5% of edges in
the sorted-segment tail vs 8.6% on the out-degree side). A larger K trades
dense slot gathers (invalid slots gather a clipped index) for tail rows on
the ~2× slower sorted-segment path. This measures where the trade lands.

Run alone on the TPU:  nohup python benchmarks/ell_k_sweep.py > log &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_ogbn_arxiv_like
    from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj
    from tf_geometric_tpu.ops import config as kernel_config
    from tf_geometric_tpu.ops.ell import EllAdj, ell_spmm
    from tf_geometric_tpu.sparse import SparseMatrix
    from tf_geometric_tpu.utils.profiling import measure_step_time

    kernel_config.set_ell_compute_dtype(jnp.bfloat16)

    graph = synthetic_ogbn_arxiv_like()
    n = graph.x.shape[0]
    normed = gcn_norm_adj(SparseMatrix(graph.edge_index, graph.edge_weight,
                                       (n, n)))
    index = np.asarray(jax.device_get(normed.index))
    value = np.asarray(jax.device_get(normed.value))
    num_edges = index.shape[1]

    rng = np.random.default_rng(0)
    for F in (40, 128):
        x0 = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
        for k in (8, 12, 16, 24, 32):
            adj = EllAdj.from_coo(index, value, (n, n), k=k, split_diag=True)
            tail = int(adj.tail_row.shape[0])
            fn = jax.jit(lambda l, a=adj: (ell_spmm(a, l),))
            out = fn(x0)
            _ = np.asarray(out[0].reshape(-1)[:1])
            t = measure_step_time(fn, (x0,))
            print(f"F={F:4d} K={k:3d} tail={tail:7d} "
                  f"({tail / num_edges:5.1%}): {t * 1e3:6.2f} ms  "
                  f"{num_edges / t / 1e6:6.1f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
