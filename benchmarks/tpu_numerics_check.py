"""On-TPU numerics validation: fused kernels vs segment-path oracles.

The oracle/equivalence test suite runs on the CPU backend (conftest). This
script runs the same checks ON THE ACTUAL TPU chip, where XLA tiling,
fusion, and the bf16 compute policy differ — closing the "tests pass on
CPU" / "bench runs on TPU" gap for the production kernels:

- ELL / bucketed SpMM (f32 + bf16 policy) vs a float64 dense oracle
- fused bucketed GAT attention (fwd + grads, f32 + bf16) vs the segment
  softmax path

Run alone on the TPU:  python benchmarks/tpu_numerics_check.py
Prints one OK/FAIL line per check and exits nonzero on any FAIL.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tf_geometric_tpu.nn.conv.gat import _gat_edge_cache, gat
    from tf_geometric_tpu.nn.conv.gcn import gcn_norm_adj, maybe_compile_ell, compute_cache_key
    from tf_geometric_tpu.ops import config as kconf
    from tf_geometric_tpu.sparse import SparseMatrix

    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)

    rng = np.random.RandomState(0)
    n, f, units = 600, 64, 32
    # heavy-tailed so the bucketed layout exercises several groups + splits
    deg = np.clip(rng.zipf(1.6, n), 1, 300)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.randint(0, n, rows.shape[0])
    ei = np.stack([rows, cols]).astype(np.int32)
    ew = rng.uniform(0.5, 1.5, ei.shape[1]).astype(np.float32)
    x = rng.randn(n, f).astype(np.float32)

    failures = []

    def check(name, got, want, rel_tol):
        """Relative Frobenius error — robust to hub-row bf16 accumulation
        (a 300-term bf16 sum carries ~1e-2 relative error by construction)."""
        got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
        rel = float(np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12))
        ok = rel <= rel_tol
        print(f"{'OK  ' if ok else 'FAIL'} {name}: rel_err={rel:.3e} "
              f"(tol {rel_tol:g})", flush=True)
        if not ok:
            failures.append(name)

    # ---- SpMM: ELL-compiled vs plain segment path --------------------------
    normed = gcn_norm_adj(SparseMatrix(ei, ew, (n, n)))
    dense_oracle = np.zeros((n, n), np.float64)
    np.add.at(dense_oracle, (np.asarray(normed.index)[0],
                             np.asarray(normed.index)[1]),
              np.asarray(normed.value))
    want_spmm = (dense_oracle @ x.astype(np.float64)).astype(np.float32)
    for dtype_name, cd, tol in (("f32", None, 1e-5),
                                ("bf16", jnp.bfloat16, 2e-2)):
        kconf.set_ell_compute_dtype(cd)
        cache = {}
        normed_c = gcn_norm_adj(SparseMatrix(ei, ew, (n, n)), cache=cache)
        adj = maybe_compile_ell(normed_c, cache,
                                compute_cache_key("both", True, True, True, False))
        got = np.asarray(jax.jit(lambda h: adj.matmul(h))(jnp.asarray(x)))
        check(f"ell_spmm_{dtype_name}", got, want_spmm, tol)
    kconf.set_ell_compute_dtype(None)

    # ---- fused GAT: fused bucketed path vs segment path --------------------
    heads = 4
    wq = rng.randn(f, units).astype(np.float32) * 0.3
    wk = rng.randn(f, units).astype(np.float32) * 0.3
    wv = rng.randn(f, units).astype(np.float32) * 0.3
    bq = np.zeros(units, np.float32)

    def run_gat(use_cache, cd):
        kconf.set_ell_compute_dtype(cd)
        kwargs = {}
        if use_cache:
            sorted_ei, _, layout = _gat_edge_cache(jnp.asarray(ei), n, {})
            kwargs = dict(ell_layout=layout, sorted_edge_index=sorted_ei,
                          num_nodes=n)

        def loss_fn(q, k, v):
            out = gat(jnp.asarray(x), None if use_cache else jnp.asarray(ei),
                      q, bq, jax.nn.relu, k, bq, jax.nn.relu, v,
                      num_heads=heads, **({"num_nodes": n} if not use_cache
                                          else kwargs))
            return jnp.sum(out * jnp.cos(out)), out

        (loss, out), grads = jax.jit(
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True))(
            jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv))
        return np.asarray(out), [np.asarray(g) for g in grads]

    out_seg, grads_seg = run_gat(False, None)     # segment path, f32
    for dtype_name, cd, tol in (("f32", None, 1e-4),
                                ("bf16", jnp.bfloat16, 3e-2)):
        out_fused, grads_fused = run_gat(True, cd)
        check(f"gat_fused_fwd_{dtype_name}", out_fused, out_seg, tol)
        for gname, gf, gs in zip("qkv", grads_fused, grads_seg):
            check(f"gat_fused_grad_{gname}_{dtype_name}", gf, gs, tol * 2)
    kconf.set_ell_compute_dtype(None)

    print("TPU numerics:", "FAIL " + ",".join(failures) if failures else "ALL OK",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
