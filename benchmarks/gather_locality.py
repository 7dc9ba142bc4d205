"""Does gather-index locality change the per-row transaction cost on TPU?

The SpMM floor is gather-transaction-bound (~4.7 ns/row at F<=128, see
spmm_variants.py). If gathers with spatially-local indices run faster than
uniform-random ones, community/degree node reordering (parallel/partition.py
orderings) directly lowers every SpMM/SDDMM pass. Patterns measured:

  random    - uniform random rows (the worst case; what an unordered graph does)
  sorted    - same multiset of rows, sorted ascending (perfect locality bound)
  blocked   - random within 512-row windows, windows in order (what a good
              community ordering actually achieves)
  strided   - sequential rows (pure streaming; the absolute floor)

Run alone on the TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from tf_geometric_tpu.utils.profiling import measure_step_time

    N = 169_343
    M = 1_333_248  # one full-edge gather set (ogbn-arxiv scale)
    rng = np.random.default_rng(0)

    idx_random = rng.integers(0, N, size=M).astype(np.int32)
    idx_sorted = np.sort(idx_random)
    win = 512
    base = np.sort(rng.integers(0, N - win, size=M // win + 1)).astype(np.int32)
    idx_blocked = (np.repeat(base, win)[:M]
                   + rng.integers(0, win, size=M).astype(np.int32))
    idx_strided = (np.arange(M, dtype=np.int64) % N).astype(np.int32)

    for F in (40, 128, 256):
        x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)

        def gather_step(idx, x):
            # feeds x forward (dependency chain for slope-fit timing) with a
            # perturbation too small to change values but data-dependent
            g = jnp.take(x, idx, axis=0)
            return idx, x + g.sum(axis=0) * 1e-30

        for name, idx in (("random", idx_random), ("sorted", idx_sorted),
                          ("blocked", idx_blocked), ("strided", idx_strided)):
            jfn = jax.jit(gather_step)
            d_idx = jnp.asarray(idx)
            _, out = jfn(d_idx, x)
            _ = np.asarray(out[:1, :1])
            t = measure_step_time(jfn, (d_idx, x), lo=3, hi=9)
            print(f"F={F:4d} {name:8s} {t*1e3:8.3f} ms  "
                  f"{t / M * 1e9:6.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
