"""Host-side preprocessing throughput: numpy fallbacks vs the native C++
module (tf_geometric_tpu/native) at Reddit-ish scale. Pure host benchmark —
safe to run alongside nothing (no TPU involved)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tf_geometric_tpu import native
from tf_geometric_tpu.ops import ell as ell_mod


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return best


def main():
    N, E, K = 233_000, 23_000_000, 16
    rng = np.random.default_rng(0)
    rows = rng.integers(0, N, E)
    cols = rng.integers(0, N, E)
    vals = rng.normal(size=E).astype(np.float32)
    print(f"N={N} E={E} native={native.available()}", flush=True)

    real_available = native.available

    def with_native(flag, fn):
        native.available = (real_available if flag else (lambda: False))
        try:
            return timeit(fn)
        finally:
            native.available = real_available

    t_np = with_native(False, lambda: ell_mod.build_ell_arrays(rows, cols, vals, N, N, K))
    t_cc = with_native(True, lambda: ell_mod.build_ell_arrays(rows, cols, vals, N, N, K))
    print(f"ELL pack       numpy {t_np*1000:8.0f} ms   native {t_cc*1000:8.0f} ms"
          f"   {t_np/t_cc:5.1f}x  ({E/t_cc/1e6:.0f} M edges/s)", flush=True)

    from tf_geometric_tpu.utils.graph_utils import RandomNeighborSampler
    ei = np.stack([rows, cols])
    t_np = with_native(False, lambda: RandomNeighborSampler(ei, rng=0))
    t_cc = with_native(True, lambda: RandomNeighborSampler(ei, rng=0))
    print(f"CSR build      numpy {t_np*1000:8.0f} ms   native {t_cc*1000:8.0f} ms"
          f"   {t_np/t_cc:5.1f}x", flush=True)

    sampler = RandomNeighborSampler(ei, rng=0)
    t_np = with_native(False, lambda: sampler.sample(k=25, padding=True))
    t_cc = with_native(True, lambda: sampler.sample(k=25, padding=True))
    eps = N * 25
    print(f"sample k=25    numpy {t_np*1000:8.0f} ms   native {t_cc*1000:8.0f} ms"
          f"   {t_np/t_cc:5.1f}x  ({eps/t_cc/1e6:.0f} M draws/s)", flush=True)

    from tf_geometric_tpu.parallel.partition import community_order
    # LPA on a smaller SBM (the numpy path's global unique is the bottleneck)
    Nl, El = 200_000, 4_000_000
    blocks = rng.integers(0, 50, Nl)
    r = rng.integers(0, Nl, El)
    # 90% intra-block edges
    same = rng.random(El) < 0.9
    c = np.where(same,
                 rng.permutation(Nl)[rng.integers(0, Nl, El)], rng.integers(0, Nl, El))
    # crude: force same-block by rejection-free trick (approximate structure)
    eil = np.stack([r, c])
    t_np = with_native(False, lambda: community_order(eil, Nl, num_iters=4))
    t_cc = with_native(True, lambda: community_order(eil, Nl, num_iters=4))
    print(f"LPA order      numpy {t_np*1000:8.0f} ms   native {t_cc*1000:8.0f} ms"
          f"   {t_np/t_cc:5.1f}x", flush=True)

    from tf_geometric_tpu.parallel.partition import partition_order
    t_np = with_native(False, lambda: partition_order(eil, Nl, 8, num_iters=4,
                                                      refine_iters=4))
    t_cc = with_native(True, lambda: partition_order(eil, Nl, 8, num_iters=4,
                                                     refine_iters=4))
    print(f"partition P=8  numpy {t_np*1000:8.0f} ms   native {t_cc*1000:8.0f} ms"
          f"   {t_np/t_cc:5.1f}x", flush=True)


if __name__ == "__main__":
    main()
