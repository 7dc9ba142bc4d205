"""Profiling hooks (SURVEY §5: the reference has only wall-clock speed tests;
the TPU build exposes jax.profiler traces + a tunnel-safe timing helper)."""
from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["trace", "measure_step_time", "estimate_spmm_roofline"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tfg_tpu_trace"):
    """Capture a jax.profiler trace around a block; inspect with
    TensorBoard or xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def measure_step_time(step_fn, args, lo: int = 5, hi: int = 25):
    """Slope-fit timing for chained steps.

    ``step_fn(*args) -> new_args`` must feed its outputs forward so the
    iterations form a dependency chain. Uses a small ``device_get`` to drain
    the queue — on tunneled backends (axon) ``block_until_ready`` does NOT
    synchronize, so naive timing returns dispatch time only.
    """
    def run(iters, a):
        t = time.time()
        for _ in range(iters):
            a = step_fn(*a)
        leaf = None
        import jax
        for leaf in jax.tree.leaves(a):
            break
        _ = np.asarray(leaf.reshape(-1)[:1])
        return time.time() - t, a

    _, args = run(2, args)
    t_lo, args = run(lo, args)
    t_hi, args = run(hi, args)
    return (t_hi - t_lo) / (hi - lo)


def estimate_spmm_roofline(num_edges: int, num_nodes: int, num_features: int,
                           dtype_bytes: int = 4, hbm_bandwidth: float = 819e9):
    """Streaming-bytes lower bound for one SpMM pass (edges/sec)."""
    bytes_total = (num_edges * (8 + num_features * dtype_bytes)
                   + num_nodes * num_features * dtype_bytes)
    return num_edges / (bytes_total / hbm_bandwidth)
