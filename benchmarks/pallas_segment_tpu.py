"""Profile the Pallas one-hot MXU sorted-segment reduction vs XLA's
segment_sum on real hardware (arxiv-scale message stream).

The kernel (ops/pallas_segment.py) turns the serializing scatter into a
[CHUNK, CHUNK] @ [CHUNK, F] MXU contraction per chunk plus one small fold.
Run alone on the TPU (CLAUDE.md tunnel rules):

    python benchmarks/pallas_segment_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tf_geometric_tpu.ops.pallas_segment import (pallas_sorted_segment_sum,
                                                     plan_sorted_segments)
    from tf_geometric_tpu.utils.profiling import measure_step_time

    N, E, F = 169_343, 1_333_000, 128
    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, N, E)).astype(np.int32)
    print("platform:", jax.devices()[0].platform, flush=True)

    rank, slot_row, E_pad, num_chunks = plan_sorted_segments(rows, N)
    for dtype in (jnp.float32, jnp.bfloat16):
        msg = jnp.asarray(rng.normal(size=(E_pad, F)), dtype)
        rows_d = jnp.asarray(np.pad(rows, (0, E_pad - E),
                                    constant_values=N))
        rank_d = jnp.asarray(rank)
        slot_d = jnp.asarray(slot_row)

        @jax.jit
        def xla_sorted(m):
            return jax.ops.segment_sum(m, rows_d, num_segments=N,
                                       indices_are_sorted=True)

        @jax.jit
        def xla_unsorted(m):
            return jax.ops.segment_sum(m, rows_d, num_segments=N)

        @jax.jit
        def mxu(m):
            return pallas_sorted_segment_sum(m, rank_d, slot_d, N, num_chunks)

        for name, fn in [("xla sorted", xla_sorted),
                         ("xla unsorted", xla_unsorted),
                         ("pallas mxu", mxu)]:
            try:
                # chain through an [N, F] accumulator (same small overhead
                # for every variant; comparisons stay valid)
                step = jax.jit(lambda m, acc: (m, acc + fn(m).astype(acc.dtype)))
                acc0 = jnp.zeros((N, F), jnp.float32)
                ms = measure_step_time(step, (msg, acc0)) * 1000
                print(f"{dtype.__name__:9s} {name:12s} {ms:8.2f} ms "
                      f"({E / (ms / 1e3) / 1e6:6.0f} M edges/s)", flush=True)
            except Exception as exc:  # pragma: no cover
                print(f"{dtype.__name__:9s} {name:12s} FAILED: {exc}",
                      flush=True)


if __name__ == "__main__":
    main()
