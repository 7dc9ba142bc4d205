"""Microbenchmark: SpMM strategies on TPU (feeds the pallas/XLA dispatch
heuristics in tf_geometric_tpu.ops). Run standalone on the TPU."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N, E, F = 169_343, 1_333_000, 128
    rng = np.random.default_rng(0)
    dst = np.sort((rng.random(E) ** 2 * N).astype(np.int32))  # pre-sorted by row
    src = rng.integers(0, N, size=E).astype(np.int32)
    perm = rng.permutation(E)
    val = rng.random(E).astype(np.float32)
    # permute the VALUES along with the indices — the unsorted and
    # sorted/ELL variants must compute the same weighted sum for the
    # correctness check at the end
    dst_unsorted, src_unsorted, val_unsorted = dst[perm], src[perm], val[perm]
    x = rng.normal(size=(N, F)).astype(np.float32)

    xs = jnp.asarray(x)
    results = {}

    def timeit(name, fn, *args, iters=20):
        """Chained timing: each iteration feeds the previous output back in
        (scaled into a no-op perturbation), drained with a tiny device_get —
        ``block_until_ready`` is a NO-OP on the axon tunnel, so un-chained
        loops measure dispatch only (CLAUDE.md timing protocol)."""
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])

        def run(n, o):
            t = time.time()
            for _ in range(n):
                # dependency chain: perturb the last operand by a ~0 scalar
                # derived from the previous output (uniform tiny overhead
                # across variants; keeps iterations data-dependent)
                eps = jax.tree.leaves(o)[0].reshape(-1)[0] * 1e-30
                o = fn(*args[:-1], args[-1] * (1.0 + eps))
            _ = np.asarray(jax.tree.leaves(o)[0].reshape(-1)[:1])
            return time.time() - t, o

        _, out2 = run(2, out)
        lo = max(iters // 4, 2)
        t_lo, out2 = run(lo, out2)
        t_hi, _ = run(iters, out2)
        dt = (t_hi - t_lo) / (iters - lo)
        results[name] = dt
        print(f"{name:36s} {dt*1000:8.2f} ms   {E/dt/1e6:8.1f} M edges/s", flush=True)
        return out

    @jax.jit
    def spmm_unsorted(row, col, v, h):
        msg = jnp.take(h, col, axis=0) * v[:, None]
        return jax.ops.segment_sum(msg, row, num_segments=N)

    @jax.jit
    def spmm_sorted_flag(row, col, v, h):
        msg = jnp.take(h, col, axis=0) * v[:, None]
        return jax.ops.segment_sum(msg, row, num_segments=N,
                                   indices_are_sorted=True)

    @jax.jit
    def gather_only(col, v, h):
        return jnp.take(h, col, axis=0) * v[:, None]

    @jax.jit
    def scatter_only(row, msg):
        return jax.ops.segment_sum(msg, row, num_segments=N,
                                   indices_are_sorted=True)

    r_u = jnp.asarray(dst_unsorted); c_u = jnp.asarray(src_unsorted)
    r_s = jnp.asarray(dst); c_s = jnp.asarray(src)
    v = jnp.asarray(val)
    v_u = jnp.asarray(val_unsorted)

    o1 = timeit("unsorted gather+segsum", spmm_unsorted, r_u, c_u, v_u, xs)
    o2 = timeit("sorted gather+segsum(flag)", spmm_sorted_flag, r_s, c_s, v, xs)
    o3 = timeit("sorted gather+segsum(noflag)", spmm_unsorted, r_s, c_s, v, xs)
    msg = gather_only(c_s, v, xs)
    timeit("gather only", gather_only, c_s, v, xs)
    timeit("scatter only (sorted)", scatter_only, r_s, msg)

    # ELL variant: K slots per row + COO tail
    K = 16
    counts = np.bincount(dst, minlength=N)
    slots_col = np.zeros((N, K), np.int32)
    slots_val = np.zeros((N, K), np.float32)
    fill = np.zeros(N, np.int64)
    tail_r, tail_c, tail_v = [], [], []
    for e in range(E):
        r = dst[e]
        if fill[r] < K:
            slots_col[r, fill[r]] = src[e]
            slots_val[r, fill[r]] = val[e]
            fill[r] += 1
        else:
            tail_r.append(r); tail_c.append(src[e]); tail_v.append(val[e])
    tail_r = np.asarray(tail_r, np.int32)
    tail_c = np.asarray(tail_c, np.int32)
    tail_v = np.asarray(tail_v, np.float32)
    print(f"ELL tail edges: {len(tail_r)} ({len(tail_r)/E:.1%})")

    @jax.jit
    def spmm_ell(slots_col, slots_val, tr, tc, tv, h):
        # [N, K, F] gather → weighted sum over K
        gathered = jnp.take(h, slots_col, axis=0)          # [N, K, F]
        out = jnp.einsum("nkf,nk->nf", gathered, slots_val)
        tail_msg = jnp.take(h, tc, axis=0) * tv[:, None]
        return out + jax.ops.segment_sum(tail_msg, tr, num_segments=N,
                                         indices_are_sorted=True)

    o4 = timeit("ELL K=16 + COO tail", spmm_ell, jnp.asarray(slots_col),
                jnp.asarray(slots_val), jnp.asarray(tail_r),
                jnp.asarray(tail_c), jnp.asarray(tail_v), xs)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o4), rtol=2e-2, atol=2e-2)

    # fwd+bwd through the best two
    def loss_unsorted(v_, h_):
        return jnp.sum(spmm_unsorted(r_u, c_u, v_, h_) ** 2)
    g1 = jax.jit(jax.grad(loss_unsorted, argnums=(0, 1)))
    timeit("fwd+bwd unsorted", lambda v_, h_: g1(v_, h_), v_u, xs, iters=10)

    def loss_sorted(v_, h_):
        return jnp.sum(spmm_sorted_flag(r_s, c_s, v_, h_) ** 2)
    g2 = jax.jit(jax.grad(loss_sorted, argnums=(0, 1)))
    timeit("fwd+bwd sorted", lambda v_, h_: g2(v_, h_), v, xs, iters=10)


if __name__ == "__main__":
    main()
