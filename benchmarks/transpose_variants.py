"""Loop-structure variants for the fused-GAT transpose pass (the single
biggest phase: 64.6 ms of the 207 ms fp32 op, fused_phase_times.py).

Per transpose slot k the pass does: narrow w gather + wide dy gather + wide
Q gather + two repeats + two [N, Hd] accumulators. Variants:

  fori     - current production shape: lax.fori_loop, carries stream HBM
             every iteration (2 x 173 MB f32 read+write per k)
  unroll   - python loop: XLA can fuse all K gathers + adds into one fusion,
             writing the accumulators once
  flat     - ONE gather of all N*K rows + reshape + sum over k: fewest
             kernel launches, but may materialize [N*K, Hd]

Run alone on the TPU.
"""
import os
import sys

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
    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_ogbn_arxiv_like
    from tf_geometric_tpu.nn.conv.gat import _gat_edge_cache
    from tf_geometric_tpu.utils.profiling import measure_step_time

    HEADS, UNITS = 8, 256
    D = UNITS // HEADS
    graph = synthetic_ogbn_arxiv_like()
    N = graph.x.shape[0]
    ei = jnp.asarray(graph.edge_index)
    cache = {}
    sorted_ei, _, layout = _gat_edge_cache(ei, N, cache)
    ell = layout.ell
    Kslots = ell.slots_col.shape[1]
    T = int(ell.tail_row.shape[0])
    zero_row = N * Kslots + T
    print(f"N={N} K={Kslots} tail={T}", flush=True)

    rng = np.random.default_rng(0)
    w_flat0 = jnp.asarray(rng.normal(size=(zero_row + 1, 2 * HEADS)), jnp.float32)
    Q0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)

    def timed(name, fn, args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t = measure_step_time(jfn, args, lo=3, hi=9)
        print(f"{name:24s} {t*1000:9.2f} ms", flush=True)

    def body_of(dy, w_flat):
        def body(k, carry):
            dV, dK = carry
            col_k = jax.lax.dynamic_index_in_dim(ell.t_slots_col, k, 1, False)
            pos_k = jax.lax.dynamic_index_in_dim(layout.t_slot_pos, k, 1, False)
            w = jnp.take(w_flat, jnp.clip(pos_k, 0, zero_row), axis=0)
            safe = jnp.clip(col_k, 0, N - 1)
            dyr = jnp.take(dy, safe, axis=0)
            qr = jnp.take(Q0, safe, axis=0)
            dV = dV + dyr * jnp.repeat(w[:, :HEADS], D, -1)
            dK = dK + qr * jnp.repeat(w[:, HEADS:], D, -1)
            return dV, dK
        return body

    def v_fori(dy, w_flat):
        body = body_of(dy, w_flat)
        dV, dK = jax.lax.fori_loop(0, Kslots, body,
                                   (jnp.zeros((N, UNITS)), jnp.zeros((N, UNITS))))
        return dy + 1e-9 * (dV + dK), w_flat

    def v_unroll(dy, w_flat):
        body = body_of(dy, w_flat)
        carry = (jnp.zeros((N, UNITS)), jnp.zeros((N, UNITS)))
        for k in range(Kslots):
            carry = body(k, carry)
        dV, dK = carry
        return dy + 1e-9 * (dV + dK), w_flat

    def v_flat(dy, w_flat):
        cols = jnp.clip(ell.t_slots_col.reshape(-1), 0, N - 1)   # [N*K]
        pos = jnp.clip(layout.t_slot_pos.reshape(-1), 0, zero_row)
        w = jnp.take(w_flat, pos, axis=0)                        # [N*K, 2H]
        dyr = jnp.take(dy, cols, axis=0)                         # [N*K, Hd]
        qr = jnp.take(Q0, cols, axis=0)
        wv = jnp.repeat(w[:, :HEADS], D, -1).reshape(N, Kslots, UNITS)
        wk = jnp.repeat(w[:, HEADS:], D, -1).reshape(N, Kslots, UNITS)
        dV = (dyr.reshape(N, Kslots, UNITS) * wv).sum(1)
        dK = (qr.reshape(N, Kslots, UNITS) * wk).sum(1)
        return dy + 1e-9 * (dV + dK), w_flat

    dy0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    timed("fori (production)", v_fori, (dy0, w_flat0))
    timed("unroll", v_unroll, (dy0, w_flat0))
    timed("flat gather+reduce", v_flat, (dy0, w_flat0))


if __name__ == "__main__":
    main()
