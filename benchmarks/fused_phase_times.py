"""Phase-level timing inside the fused ELL attention forward (TPU).

Separates the slot-score loop, tail scores, softmax, slot aggregation loop,
and tail aggregation to find which phase keeps the fused kernel above the
gather-traffic floor.
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
    from tf_geometric_tpu.ops import ell_attention as ea
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
    print(f"N={N} K={Kslots} tail={T}", flush=True)

    rng = np.random.default_rng(0)
    Q0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    K0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    V0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    aslots0 = jnp.asarray(rng.random((N, Kslots, HEADS)), jnp.float32)
    atail0 = jnp.asarray(rng.random((T, HEADS)), jnp.float32)
    inv_scale = 1.0 / np.sqrt(float(D))

    def timed(name, fn, args, lo=3, hi=9):
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t = measure_step_time(jfn, args, lo=lo, hi=hi)
        print(f"{name:38s} {t*1000:9.2f} ms", flush=True)

    def scores(Q, K):
        s = ea._slot_scores(ell.slots_col, ell.slot_eid, Q, K, HEADS, D,
                            inv_scale, ell.num_edges)
        return Q + 1e-9 * s.sum(1).repeat(D, -1), K

    def tail_scores(Q, K):
        s = ea._tail_scores(ell.tail_row, ell.tail_col, Q, K, HEADS, D,
                            inv_scale, N)
        return Q + 1e-9 * jax.ops.segment_sum(
            s, ell.tail_row, num_segments=N,
            indices_are_sorted=True).repeat(D, -1), K

    def softmax(a_slots, _):
        s_tail = jnp.zeros((T, HEADS), jnp.float32)
        a, at, _diag = ea._softmax_slots_tail(
            a_slots, s_tail, ell.slot_eid < ell.num_edges,
            ell.tail_row < N, ell.tail_row, N)
        return a_slots + 1e-9 * a, _

    def agg_slots(V, a_slots):
        out = ea._aggregate(ell.slots_col, ell.tail_row[:0], ell.tail_col[:0],
                            a_slots, atail0[:0], V, D, N)
        return V + 1e-9 * out, a_slots

    def agg_tail(V, a_tail):
        n_src = V.shape[0]
        v = jnp.take(V, jnp.clip(ell.tail_col, 0, n_src - 1), axis=0)
        msg = v * jnp.repeat(a_tail, D, -1)
        out = jax.ops.segment_sum(msg, ell.tail_row, num_segments=N,
                                  indices_are_sorted=True)
        return V + 1e-9 * out, a_tail

    timed("fwd: slot scores (K gathers of K-mat)", scores, (Q0, K0))
    timed("fwd: tail scores (2 gathers [T,256])", tail_scores, (Q0, K0))
    timed("fwd: softmax slots+tail", softmax, (aslots0, 0.0))
    timed("fwd: agg slots only", agg_slots, (V0, aslots0))
    timed("fwd: agg tail only (gather+segsum)", agg_tail, (V0, atail0))

    # ---- backward phases (mirror _fused_bwd's pass structure) ----
    dy0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    zero_row = N * Kslots + T
    w_flat0 = jnp.asarray(rng.normal(size=(zero_row + 1, 2 * HEADS)),
                          jnp.float32)

    def bwd_da_slots(dy, V):
        def body(k, da):
            col_k = jax.lax.dynamic_index_in_dim(ell.slots_col, k, 1, False)
            v = jnp.take(V, jnp.clip(col_k, 0, N - 1), axis=0)
            da_k = (dy * v).reshape(N, HEADS, D).sum(-1)
            return jax.lax.dynamic_update_index_in_dim(da, da_k, k, 1)
        da = jax.lax.fori_loop(0, Kslots, body,
                               jnp.zeros((N, Kslots, HEADS), jnp.float32))
        return dy + 1e-9 * da.sum(1).repeat(D, -1), V

    def bwd_softmax(a_slots, a_tail):
        g = (a_slots * a_slots).sum(axis=1)
        g = g + jax.ops.segment_sum(a_tail * a_tail, ell.tail_row,
                                    num_segments=N, indices_are_sorted=True)
        ds = a_slots * (a_slots - g[:, None, :])
        return a_slots + 1e-9 * ds, a_tail

    def bwd_dq_slots(K, ds_like):
        def body(k, dq):
            col_k = jax.lax.dynamic_index_in_dim(ell.slots_col, k, 1, False)
            krows = jnp.take(K, jnp.clip(col_k, 0, N - 1), axis=0)
            ds_k = jax.lax.dynamic_index_in_dim(ds_like, k, 1, False)
            return dq + krows * jnp.repeat(ds_k, D, -1)
        dq = jax.lax.fori_loop(0, Kslots, body, jnp.zeros_like(K))
        return K + 1e-9 * dq, ds_like

    def bwd_transpose(dy, w_flat):
        TK = ell.t_slots_col.shape[1]
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
        dV, dK = jax.lax.fori_loop(0, TK, body,
                                   (jnp.zeros((N, UNITS)), jnp.zeros((N, UNITS))))
        return dy + 1e-9 * (dV + dK), w_flat

    def bwd_transpose_tail(dy, w_flat):
        w = jnp.take(w_flat, jnp.clip(layout.t_tail_pos, 0, zero_row), axis=0)
        safe = jnp.clip(ell.t_tail_col, 0, N - 1)
        dyr = jnp.take(dy, safe, axis=0)
        qr = jnp.take(Q0, safe, axis=0)
        msg = jnp.concatenate([dyr * jnp.repeat(w[:, :HEADS], D, -1),
                               qr * jnp.repeat(w[:, HEADS:], D, -1)], axis=-1)
        seg = jax.ops.segment_sum(msg, ell.t_tail_row, num_segments=N,
                                  indices_are_sorted=True)
        return dy + 1e-9 * (seg[:, :UNITS] + seg[:, UNITS:]), w_flat

    timed("bwd: da slots (K gathers of V)", bwd_da_slots, (dy0, V0))
    timed("bwd: softmax backward", bwd_softmax, (aslots0, atail0))
    timed("bwd: dQ slots (K gathers of K-mat)", bwd_dq_slots, (K0, aslots0))
    timed("bwd: transpose pass (dy+Q+w gathers)", bwd_transpose, (dy0, w_flat0))
    timed("bwd: transpose tail", bwd_transpose_tail, (dy0, w_flat0))

    # ---- whole-op split: fwd-only vs fwd+bwd ----
    from tf_geometric_tpu.ops.ell_attention import gat_attention_ell

    def whole_fwd(Q, K, V):
        out = gat_attention_ell(layout, Q, K, V, HEADS)
        return Q + 1e-9 * out, K, V

    def whole_fwd_bwd(Q, K, V):
        def f(q, k, v):
            return (gat_attention_ell(layout, q, k, v, HEADS) ** 2).sum()
        dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(Q, K, V)
        return Q + 1e-9 * dq, K + 1e-9 * dk, V + 1e-9 * dv

    timed("whole op: forward only", whole_fwd, (Q0, K0, V0))
    timed("whole op: forward+backward", whole_fwd_bwd, (Q0, K0, V0))


if __name__ == "__main__":
    main()
