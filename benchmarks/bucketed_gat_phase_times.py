"""Phase-level timing inside the BUCKETED fused GAT attention (TPU).

Mirrors benchmarks/fused_phase_times.py (which probes the uniform kernel)
for ops/ell_attention_bucketed.py: per-phase jits over the REAL production
layout at ogbn-arxiv scale, bf16 gather passes (the production default).
Each probe is self-contained — permuted operands are precomputed OUTSIDE
the timed function so phases don't double-count the permutes, which are
probed separately.

Run alone on the TPU: nohup python benchmarks/bucketed_gat_phase_times.py &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HEADS, UNITS = 8, 256


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from tf_geometric_tpu.datasets.synthetic_citation import \
        synthetic_ogbn_arxiv_like
    from tf_geometric_tpu.nn.conv.gat import _gat_edge_cache
    from tf_geometric_tpu.ops import ell_attention_bucketed as eb
    from tf_geometric_tpu.utils.profiling import measure_step_time

    D = UNITS // HEADS
    CD = jnp.bfloat16
    graph = synthetic_ogbn_arxiv_like()
    N = graph.x.shape[0]
    ei = jnp.asarray(graph.edge_index)
    cache = {}
    _, _, layout = _gat_edge_cache(ei, N, cache)
    assert isinstance(layout, eb.BucketedGatLayout), repr(layout)
    diag_eid = None  # production keeps self-loops packed (no diag lane)
    fwd, bwd = layout.fwd, layout.bwd
    slices, np_total = eb._group_slices(fwd)
    b_slices, b_np_total = eb._group_slices(bwd)
    E = layout.num_edges
    T = int(fwd.tail_prow.shape[0])
    caps = [g.slots_col.shape[1] for g in fwd.groups]
    lanes = sum(g.slots_col.shape[0] * g.slots_col.shape[1]
                for g in fwd.groups)
    print(f"N={N} E={E} caps={caps} lanes={lanes} tail={T} "
          f"bwd_caps={[g.slots_col.shape[1] for g in bwd.groups]}",
          flush=True)
    inv_scale = 1.0 / np.sqrt(float(D))

    rng = np.random.default_rng(0)
    Q0 = jnp.asarray(rng.normal(size=(N, UNITS)), CD)
    K0 = jnp.asarray(rng.normal(size=(N, UNITS)), CD)
    V0 = jnp.asarray(rng.normal(size=(N, UNITS)), CD)
    dy0 = jnp.asarray(rng.normal(size=(N, UNITS)), CD)
    Qp0 = jax.jit(lambda q: eb._permute(q, fwd.perm, N))(Q0)
    dyp0 = jax.jit(lambda q: eb._permute(q, fwd.perm, N))(dy0)
    # softmax-weight stand-ins with the real per-group shapes
    a_groups0 = [jnp.asarray(rng.random((g.slots_col.shape[0],
                                         g.slots_col.shape[1], HEADS)),
                             jnp.float32) for g in fwd.groups]
    a_tail0 = jnp.asarray(rng.random((T, HEADS)), jnp.float32)
    zero_flat = layout.slot_total + layout.tail_total
    w_flat0 = jnp.asarray(rng.normal(size=(zero_flat + 1, 2 * HEADS)),
                          jnp.float32)

    def timed(name, fn, args, lo=3, hi=9):
        def chained(*a):
            out = fn(*a)
            fold = sum(jnp.sum(o.astype(jnp.float32)) for o in
                       jax.tree.leaves(out)) * np.float32(1e-20)
            return tuple(x + fold.astype(x.dtype) if i == 0 else x
                         for i, x in enumerate(a))
        jfn = jax.jit(chained)
        out = jfn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t = measure_step_time(jfn, out, lo=lo, hi=hi)
        print(f"{name:44s} {t*1000:9.2f} ms", flush=True)
        return t

    # --- permutes -----------------------------------------------------------
    def permute(q):
        return (eb._permute(q, fwd.perm, N),)

    def unpermute(qp):
        return (eb._unpermute(qp, fwd.inv_pos, np_total),)

    # --- forward scores (per-group SDDMM loops + tail) ----------------------
    def scores(Qp, K):
        acc = 0.0
        for gi, g in enumerate(fwd.groups):
            off, ng = slices[gi]
            Kg = g.slots_col.shape[1]
            Q_g = jax.lax.dynamic_slice_in_dim(Qp, off, ng, axis=0)
            s = jnp.full((ng, Kg, HEADS), eb._NEG, jnp.float32)
            for k in range(Kg):
                col_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1, False)
                k_rows = jnp.take(K, jnp.clip(col_k, 0, N - 1), axis=0)
                s_k = eb._blocksum(Q_g * k_rows, HEADS, D) * inv_scale
                s = jax.lax.dynamic_update_index_in_dim(s, s_k, k, 1)
            acc = acc + s.sum()
        return (acc,)

    def tail_scores(Qp, K):
        q_t = jnp.take(jnp.concatenate(
            [Qp, jnp.zeros((1, Qp.shape[1]), Qp.dtype)]),
            jnp.clip(fwd.tail_prow, 0, np_total), axis=0)
        k_t = jnp.take(K, jnp.clip(fwd.tail_col, 0, N - 1), axis=0)
        return (eb._blocksum(q_t * k_t, HEADS, D).sum(),)

    # --- softmax over group lanes + tail ------------------------------------
    def softmax(a_tail, *a_groups):
        row_max = jnp.concatenate([s.max(axis=1) for s in a_groups], axis=0)
        if T:
            t_max = jax.ops.segment_max(a_tail, fwd.tail_prow,
                                        num_segments=np_total,
                                        indices_are_sorted=True)
            row_max = jnp.maximum(row_max, t_max)
        denom_parts, p_groups = [], []
        for gi, (s, g) in enumerate(zip(a_groups, fwd.groups)):
            off, ng = slices[gi]
            rm = jax.lax.dynamic_slice_in_dim(row_max, off, ng, axis=0)
            p = jnp.exp(s - rm[:, None, :])
            p = jnp.where((g.slot_eid < E)[:, :, None], p, 0.0)
            p_groups.append(p)
            denom_parts.append(p.sum(axis=1))
        denom = jnp.concatenate(denom_parts, axis=0)
        if T:
            rm_t = jnp.take(jnp.concatenate(
                [row_max, jnp.full((1, HEADS), eb._NEG, jnp.float32)]),
                jnp.clip(fwd.tail_prow, 0, np_total), axis=0)
            p_tail = jnp.exp(a_tail - rm_t)
            denom = denom + jax.ops.segment_sum(p_tail, fwd.tail_prow,
                                                num_segments=np_total,
                                                indices_are_sorted=True)
        inv_denom = 1.0 / (denom + 1e-16)
        return (sum(p.sum() for p in p_groups) + inv_denom.sum(),)

    # --- aggregation ---------------------------------------------------------
    def aggregate(V, a_tail, *a_groups):
        parts = []
        for gi, g in enumerate(fwd.groups):
            off, ng = slices[gi]
            Kg = g.slots_col.shape[1]
            out = jnp.zeros((ng, V.shape[1]), V.dtype)
            ad = a_groups[gi]
            for k in range(Kg):
                col_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1, False)
                v = jnp.take(V, jnp.clip(col_k, 0, N - 1), axis=0)
                a_k = jax.lax.dynamic_index_in_dim(ad, k, 1, False)
                out = out + v * eb._expand(a_k, D).astype(V.dtype)
            parts.append(out)
        out_p = jnp.concatenate(parts, axis=0)
        if T:
            v_t = jnp.take(V, jnp.clip(fwd.tail_col, 0, N - 1), axis=0)
            out_p = out_p + jax.ops.segment_sum(
                v_t * eb._expand(a_tail, D).astype(V.dtype), fwd.tail_prow,
                num_segments=np_total, indices_are_sorted=True)
        return (eb._unpermute(out_p, fwd.inv_pos, np_total),)

    # --- backward: dã pass (V gathers against dy_p) --------------------------
    def bwd_da(dyp, V):
        acc = 0.0
        for gi, g in enumerate(fwd.groups):
            off, ng = slices[gi]
            Kg = g.slots_col.shape[1]
            dy_g = jax.lax.dynamic_slice_in_dim(dyp, off, ng, axis=0)
            da = jnp.zeros((ng, Kg, HEADS), jnp.float32)
            for k in range(Kg):
                col_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1, False)
                v = jnp.take(V, jnp.clip(col_k, 0, N - 1), axis=0)
                da_k = eb._blocksum(dy_g * v, HEADS, D)
                da = jax.lax.dynamic_update_index_in_dim(da, da_k, k, 1)
            acc = acc + da.sum()
        return (acc,)

    # --- backward: dQ pass (K gathers weighted by ds) -------------------------
    def bwd_dq(K, a_tail, *ds_groups):
        parts = []
        for gi, g in enumerate(fwd.groups):
            off, ng = slices[gi]
            Kg = g.slots_col.shape[1]
            dq = jnp.zeros((ng, K.shape[1]), K.dtype)
            ds = ds_groups[gi]
            for k in range(Kg):
                col_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1, False)
                krows = jnp.take(K, jnp.clip(col_k, 0, N - 1), axis=0)
                ds_k = jax.lax.dynamic_index_in_dim(ds, k, 1, False)
                dq = dq + krows * eb._expand(ds_k, D).astype(K.dtype)
            parts.append(dq)
        dQ_p = jnp.concatenate(parts, axis=0)
        return (eb._unpermute(dQ_p, fwd.inv_pos, np_total),)

    # --- backward: transpose pass (dy+Q gathers, dV+dK combined) -------------
    def bwd_transpose(dyp, Qp, w_flat):
        dy_pz = jnp.concatenate([dyp, jnp.zeros((1, dyp.shape[1]), dyp.dtype)])
        q_pz = jnp.concatenate([Qp, jnp.zeros((1, Qp.shape[1]), Qp.dtype)])
        dv_parts, dk_parts = [], []
        for gi, g in enumerate(bwd.groups):
            off, mg = b_slices[gi]
            Kg = g.slots_col.shape[1]
            dV_g = jnp.zeros((mg, dyp.shape[1]), dyp.dtype)
            dK_g = jnp.zeros((mg, Qp.shape[1]), Qp.dtype)
            for k in range(Kg):
                pcol_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1, False)
                pos_k = jax.lax.dynamic_index_in_dim(g.aux, k, 1, False)
                w = jnp.take(w_flat, jnp.clip(pos_k, 0, zero_flat), axis=0)
                safe = jnp.clip(pcol_k, 0, np_total)
                dV_g = dV_g + jnp.take(dy_pz, safe, axis=0) \
                    * eb._expand(w[:, :HEADS], D).astype(dyp.dtype)
                dK_g = dK_g + jnp.take(q_pz, safe, axis=0) \
                    * eb._expand(w[:, HEADS:], D).astype(Qp.dtype)
            dv_parts.append(dV_g)
            dk_parts.append(dK_g)
        dV = eb._unpermute(jnp.concatenate(dv_parts, axis=0),
                           bwd.inv_pos, b_np_total)
        dK = eb._unpermute(jnp.concatenate(dk_parts, axis=0),
                           bwd.inv_pos, b_np_total)
        return (dV.sum() + dK.sum(),)

    # --- end-to-end ----------------------------------------------------------
    def full_fwd(Q, K, V):
        return (eb.gat_attention_bucketed(layout, Q, K, V, HEADS,
                                          compute_dtype=CD,
                                          diag_eid=diag_eid),)

    def full_fwd_bwd(Q, K, V):
        def f(q, k, v):
            return (eb.gat_attention_bucketed(layout, q, k, v, HEADS,
                                              compute_dtype=CD,
                                              diag_eid=diag_eid)
                    .astype(jnp.float32) * np.float32(1e-3)).sum()
        l, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(Q, K, V)
        return (l + sum(g.astype(jnp.float32).sum() for g in grads),)

    Qf = Q0.astype(jnp.float32)
    timed("permute [N,256] (1 pass)", permute, (Q0,))
    timed("unpermute [N,256] (1 pass)", unpermute, (Qp0,))
    timed("fwd: group scores (K gathers)", scores, (Qp0, K0))
    timed("fwd: tail scores", tail_scores, (Qp0, K0))
    timed("fwd: softmax lanes+tail", softmax, (a_tail0, *a_groups0))
    timed("fwd: aggregation (V gathers)+unperm", aggregate,
          (V0, a_tail0, *a_groups0))
    timed("bwd: da pass (V gathers)", bwd_da, (dyp0, V0))
    timed("bwd: dQ pass (K gathers)+unperm", bwd_dq,
          (K0, a_tail0, *a_groups0))
    timed("bwd: transpose (dy+Q gathers)+unperm", bwd_transpose,
          (dyp0, Qp0, w_flat0))
    timed("FULL fwd", full_fwd, (Qf, K0.astype(jnp.float32),
                                 V0.astype(jnp.float32)))
    timed("FULL fwd+bwd", full_fwd_bwd, (Qf, K0.astype(jnp.float32),
                                         V0.astype(jnp.float32)))


if __name__ == "__main__":
    main()
