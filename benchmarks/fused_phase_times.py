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
        a, at = ea._softmax_slots_tail(
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

    def edge_order(a_slots, a_tail):
        e = ea._edge_order(a_slots, a_tail, layout.eid_pos)
        return a_slots + 1e-9 * jnp.zeros_like(a_slots), a_tail + 1e-9 * e.sum() * 0

    timed("slot scores (K gathers of K-mat)", scores, (Q0, K0))
    timed("tail scores (2 gathers [T,256])", tail_scores, (Q0, K0))
    timed("softmax slots+tail", softmax, (aslots0, 0.0))
    timed("agg slots only", agg_slots, (V0, aslots0))
    timed("agg tail only (gather+segsum)", agg_tail, (V0, atail0))
    timed("edge-order gather", edge_order, (aslots0, atail0))


if __name__ == "__main__":
    main()
