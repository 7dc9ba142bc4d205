"""A/B: fori_loop vs unrolled, [N,K] vs [K,N] slot layout, fp32 vs bf16,
for the fused-attention forward's two hot loops (scores + aggregation).
Decides the production kernel structure in ops/ell_attention.py.
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
    _, _, layout = _gat_edge_cache(ei, N, cache)
    ell = layout.ell
    K = ell.slots_col.shape[1]

    cols_nk = ell.slots_col                        # [N, K]
    cols_kn = jnp.asarray(np.asarray(jax.device_get(ell.slots_col)).T.copy())
    valid_kn = jnp.asarray(
        (np.asarray(jax.device_get(ell.slot_eid)).T < ell.num_edges))

    rng = np.random.default_rng(0)
    Q0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    K0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    a0 = jnp.asarray(rng.random((K, N, HEADS)), jnp.float32)

    def timed(name, fn, args, lo=4, hi=16):
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t = measure_step_time(jfn, args, lo=lo, hi=hi)
        print(f"{name:44s} {t*1000:9.2f} ms", flush=True)

    def mk_fwd(unrolled, kn, dtype):
        cols = cols_kn if kn else cols_nk

        def scores_and_agg(Q, Km):
            q = Q.astype(dtype)
            km = Km.astype(dtype)
            out = jnp.zeros((N, UNITS), dtype)
            s_acc = []

            def one(k, out):
                col_k = cols[k] if kn else cols[:, k]
                krows = jnp.take(km, col_k, axis=0)
                s_k = (q * krows).astype(jnp.float32).reshape(N, HEADS, D).sum(-1)
                a_k = jax.nn.sigmoid(s_k)  # placeholder per-slot weight
                out = out + krows * jnp.repeat(a_k.astype(dtype), D, -1)
                return out, s_k

            if unrolled:
                for k in range(K):
                    out, s_k = one(k, out)
                    s_acc.append(s_k)
                s = jnp.stack(s_acc, 1).sum(1)
            else:
                def body(k, carry):
                    out, s = carry
                    ck = jax.lax.dynamic_index_in_dim(cols, k, 0 if kn else 1,
                                                      keepdims=False)
                    krows = jnp.take(km, ck, axis=0)
                    s_k = (q * krows).astype(jnp.float32).reshape(N, HEADS, D).sum(-1)
                    a_k = jax.nn.sigmoid(s_k)
                    return (out + krows * jnp.repeat(a_k.astype(dtype), D, -1),
                            s + s_k)
                out, s = jax.lax.fori_loop(
                    0, K, body, (out, jnp.zeros((N, HEADS), jnp.float32)))
            return Q + 1e-9 * out.astype(jnp.float32), Km + 1e-9 * jnp.repeat(s, D, -1)

        return scores_and_agg

    for unrolled in (False, True):
        for kn in (False, True):
            for dt in (jnp.float32, jnp.bfloat16):
                tag = (f"{'unroll' if unrolled else 'fori  '} "
                       f"{'[K,N]' if kn else '[N,K]'} {dt.__name__}")
                timed(tag, mk_fwd(unrolled, kn, dt), (Q0, K0))


if __name__ == "__main__":
    main()
