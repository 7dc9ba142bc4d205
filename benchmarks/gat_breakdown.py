"""Per-component timing of the GAT training step at ogbn-arxiv scale.

Isolates SDDMM (the two wide gathers + per-head reduce), segment softmax,
multi-head ELL aggregation, and their backward passes to locate the
bottleneck in the 409 ms/step measured end-to-end. Run alone on the TPU.
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
    from tf_geometric_tpu.datasets.synthetic_citation import synthetic_ogbn_arxiv_like
    from tf_geometric_tpu.nn.conv.gat import _gat_edge_cache
    from tf_geometric_tpu.nn.kernel.segment import segment_softmax
    from tf_geometric_tpu.ops.ell import ell_spmm_multihead
    from tf_geometric_tpu.utils.profiling import measure_step_time

    HEADS, UNITS = 8, 256
    D = UNITS // HEADS
    graph = synthetic_ogbn_arxiv_like()
    N, F = graph.x.shape
    ei = jnp.asarray(graph.edge_index)
    cache = {}
    sorted_ei, _, layout = _gat_edge_cache(ei, N, cache)
    row = sorted_ei[0]
    E = int(sorted_ei.shape[1])
    print(f"N={N} E(self-looped)={E} heads={HEADS} units={UNITS}", flush=True)

    rng = np.random.default_rng(0)
    Q0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    K0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    V0 = jnp.asarray(rng.normal(size=(N, UNITS)), jnp.float32)
    att0 = jnp.asarray(rng.random((E, HEADS)), jnp.float32)

    def timed(name, fn, args, lo=3, hi=9):
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t = measure_step_time(jfn, args, lo=lo, hi=hi)
        print(f"{name:34s} {t*1000:9.2f} ms", flush=True)
        return t

    # --- forward components (chained: output feeds arg0 where shapes allow)
    safe_row = jnp.clip(sorted_ei[0], 0, N - 1)
    safe_col = jnp.clip(sorted_ei[1], 0, N - 1)

    def sddmm(Q, K):
        prod = jnp.take(Q, safe_row, axis=0) * jnp.take(K, safe_col, axis=0)
        att = prod.reshape(E, HEADS, D).sum(-1)  # [E, H]
        # fold back to [N, UNITS] so the step chains
        return Q + jax.ops.segment_sum(
            jnp.repeat(att, D, -1), safe_row, num_segments=N,
            indices_are_sorted=True), K

    def softmax_he(att, _):
        a = jax.vmap(lambda v: segment_softmax(
            v, row, N, indices_are_sorted=True))(att.T).T
        return a + att * 1e-9, _

    def softmax_eh(att, _):
        a = segment_softmax(att, row, N, indices_are_sorted=True)
        return a + att * 1e-9, _

    def agg(V, att):
        out = ell_spmm_multihead(layout, att, V, D)
        return out, att

    def agg_bwd(V, att):
        def f(v, a):
            return jnp.sum(ell_spmm_multihead(layout, a, v, D) ** 2)
        dv, da = jax.grad(f, argnums=(0, 1))(V, att)
        return V + 1e-9 * dv, att + 1e-9 * da

    def sddmm_bwd(Q, K):
        def f(q, k):
            prod = jnp.take(q, safe_row, axis=0) * jnp.take(k, safe_col, axis=0)
            return jnp.sum(prod.reshape(E, HEADS, D).sum(-1) ** 2)
        dq, dk = jax.grad(f, argnums=(0, 1))(Q, K)
        return Q + 1e-9 * dq, K + 1e-9 * dk

    def softmax_bwd(att, _):
        def f(a):
            s = jax.vmap(lambda v: segment_softmax(
                v, row, N, indices_are_sorted=True))(a.T).T
            return jnp.sum(s ** 2)
        da = jax.grad(f)(att)
        return att + 1e-9 * da, _

    if os.environ.get("BREAKDOWN_LEGACY") == "1":
        timed("SDDMM fwd (+chain segsum)", sddmm, (Q0, K0))
        timed("segment_softmax [H,E] vmap fwd", softmax_he, (att0, 0.0))
        timed("segment_softmax [E,H] fwd", softmax_eh, (att0, 0.0))
        timed("ELL multihead agg fwd", agg, (V0, att0))
        timed("ELL multihead agg fwd+bwd", agg_bwd, (V0, att0))
        timed("SDDMM fwd+bwd", sddmm_bwd, (Q0, K0))
        timed("softmax fwd+bwd", softmax_bwd, (att0, 0.0))

    # --- fused scatter-free kernel variants ---------------------------------
    from tf_geometric_tpu.ops.ell import EllAdj
    from tf_geometric_tpu.ops.ell_attention import (build_gat_layout,
                                                    gat_attention_ell)

    ei_np = np.asarray(jax.device_get(sorted_ei))

    def fused_variant(tag, k, cd):
        ell = EllAdj.from_coo(ei_np, np.ones(ei_np.shape[1], np.float32),
                              (N, N), k=k)
        lay = build_gat_layout(ell)

        def fwd(Q, K_, V):
            out = gat_attention_ell(lay, Q, K_, V, HEADS, compute_dtype=cd)
            return Q + 1e-9 * out, K_, V

        def fwdbwd(Q, K_, V):
            def f(q, kk, v):
                return jnp.sum(gat_attention_ell(lay, q, kk, v, HEADS,
                                                 compute_dtype=cd) ** 2)
            dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(Q, K_, V)
            return Q + 1e-9 * dq, K_ + 1e-9 * dk, V + 1e-9 * dv

        timed(f"fused fwd {tag}", fwd, (Q0, K0, V0))
        timed(f"fused fwd+bwd {tag}", fwdbwd, (Q0, K0, V0))

    fused_variant("K=8 fp32", 8, None)
    fused_variant("K=8 bf16", 8, jnp.bfloat16)
    fused_variant("K=16 fp32", 16, None)
    fused_variant("K=16 bf16", 16, jnp.bfloat16)


if __name__ == "__main__":
    main()
