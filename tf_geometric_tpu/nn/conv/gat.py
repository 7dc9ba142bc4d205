"""GAT: transformer-style graph attention (reference: nn/conv/gat.py:13-122).

Math per head h (reference :49-89): Q = act(xW_q + b_q), K = act(xW_k + b_k),
V = xW_v; per-edge score = <Q[row], K[col]> / sqrt(d_head); softmax over each
destination's incoming edges; attention-weighted SpMM with V; heads concat
(``split_value_heads=True``) or mean.

TPU-native shape choice: instead of the reference's virtual-node trick
(head h's edges offset by ``h*num_nodes`` into one [N·H, N·H] matrix,
gat.py:73-89), heads live in a tensor dimension: scores are [E, H] and one
segment-softmax/segment-sum vectorizes across the head lane — identical
semantics, no index inflation, and the H lane maps onto VPU lanes.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ...sparse.matrix import SparseMatrix
from ...utils.graph_utils import add_self_loop_edge
from ..kernel.segment import segment_softmax, segment_sum

__all__ = ["gat"]


def _gat_edge_cache(edge_index, num_nodes: int, cache: Optional[dict]):
    """Cache the self-looped, row-sorted edge list + its ELL layout.

    Sorted rows make the segment softmax use the fast sorted path, and the
    ELL layout turns the attention-weighted aggregation into scatter-free
    gathers via dynamic per-edge values (ops/ell.py).
    """
    key = f"gat_edges_{num_nodes}"
    if cache is not None and key in cache:
        return cache[key]
    ei_sl, _ = add_self_loop_edge(edge_index, num_nodes)
    if isinstance(ei_sl, jax.core.Tracer) or cache is None:
        return (ei_sl, False, None)
    ei_np = jax.device_get(ei_sl)
    import numpy as np
    order = np.argsort(ei_np[0], kind="stable")
    sorted_ei = ei_np[:, order]
    from ...ops import config as _config
    # NOTE: split_diag=True (dense row-aligned self-loop lane) is fully
    # supported by the fused kernels and measured — identical fp32, 6.5%
    # SLOWER bf16 (112.8 vs 105.9 ms at arxiv scale): the extra dense
    # full-width passes cost more than the ~13% of gathers they remove.
    # Keep self-loops packed.
    if _config.ell_layout == "uniform":
        from ...ops.ell import EllAdj
        from ...ops.ell_attention import build_gat_layout
        ell = EllAdj.from_coo(sorted_ei,
                              np.ones(sorted_ei.shape[1], np.float32),
                              (num_nodes, num_nodes))
        layout = build_gat_layout(ell)
    else:
        # degree-bucketed fused layout (ops/ell_attention_bucketed.py):
        # lanes ≈ edges on every wide gather pass, per-side auto choice
        from ...ops.ell_attention_bucketed import build_gat_layout_bucketed
        layout = build_gat_layout_bucketed(
            sorted_ei, num_nodes,
            layout="auto" if _config.ell_layout == "auto" else "bucketed")
    entry = (jnp.asarray(sorted_ei), True, layout)
    cache[key] = entry
    return entry


def gat(x, edge_index,
        query_kernel, query_bias, query_activation,
        key_kernel, key_bias, key_activation,
        kernel, bias=None, activation=None, num_heads: int = 1,
        split_value_heads: bool = True, edge_drop_rate: float = 0.0,
        training: bool = False, dropout_key=None, num_nodes: Optional[int] = None,
        cache: Optional[dict] = None, ell_layout=None, sorted_edge_index=None):
    """Functional GAT forward. ``x`` may be dense or SparseMatrix.

    With a ``cache``, the self-looped edge list is pre-sorted and ELL-packed
    once; attention aggregation then runs scatter-free (dynamic-value ELL).
    For jit-compiled training steps, pass ``ell_layout``/``sorted_edge_index``
    as ARGUMENTS of the jitted function instead (cache lookups at trace time
    bake multi-MB layout constants into the HLO, which crushes compile times
    through remote-compile services).
    """
    if num_nodes is None:
        num_nodes = x.shape[0]

    if ell_layout is not None or sorted_edge_index is not None:
        if ell_layout is None or sorted_edge_index is None:
            raise ValueError(
                "pass ell_layout and sorted_edge_index together — the layout "
                "indexes the sorted, self-looped edge list it was built from")
        edge_index = sorted_edge_index
    else:
        # self-attention includes each node itself (gat.py:43)
        edge_index, _, ell_layout = _gat_edge_cache(edge_index, num_nodes, cache)
    row, col = edge_index[0], edge_index[1]
    safe_row = jnp.clip(row, 0, num_nodes - 1)
    safe_col = jnp.clip(col, 0, num_nodes - 1)

    def project(feat, w):
        if isinstance(feat, SparseMatrix):
            return feat.matmul(w)
        return feat @ w

    Q = project(x, query_kernel) + query_bias
    if query_activation is not None:
        Q = query_activation(Q)
    K = project(x, key_kernel) + key_bias
    if key_activation is not None:
        K = key_activation(K)
    V = project(x, kernel)

    E = row.shape[0]
    d_q = Q.shape[-1] // num_heads
    d_v = V.shape[-1] // num_heads
    Qh = Q.reshape(num_nodes, num_heads, d_q)
    Kh = K.reshape(num_nodes, num_heads, d_q)
    Vh = V.reshape(num_nodes, num_heads, d_v)

    scale = jnp.sqrt(jnp.asarray(d_q, jnp.float32))

    from ...ops.ell_attention import GatEllLayout, gat_attention_ell
    from ...ops.ell_attention_bucketed import (BucketedGatLayout,
                                               gat_attention_bucketed)
    if isinstance(ell_layout, BucketedGatLayout) and d_q != d_v:
        # the merged-head fallback below needs an EllAdj; build and memoize
        # one from the cached sorted edge list (concrete even at trace time
        # under the cache-closure pattern)
        if cache is not None and not isinstance(edge_index, jax.core.Tracer):
            mh_key = f"gat_edges_{num_nodes}:mh_ell"
            if mh_key not in cache:
                import numpy as np
                from ...ops.ell import EllAdj
                ei_np = jax.device_get(edge_index)
                cache[mh_key] = EllAdj.from_coo(
                    ei_np, np.ones(ei_np.shape[1], np.float32),
                    (num_nodes, num_nodes))
            ell_layout = cache[mh_key]
        else:
            ell_layout = None  # plain segment path
    if isinstance(ell_layout, BucketedGatLayout) and d_q == d_v:
        # Degree-bucketed fused path (ops/ell_attention_bucketed.py): slot
        # lanes ≈ edges on every wide gather pass; Q/dy ride a permuted row
        # space (one wide permute gather per direction).
        h_flat = gat_attention_bucketed(ell_layout, Q, K, V, num_heads,
                                        edge_drop_rate=edge_drop_rate,
                                        training=training,
                                        dropout_key=dropout_key)
        h_heads = h_flat.reshape(num_nodes, num_heads, d_v)
    elif isinstance(ell_layout, GatEllLayout) and d_q == d_v:
        # Fully fused scatter-free path (ops/ell_attention.py): SDDMM with
        # row-aligned Q (no Q gather), dense slot-lane softmax + sorted tail,
        # weighted ELL aggregation, transpose-ELL backward. See
        # benchmarks/gat_breakdown.py for why each segment/scatter phase of
        # the un-fused pipeline was the bottleneck.
        h_flat = gat_attention_ell(ell_layout, Q, K, V, num_heads,
                                   edge_drop_rate=edge_drop_rate,
                                   training=training, dropout_key=dropout_key)
        h_heads = h_flat.reshape(num_nodes, num_heads, d_v)
    elif ell_layout is not None:
        # Merged-head fast path: all tensors stay full-width [·, H·d]
        # (128-lane friendly — per-head [·, d≤32] layouts pad 4-16× on TPU).
        # SDDMM via two wide gathers + blockwise reduce; softmax head-major
        # ([H, E]: heads on sublanes, edges on lanes); aggregation as ONE
        # dynamic-value multi-head ELL pass (ops/ell.py). Used when the
        # query/key head width differs from the value head width (the fused
        # kernel requires them equal).
        from ...ops.ell import ell_spmm_multihead

        ell = (ell_layout.ell if isinstance(ell_layout, GatEllLayout)
               else ell_layout)
        prod = (jnp.take(Q, safe_row, axis=0) * jnp.take(K, safe_col, axis=0))
        att_he = prod.reshape(E, num_heads, d_q).sum(-1).T / scale   # [H, E]
        att_he = jax.vmap(lambda a: segment_softmax(
            a, row, num_nodes, indices_are_sorted=True))(att_he)
        if training and edge_drop_rate > 0.0 and dropout_key is not None:
            keep = jax.random.bernoulli(dropout_key, 1.0 - edge_drop_rate,
                                        att_he.shape)
            att_he = jnp.where(keep, att_he / (1.0 - edge_drop_rate), 0.0)
        h_flat = ell_spmm_multihead(ell, att_he.T, V, d_v)   # [N, H·d_v]
        h_heads = h_flat.reshape(num_nodes, num_heads, d_v)
    else:
        # SDDMM: per-edge, per-head score (gat.py:78-79)
        att = jnp.sum(jnp.take(Qh, safe_row, axis=0)
                      * jnp.take(Kh, safe_col, axis=0), axis=-1) / scale  # [E, H]
        # softmax over each destination's incoming edges, across heads
        att = segment_softmax(att, row, num_nodes)
        if training and edge_drop_rate > 0.0 and dropout_key is not None:
            keep = jax.random.bernoulli(dropout_key, 1.0 - edge_drop_rate,
                                        att.shape)
            att = jnp.where(keep, att / (1.0 - edge_drop_rate), 0.0)
        # attention-weighted aggregation (gat.py:89): [E, H, d_v] → [N, H, d_v]
        msg = jnp.take(Vh, safe_col, axis=0) * att[:, :, None]
        h_heads = segment_sum(msg.reshape(E, num_heads * d_v), row, num_nodes)
        h_heads = h_heads.reshape(num_nodes, num_heads, d_v)

    if split_value_heads:
        h = h_heads.reshape(num_nodes, num_heads * d_v)  # concat (gat.py:111-112)
    else:
        h = jnp.mean(h_heads, axis=1)  # mean of heads (gat.py:113-114)

    if bias is not None:
        h = h + bias
    if activation is not None:
        h = activation(h)
    return h
