"""GCN: normalization precompute + forward (reference: nn/conv/gcn.py).

The forward is the canonical hot path (SURVEY §3.1): dense XW on the MXU,
then one SpMM ``Â @ h``. Normalization (``gcn_norm_adj``) is a pure
precompute producing a new SparseMatrix; the per-graph ``cache`` dict keyed by
the config string (gcn.py:9-20) makes it O(1) after the first call, and since
cached values are concrete arrays, ``jit`` captures them as constants —
the same trick the reference plays with numpy triples (gcn.py:126-128).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...sparse.matrix import SparseMatrix, diags

__all__ = [
    "gcn",
    "gcn_norm_adj",
    "gcn_build_cache_by_adj",
    "gcn_build_cache_for_graph",
    "gcn_norm_edge",
    "gcn_cache_normed_edge",
    "gcn_mapper",
    "compute_cache_key",
]

CACHE_KEY_GCN_NORMED_ADJ_TEMPLATE = "gcn_normed_adj_{}_{}_{}_{}_{}"


def compute_cache_key(norm, add_self_loop, sym, renorm, improved):
    """Cache key over the full normalization config (gcn.py:12-20)."""
    return CACHE_KEY_GCN_NORMED_ADJ_TEMPLATE.format(norm, add_self_loop, sym, renorm, improved)


def _inv_pow_no_nan(deg, power):
    """deg**power with inf/nan→0 (gcn.py:23-29): isolated nodes get weight 0."""
    out = jnp.where(deg > 0, jnp.power(jnp.maximum(deg, 1e-38), power), 0.0)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def _scale_rows_cols(adj: SparseMatrix, row_scale=None, col_scale=None) -> SparseMatrix:
    """diag(row_scale) @ A @ diag(col_scale) without materializing diagonals."""
    value = adj.value
    n_rows, n_cols = adj.shape
    if row_scale is not None:
        value = value * jnp.take(row_scale, jnp.clip(adj.row, 0, n_rows - 1))
    if col_scale is not None:
        value = value * jnp.take(col_scale, jnp.clip(adj.col, 0, n_cols - 1))
    return adj.with_value(value)


def gcn_norm_adj(sparse_adj: SparseMatrix, norm: str = "both", add_self_loop: bool = True,
                 sym: bool = True, renorm: bool = True, improved: bool = False,
                 cache: Optional[dict] = None) -> SparseMatrix:
    """GCN adjacency normalization (gcn.py:32-130).

    norm="both": D^-1/2 (A [+I]) D^-1/2 — self-loop added *before* the norm
    when ``renorm`` (the renormalization trick), *after* otherwise.
    norm="left"/"right": D^-1 scaling (the reference computes ``pow(deg, -1)``
    of the axis=-1 degree for both modes — we match that behavior).
    ``improved`` uses self-loop weight 2.0. Isolated nodes normalize to 0.
    """
    if cache is not None:
        cache_key = compute_cache_key(norm, add_self_loop, sym, renorm, improved)
        cached = cache.get(cache_key, None)
        if cached is not None:
            return SparseMatrix(cached[0], cached[1], cached[2])

    fill_weight = 2.0 if improved else 1.0

    if sparse_adj.shape[0] != sparse_adj.shape[1]:
        if add_self_loop:
            raise ValueError("add_self_loop=True requires a square adjacency")
        if sym:
            raise ValueError("sym=True requires a square adjacency")

    if add_self_loop and norm != "both":
        sparse_adj = sparse_adj.add_diag(fill_weight)

    if norm == "both":
        if add_self_loop and renorm:
            sparse_adj = sparse_adj.add_diag(fill_weight)
        row_deg = sparse_adj.segment_sum(axis=-1)
        row_scale = _inv_pow_no_nan(row_deg, -0.5)
        if sym:
            col_scale = row_scale
        else:
            col_deg = sparse_adj.segment_sum(axis=0)
            col_scale = _inv_pow_no_nan(col_deg, -0.5)
        normed = _scale_rows_cols(sparse_adj, row_scale, col_scale)
        if add_self_loop and not renorm:
            normed = normed.add_diag(fill_weight)
    elif norm == "left":
        row_deg = sparse_adj.segment_sum(axis=-1)
        normed = _scale_rows_cols(sparse_adj, _inv_pow_no_nan(row_deg, -1.0), None)
    elif norm == "right":
        # reference computes the axis=-1 degree here too (gcn.py:113)
        col_deg = sparse_adj.segment_sum(axis=-1)
        normed = _scale_rows_cols(sparse_adj, None, _inv_pow_no_nan(col_deg, -1.0))
    else:
        raise ValueError(f"wrong GCN norm type: {norm}")

    if cache is not None:
        if isinstance(normed.value, jax.core.Tracer):
            raise RuntimeError(
                "cache must be built eagerly before jit-tracing the forward "
                "(call gcn_build_cache_for_graph first, mirroring gcn.py:58-59)")
        # store concrete arrays so jit captures them as constants
        cache[cache_key] = (jax.device_get(normed.index),
                            jax.device_get(normed.value), normed.shape)
    return normed


def gcn_build_cache_by_adj(sparse_adj: SparseMatrix, norm="both", add_self_loop=True,
                           sym=True, renorm=True, improved=False, override=False,
                           cache: Optional[dict] = None) -> dict:
    """Populate ``cache`` with the normed adjacency (gcn.py:133-152)."""
    if cache is None:
        cache = {}
    elif override:
        key = compute_cache_key(norm, add_self_loop, sym, renorm, improved)
        cache[key] = None
        # derived entries are builds OF the base normalization — a rebuild
        # must invalidate them too or maybe_compile_ell / the propagated-
        # feature path keep serving the old adjacency
        cache.pop(key + ":ell", None)
        cache.pop(key + ":propagated", None)
    gcn_norm_adj(sparse_adj, norm, add_self_loop, sym, renorm, improved, cache)
    return cache


def gcn_build_cache_for_graph(graph, norm="both", add_self_loop=True, sym=True,
                              renorm=True, improved=False, override=False) -> dict:
    """Build the normed-adj cache on a Graph (gcn.py:155-169)."""
    graph.cache = gcn_build_cache_by_adj(
        graph.adj(), norm=norm, add_self_loop=add_self_loop, sym=sym,
        renorm=renorm, improved=improved, override=override, cache=graph.cache)
    return graph.cache


def gcn_norm_edge(edge_index, num_nodes, edge_weight=None, renorm=True,
                  improved=False, cache: Optional[dict] = None):
    """Deprecated edge-tuple API (gcn.py:180-197)."""
    sparse_adj = SparseMatrix(edge_index, edge_weight, (num_nodes, num_nodes))
    normed = gcn_norm_adj(sparse_adj, renorm=renorm, improved=improved, cache=cache)
    return normed.index, normed.value


def gcn_cache_normed_edge(graph, renorm=True, improved=False, override=False):
    """Deprecated cache builder (gcn.py:201-218)."""
    if override:
        graph.cache[compute_cache_key("both", True, True, renorm, improved)] = None
    gcn_norm_edge(graph.edge_index, graph.num_nodes, graph.edge_weight,
                  renorm, improved, graph.cache)


def compile_and_dropout(normed_adj, cache, cache_key: str, edge_drop_rate: float,
                        dropout_key, training: bool):
    """Shared ELL-compile + edge-dropout step for the propagation family.

    Training with dropout uses the **dynamic-value ELL** path when available:
    bernoulli mask on the per-edge values, re-skinned onto the static packed
    layout via the slot↔edge-id maps (fwd and transpose stay consistent);
    otherwise falls back to COO value dropout. Inference just compiles."""
    if training and edge_drop_rate > 0.0 and dropout_key is None:
        raise ValueError(
            "edge dropout requires a PRNG key when training with "
            "edge_drop_rate > 0 — pass dropout_key= (functional API) or "
            "rngs={'dropout': key} (layers); a silent no-op would train "
            "unregularized (same contract as drop_edge/gat_attention_ell)")
    if training and edge_drop_rate > 0.0:
        ell = maybe_compile_ell(normed_adj, cache, cache_key)
        from ...ops.ell import EllAdj
        from ...ops.ell_bucketed import BucketedEllAdj
        if isinstance(ell, BucketedEllAdj) or (
                isinstance(ell, EllAdj) and ell.slot_eid is not None):
            keep = jax.random.bernoulli(dropout_key, 1.0 - edge_drop_rate,
                                        normed_adj.value.shape)
            dropped = jnp.where(keep,
                                normed_adj.value / (1.0 - edge_drop_rate), 0.0)
            return ell.with_edge_values(dropped)
        return normed_adj.dropout(edge_drop_rate, key=dropout_key,
                                  training=training)
    return maybe_compile_ell(normed_adj, cache, cache_key)


def precompute_propagated_features(x, sparse_adj: SparseMatrix, norm="both",
                                   add_self_loop=True, sym=True, renorm=True,
                                   improved=False, cache: Optional[dict] = None):
    """Precompute ``P = Â·x`` for layers whose SpMM operand is constant.

    In transductive full-batch training the first GCN layer computes
    ``Â·(x W) = (Â·x)·W`` — associativity lets the SpMM run ONCE at
    preprocessing instead of every step (forward AND backward: the layer
    becomes a dense matmul against P). On a v5e at ogbn-arxiv scale this
    removes the single most expensive op of a 2-layer GCN step. Returns P
    and stores it in ``cache`` under the normalization key + ":propagated".
    """
    cache_key = compute_cache_key(norm, add_self_loop, sym, renorm, improved) \
        + ":propagated"
    if cache is not None:
        cached = cache.get(cache_key, None)
        if cached is not None:
            return jnp.asarray(cached)
    normed = gcn_norm_adj(sparse_adj, norm=norm, add_self_loop=add_self_loop,
                          sym=sym, renorm=renorm, improved=improved, cache=cache)
    normed = maybe_compile_ell(
        normed, cache, compute_cache_key(norm, add_self_loop, sym, renorm, improved))
    propagated = normed.matmul(x if not isinstance(x, SparseMatrix) else x.to_dense())
    if cache is not None and not isinstance(propagated, jax.core.Tracer):
        cache[cache_key] = jax.device_get(propagated)
    return propagated


def gcn_mapper(repeated_x, neighbor_x, edge_weight=None):
    """Edge-weight scaling mapper (gcn.py:221-222)."""
    return neighbor_x * jnp.expand_dims(edge_weight, -1)


def maybe_compile_ell(normed_adj, cache: Optional[dict], cache_key: str):
    """Attach/fetch an ELL-packed twin of a cached normalized adjacency.

    The ELL layout is TPU-optimal for the propagation SpMM (see
    ``ops/ell.py`` — ~4× over unsorted COO on v5e). Built host-side once per
    (graph, config) and stored in the same cache dict the reference threads
    everywhere; returns the COO matrix unchanged when no cache is available
    or the build must happen under tracing.
    """
    if cache is None:
        return normed_adj
    ell_key = cache_key + ":ell"
    ell = cache.get(ell_key, None)
    if ell is not None:
        return ell
    if isinstance(normed_adj.value, jax.core.Tracer):
        return normed_adj  # can't build host-side layouts while tracing
    from ...ops import config as _config
    # split_diag: a normalized adjacency with self-loops has ~N diagonal
    # entries (~13% of edges at arxiv scale) that become a free elementwise
    # multiply-add instead of gather transactions
    square = normed_adj.shape[0] == normed_adj.shape[1]
    if _config.ell_layout == "uniform":
        from ...ops.ell import EllAdj
        ell = EllAdj.from_coo(normed_adj.index, normed_adj.value,
                              normed_adj.shape, split_diag=square)
    else:
        # degree-bucketed slots where the sorted-segment tail is heavy
        # (per-direction cost choice; +31% on the headline GCN step —
        # ops/ell_bucketed.py, benchmarks/bucketed_ab.py)
        from ...ops.ell_bucketed import BucketedEllAdj
        ell = BucketedEllAdj.from_coo(
            normed_adj.index, normed_adj.value, normed_adj.shape,
            split_diag=square,
            layout="auto" if _config.ell_layout == "auto" else "bucketed")
    cache[ell_key] = ell
    return ell


def gcn(x, sparse_adj: SparseMatrix, kernel, bias=None, activation=None,
        norm: str = "both", add_self_loop: bool = True, sym: bool = True,
        renorm: bool = True, improved: bool = False, edge_drop_rate: float = 0.0,
        num_or_size_splits=None, training: bool = False, cache: Optional[dict] = None,
        dropout_key=None):
    """Functional GCN forward (gcn.py:225-291): Â = norm(A [+ I]); h = Â (x W) + b.

    ``x`` may be dense or a SparseMatrix (one-hot / sparse features,
    gcn.py:269-272); ``num_or_size_splits`` chunks the feature dim of the SpMM
    (gcn.py:274-280); ``edge_drop_rate`` applies dropout on Â's values
    (gcn.py:262) and requires ``dropout_key`` when training (functional PRNG).
    """
    normed_adj = gcn_norm_adj(sparse_adj, norm=norm, add_self_loop=add_self_loop,
                              sym=sym, renorm=renorm, improved=improved, cache=cache)

    if kernel is None:
        h = x
    elif isinstance(x, SparseMatrix):
        h = x.matmul(kernel)
    else:
        h = x @ kernel

    if isinstance(h, SparseMatrix):
        # sparse propagation operand (kernel=None with sparse features):
        # the ELL twin can't consume a SparseMatrix — keep the COO path
        if training and edge_drop_rate > 0.0 and dropout_key is not None:
            normed_adj = normed_adj.dropout(edge_drop_rate, key=dropout_key,
                                            training=training)
    else:
        normed_adj = compile_and_dropout(
            normed_adj, cache,
            compute_cache_key(norm, add_self_loop, sym, renorm, improved),
            edge_drop_rate, dropout_key, training)

    h = normed_adj.matmul(h, num_or_size_splits=num_or_size_splits)

    if bias is not None:
        h = h + bias
    if activation is not None:
        h = activation(h)
    return h
