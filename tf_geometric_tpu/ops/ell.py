"""ELL-packed SpMM — the production sparse format for TPU.

Why: XLA's COO gather+scatter SpMM on TPU is **transaction-bound** — each
random row access costs ~4-5ns regardless of row width, and the unsorted
scatter serializes. Measured on a v5e for an ogbn-arxiv-scale graph
(1.33M edges, F=128): unsorted COO 23.3ms → row-sorted COO 14.5ms → ELL(K=8)
5.67ms (235M edges/s), a 4.1× end-to-end kernel speedup. The ELL layout

    slots_col/slots_val: [N, K]   (first K in-edges of each row; pad → row 0 / 0.0)
    tail: row-sorted COO of the overflow edges

turns the per-destination reduction into K dense gathers + adds (no scatter
at all) with a small sorted-COO tail. K defaults to ~mean degree (the
measured optimum; larger K wastes gathers on padding, smaller K grows the
expensive tail).

Backward: dh = Aᵀ·dy uses a precomputed *transpose ELL* of the same graph;
d(value) is a per-slot SDDMM (gathers only). Both directions scatter-free.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.union_utils import convert_union_to_numpy

__all__ = ["EllAdj", "build_ell_arrays", "ell_spmm", "ell_spmm_multihead"]


def build_ell_arrays(rows, cols, vals, num_rows: int, num_cols: int, K: int,
                     edge_ids=None, eid_sentinel=None):
    """Host-side ELL packing (vectorized numpy): first K edges per row into
    slots, overflow into a row-sorted COO tail padded to a multiple of 128.

    Also returns the **slot↔edge-id maps** (``slot_eid [N, K]``,
    ``tail_eid``): which original edge fills each slot (sentinel = number of
    edges for padding). These make per-step *dynamic* edge values (attention
    weights, edge dropout) a cheap scalar gather while keeping the packed
    layout static.
    """
    if edge_ids is None:
        edge_ids = np.arange(len(rows), dtype=np.int64)
    num_edges_sentinel = (int(eid_sentinel) if eid_sentinel is not None
                          else int(edge_ids.max(initial=-1)) + 1)
    from .. import native
    if native.available():
        packed = native.ell_pack(rows, cols, vals, edge_ids, num_rows, K,
                                 num_edges_sentinel)
        if packed is not None:
            slots_col, slots_val, slot_eid, tr, tc, tv, te = packed
            pad = (-len(tr)) % 128
            if pad:
                tr = np.concatenate([tr, np.full(pad, num_rows, np.int32)])
                tc = np.concatenate([tc, np.zeros(pad, np.int32)])
                tv = np.concatenate([tv, np.zeros(pad, np.float32)])
                te = np.concatenate([te, np.full(pad, num_edges_sentinel, np.int32)])
            return (slots_col, slots_val, tr, tc, tv, slot_eid, te)
    order = np.argsort(rows, kind="stable")
    r, c, v, e = rows[order], cols[order], vals[order], edge_ids[order]
    counts = np.bincount(r, minlength=num_rows) if len(r) else np.zeros(num_rows, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(r)) - starts[r] if len(r) else np.zeros(0, np.int64)
    in_ell = pos < K
    slots_col = np.zeros((num_rows, K), np.int32)
    slots_val = np.zeros((num_rows, K), np.float32)
    slot_eid = np.full((num_rows, K), num_edges_sentinel, np.int32)
    slots_col[r[in_ell], pos[in_ell]] = c[in_ell]
    slots_val[r[in_ell], pos[in_ell]] = v[in_ell]
    slot_eid[r[in_ell], pos[in_ell]] = e[in_ell]
    tr, tc, tv, te = r[~in_ell], c[~in_ell], v[~in_ell], e[~in_ell]
    # pad the tail to a bucket boundary so repeated builds hit the jit cache
    pad = (-len(tr)) % 128
    if pad:
        tr = np.concatenate([tr, np.full(pad, num_rows, np.int64)])
        tc = np.concatenate([tc, np.zeros(pad, np.int64)])
        tv = np.concatenate([tv, np.zeros(pad, np.float32)])
        te = np.concatenate([te, np.full(pad, num_edges_sentinel, np.int64)])
    return (slots_col, slots_val, tr.astype(np.int32), tc.astype(np.int32),
            tv.astype(np.float32), slot_eid, te.astype(np.int32))


def _choose_k(num_edges: int, num_rows: int) -> int:
    mean_deg = max(1.0, num_edges / max(num_rows, 1))
    k = 1
    while k < mean_deg and k < 32:
        k *= 2
    return k


def _ell_matmul_raw(slots_col, slots_val, tail_row, tail_col, tail_val,
                    h, num_rows: int, diag_val=None):
    """K dense gathers + sorted-COO tail; no scatter for the slot part.

    ``diag_val`` ([num_rows] or zero-length): self-loop values split out of
    the packed layout — a pure elementwise multiply-add, no gather at all.
    Gathers are transaction-bound (~3-15 ns/row, benchmarks/gather_locality.py)
    so removing the ~13% of edges that are self-loops in a normalized
    adjacency is a direct win. Only valid for square matrices.
    """
    K = slots_col.shape[1]
    n_src = h.shape[0]
    out = jnp.zeros((num_rows,) + h.shape[1:], h.dtype)
    for k in range(K):
        col_k = jnp.clip(slots_col[:, k], 0, n_src - 1)
        out = out + jnp.take(h, col_k, axis=0) * slots_val[:, k:k + 1].astype(h.dtype)
    if tail_row.shape[0]:
        safe_tc = jnp.clip(tail_col, 0, n_src - 1)
        tmsg = jnp.take(h, safe_tc, axis=0) * tail_val[:, None].astype(h.dtype)
        out = out + jax.ops.segment_sum(tmsg, tail_row, num_segments=num_rows,
                                        indices_are_sorted=True)
    if diag_val is not None and diag_val.shape[0]:
        out = out + h * diag_val[:, None].astype(h.dtype)
    return out


# custom VJP: nondiff args = static sizes; index/eid arrays are ordinary
# array args with None cotangents; transpose arrays are residual inputs used
# only in backward.
def _ell_spmm_impl(slots_col, tail_row, tail_col, t_slots_col, t_tail_row,
                   t_tail_col, slot_eid, tail_eid, diag_eid,
                   num_rows, num_cols, num_edges,
                   slots_val, tail_val, t_slots_val, t_tail_val, diag_val, h):
    return _ell_matmul_raw(slots_col, slots_val, tail_row, tail_col, tail_val,
                           h, num_rows, diag_val)


_ell_spmm_vjp = jax.custom_vjp(_ell_spmm_impl, nondiff_argnums=(9, 10, 11))


def _ell_fwd(slots_col, tail_row, tail_col, t_slots_col, t_tail_row, t_tail_col,
             slot_eid, tail_eid, diag_eid, num_rows, num_cols, num_edges,
             slots_val, tail_val, t_slots_val, t_tail_val, diag_val, h):
    out = _ell_matmul_raw(slots_col, slots_val, tail_row, tail_col, tail_val,
                          h, num_rows, diag_val)
    return out, (slots_col, tail_row, tail_col, t_slots_col, t_tail_row,
                 t_tail_col, slot_eid, tail_eid, diag_eid,
                 slots_val, tail_val, t_slots_val, t_tail_val, diag_val, h)


def _ell_bwd(num_rows, num_cols, num_edges, residuals, dy):
    (slots_col, tail_row, tail_col, t_slots_col, t_tail_row, t_tail_col,
     slot_eid, tail_eid, diag_eid,
     slots_val, tail_val, t_slots_val, t_tail_val, diag_val, h) = residuals
    # dh = Aᵀ dy via the transpose ELL (scatter-free again); the diagonal of
    # Aᵀ is the same diag_val
    dh = _ell_matmul_raw(t_slots_col, t_slots_val, t_tail_row, t_tail_col,
                         t_tail_val, dy, num_cols, diag_val)
    # value grads: per-slot SDDMM (gathers only)
    n_src = h.shape[0]
    d_slots_val = jnp.stack([
        jnp.sum(dy * jnp.take(h, jnp.clip(slots_col[:, k], 0, n_src - 1), axis=0),
                axis=-1)
        for k in range(slots_col.shape[1])], axis=1).astype(slots_val.dtype)
    # padded slots get spurious grads; the eid maps are the exact mask (a
    # real edge whose current value happens to be 0 keeps its gradient)
    d_slots_val = jnp.where(slot_eid < num_edges, d_slots_val, 0.0)
    if tail_row.shape[0]:
        safe_tr = jnp.clip(tail_row, 0, num_rows - 1)
        d_tail_val = jnp.sum(
            jnp.take(dy, safe_tr, axis=0)
            * jnp.take(h, jnp.clip(tail_col, 0, n_src - 1), axis=0), axis=-1)
        d_tail_val = jnp.where(tail_eid < num_edges,
                               d_tail_val, 0.0).astype(tail_val.dtype)
    else:
        d_tail_val = jnp.zeros_like(tail_val)
    if diag_val.shape[0]:
        d_diag_val = jnp.sum(dy * h, axis=-1).astype(diag_val.dtype)
        d_diag_val = jnp.where(diag_eid < num_edges, d_diag_val, 0.0)
    else:
        d_diag_val = jnp.zeros_like(diag_val)
    # index/eid arrays: no cotangents; transpose values mirror primal values
    return (None, None, None, None, None, None, None, None, None,
            d_slots_val, d_tail_val,
            jnp.zeros_like(t_slots_val), jnp.zeros_like(t_tail_val),
            d_diag_val, dh)


_ell_spmm_vjp.defvjp(_ell_fwd, _ell_bwd)


# -- values-constant variant ------------------------------------------------
# Most uses treat the normalized adjacency as a constant (the reference's
# cache semantics); skipping the d(value) SDDMM saves a full SpMM-worth of
# gathers per layer in backward. Values ride as residuals, only h is diff.

def _ell_spmm_honly_impl(slots_col, tail_row, tail_col, t_slots_col, t_tail_row,
                         t_tail_col, num_rows, num_cols,
                         slots_val, tail_val, t_slots_val, t_tail_val,
                         diag_val, h):
    return _ell_matmul_raw(slots_col, slots_val, tail_row, tail_col, tail_val,
                           h, num_rows, diag_val)


_ell_spmm_honly = jax.custom_vjp(_ell_spmm_honly_impl, nondiff_argnums=(6, 7))


def _ell_honly_fwd(slots_col, tail_row, tail_col, t_slots_col, t_tail_row,
                   t_tail_col, num_rows, num_cols,
                   slots_val, tail_val, t_slots_val, t_tail_val, diag_val, h):
    out = _ell_matmul_raw(slots_col, slots_val, tail_row, tail_col, tail_val,
                          h, num_rows, diag_val)
    return out, (t_slots_col, t_tail_row, t_tail_col, t_slots_val, t_tail_val,
                 diag_val)


def _ell_honly_bwd(num_rows, num_cols, residuals, dy):
    (t_slots_col, t_tail_row, t_tail_col, t_slots_val, t_tail_val,
     diag_val) = residuals
    dh = _ell_matmul_raw(t_slots_col, t_slots_val, t_tail_row, t_tail_col,
                         t_tail_val, dy, num_cols, diag_val)
    return (None, None, None, None, None, None, None, None, None, None,
            None, dh)


_ell_spmm_honly.defvjp(_ell_honly_fwd, _ell_honly_bwd)


# -- multi-head dynamic-value variant ---------------------------------------
# GAT-style aggregation: per-edge values are an H-vector (one weight per
# head) and the dense operand packs heads along the feature dim [N, H·d].
# Head weights broadcast across their d-wide block via jnp.repeat, so all
# gathers stay full-width (128-lane friendly) instead of H separate [N, d]
# passes (which pad 4-16x on TPU and stack huge residuals under scan).

def _mh_expand(a, d_head: int):
    """[M, H] → [M, H·d]: each head's scalar repeated across its block."""
    return jnp.repeat(a, d_head, axis=-1)


def _mh_forward(slots_col, slot_eid, tail_row, tail_col, tail_eid,
                num_rows, att_pad, v, d_head, diag_eid=None):
    n_src = v.shape[0]
    K = slots_col.shape[1]

    # fori_loop keeps the emitted HLO O(1) in K (unrolling K gathers in both
    # fwd and the custom bwd made the program large enough to stall the
    # remote TPU compile service)
    def body(k, out):
        eid_k = jax.lax.dynamic_index_in_dim(slot_eid, k, axis=1, keepdims=False)
        col_k = jax.lax.dynamic_index_in_dim(slots_col, k, axis=1, keepdims=False)
        a_k = jnp.take(att_pad, jnp.clip(eid_k, 0, att_pad.shape[0] - 1), axis=0)
        gathered = jnp.take(v, jnp.clip(col_k, 0, n_src - 1), axis=0)
        return out + gathered * _mh_expand(a_k, d_head).astype(v.dtype)

    out = jax.lax.fori_loop(0, K, body,
                            jnp.zeros((num_rows, v.shape[1]), v.dtype))
    if tail_row.shape[0]:
        t_a = jnp.take(att_pad, jnp.clip(tail_eid, 0, att_pad.shape[0] - 1), axis=0)
        msg = jnp.take(v, jnp.clip(tail_col, 0, n_src - 1), axis=0) \
            * _mh_expand(t_a, d_head).astype(v.dtype)
        out = out + jax.ops.segment_sum(msg, tail_row, num_segments=num_rows,
                                        indices_are_sorted=True)
    if diag_eid is not None and diag_eid.shape[0]:
        # split-out self-loops: col == row, so v is row-ALIGNED — only the
        # narrow per-edge weight is fetched (no wide gather at all)
        a_d = jnp.take(att_pad, jnp.clip(diag_eid, 0, att_pad.shape[0] - 1),
                       axis=0)
        out = out + v * _mh_expand(a_d, d_head).astype(v.dtype)
    return out


def _mh_impl(slots_col, slot_eid, tail_row, tail_col, tail_eid,
             t_slots_col, t_slot_eid, t_tail_row, t_tail_col, t_tail_eid,
             diag_eid, num_rows, num_cols, num_edges, d_head, att, v):
    att_pad = jnp.concatenate([att, jnp.zeros((1, att.shape[1]), att.dtype)])
    return _mh_forward(slots_col, slot_eid, tail_row, tail_col, tail_eid,
                       num_rows, att_pad, v, d_head, diag_eid)


_mh_vjp = jax.custom_vjp(_mh_impl, nondiff_argnums=(11, 12, 13, 14))


def _mh_fwd(slots_col, slot_eid, tail_row, tail_col, tail_eid,
            t_slots_col, t_slot_eid, t_tail_row, t_tail_col, t_tail_eid,
            diag_eid, num_rows, num_cols, num_edges, d_head, att, v):
    out = _mh_impl(slots_col, slot_eid, tail_row, tail_col, tail_eid,
                   t_slots_col, t_slot_eid, t_tail_row, t_tail_col, t_tail_eid,
                   diag_eid, num_rows, num_cols, num_edges, d_head, att, v)
    return out, (slots_col, slot_eid, tail_row, tail_col, tail_eid,
                 t_slots_col, t_slot_eid, t_tail_row, t_tail_col, t_tail_eid,
                 diag_eid, att, v)


def _mh_bwd(num_rows, num_cols, num_edges, d_head, residuals, dy):
    (slots_col, slot_eid, tail_row, tail_col, tail_eid,
     t_slots_col, t_slot_eid, t_tail_row, t_tail_col, t_tail_eid,
     diag_eid, att, v) = residuals
    H = att.shape[1]
    att_pad = jnp.concatenate([att, jnp.zeros((1, H), att.dtype)])
    # dv = Aᵀ_w dy via the transpose layout (same per-edge weights; the
    # transpose diagonal is the same diag_eid)
    dv = _mh_forward(t_slots_col, t_slot_eid, t_tail_row, t_tail_col, t_tail_eid,
                     num_cols, att_pad, dy, d_head, diag_eid)
    # d_att[e, h] = <dy[row_e] block h, v[col_e] block h>
    n_src = v.shape[0]
    K = slots_col.shape[1]

    def body(k, d_att):
        eid_k = jax.lax.dynamic_index_in_dim(slot_eid, k, axis=1, keepdims=False)
        col_k = jax.lax.dynamic_index_in_dim(slots_col, k, axis=1, keepdims=False)
        prod = dy * jnp.take(v, jnp.clip(col_k, 0, n_src - 1), axis=0)  # [N, H·d]
        d_slot = prod.reshape(num_rows, H, d_head).sum(-1)              # [N, H]
        return d_att.at[eid_k].add(d_slot.astype(att.dtype), mode="drop")

    d_att = jax.lax.fori_loop(0, K, body,
                              jnp.zeros((num_edges + 1, H), att.dtype))
    if tail_row.shape[0]:
        t_prod = (jnp.take(dy, jnp.clip(tail_row, 0, num_rows - 1), axis=0)
                  * jnp.take(v, jnp.clip(tail_col, 0, n_src - 1), axis=0))
        d_t = t_prod.reshape(-1, H, d_head).sum(-1)
        d_att = d_att.at[tail_eid].add(d_t.astype(att.dtype), mode="drop")
    if diag_eid.shape[0]:
        d_d = (dy * v).reshape(num_rows, H, d_head).sum(-1)  # row-aligned
        d_att = d_att.at[diag_eid].add(d_d.astype(att.dtype), mode="drop")
    return (None, None, None, None, None, None, None, None, None, None, None,
            d_att[:num_edges], dv)


_mh_vjp.defvjp(_mh_fwd, _mh_bwd)


def ell_spmm_multihead(ell: "EllAdj", edge_att, v, d_head: int):
    """Attention-weighted multi-head aggregation on the packed layout.

    edge_att: [E, H] per-edge per-head weights (post-softmax);
    v: [N, H·d_head] head-blocked values. Returns [num_rows, H·d_head].
    Split-out self-loops (``split_diag``) aggregate row-aligned — no gather.
    """
    return _mh_vjp(ell.slots_col, ell.slot_eid, ell.tail_row, ell.tail_col,
                   ell.tail_eid, ell.t_slots_col, ell.t_slot_eid,
                   ell.t_tail_row, ell.t_tail_col, ell.t_tail_eid,
                   ell.diag_eid, ell.shape[0], ell.shape[1], ell.num_edges,
                   d_head, edge_att, v)


def ell_spmm(ell: "EllAdj", h, diff_values: bool = False, compute_dtype=None):
    """A @ h with the ELL layout. ``diff_values=True`` additionally produces
    per-slot value cotangents (an extra SDDMM in backward); the default
    treats the adjacency as constant — the common cached-normalization case.

    ``compute_dtype`` (or the global ``ops.config.ell_compute_dtype``) runs
    the gather/accumulate in a lower precision (bf16 ≈ 1.6× at F≥256) and
    casts the result back to ``h.dtype``.
    """
    from . import config as _config
    cd = compute_dtype if compute_dtype is not None else _config.ell_compute_dtype
    orig_dtype = h.dtype
    if cd is not None and orig_dtype != cd:
        h = h.astype(cd)
    if diff_values:
        if ell.slot_eid is not None and ell.num_edges is not None:
            slot_eid, tail_eid, num_edges = ell.slot_eid, ell.tail_eid, ell.num_edges
            diag_eid = ell.diag_eid
        else:  # eid-less hand-built layout: value != 0 approximates validity
            num_edges = 1
            slot_eid = jnp.where(ell.slots_val != 0, 0, 1).astype(jnp.int32)
            tail_eid = jnp.where(ell.tail_val != 0, 0, 1).astype(jnp.int32)
            diag_eid = jnp.where(ell.diag_val != 0, 0, 1).astype(jnp.int32)
        out = _ell_spmm_vjp(
            ell.slots_col, ell.tail_row, ell.tail_col,
            ell.t_slots_col, ell.t_tail_row, ell.t_tail_col,
            slot_eid, tail_eid, diag_eid,
            ell.shape[0], ell.shape[1], num_edges,
            ell.slots_val, ell.tail_val, ell.t_slots_val, ell.t_tail_val,
            ell.diag_val, h)
    else:
        out = _ell_spmm_honly(
            ell.slots_col, ell.tail_row, ell.tail_col,
            ell.t_slots_col, ell.t_tail_row, ell.t_tail_col,
            ell.shape[0], ell.shape[1],
            ell.slots_val, ell.tail_val, ell.t_slots_val, ell.t_tail_val,
            ell.diag_val, h)
    if cd is not None and orig_dtype != cd:
        out = out.astype(orig_dtype)
    return out


@jax.tree_util.register_pytree_node_class
class EllAdj:
    """Dual (forward + transpose) ELL-packed sparse adjacency.

    Duck-types the slice of the SparseMatrix interface the conv ops use
    (``matmul`` / ``@`` / ``dropout``), so normalization caches can hand an
    EllAdj to any propagation loop transparently.
    """

    __slots__ = ("slots_col", "slots_val", "tail_row", "tail_col", "tail_val",
                 "t_slots_col", "t_slots_val", "t_tail_row", "t_tail_col",
                 "t_tail_val", "slot_eid", "tail_eid", "t_slot_eid",
                 "t_tail_eid", "diag_val", "diag_eid", "_shape", "_num_edges")

    _LEAVES = ("slots_col", "slots_val", "tail_row", "tail_col", "tail_val",
               "t_slots_col", "t_slots_val", "t_tail_row", "t_tail_col",
               "t_tail_val", "slot_eid", "tail_eid", "t_slot_eid", "t_tail_eid",
               "diag_val", "diag_eid")

    def __init__(self, **kw):
        for name in self._LEAVES:
            setattr(self, name, kw.get(name))
        if self.diag_val is None:  # no split diagonal: zero-length arrays
            self.diag_val = jnp.zeros((0,), jnp.float32)
            self.diag_eid = jnp.zeros((0,), jnp.int32)
        self._shape = tuple(kw["shape"])
        self._num_edges = kw.get("num_edges")

    def tree_flatten(self):
        return (tuple(getattr(self, n) for n in self._LEAVES),
                (self._shape, self._num_edges))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        for n, c in zip(cls._LEAVES, children):
            setattr(obj, n, c)
        obj._shape, obj._num_edges = aux
        return obj

    @property
    def shape(self):
        return self._shape

    @property
    def num_edges(self):
        return self._num_edges

    @classmethod
    def from_coo(cls, index, value, shape, k: Optional[int] = None,
                 split_diag: bool = False) -> "EllAdj":
        """Host-side build from concrete COO arrays (eager only).

        ``slot_eid`` maps refer to positions in the **original** (unfiltered)
        edge array, so per-step values indexed like the input edge list slot
        straight in via :meth:`with_edge_values`.

        ``split_diag`` (square matrices only) pulls self-loop edges out of
        the packed layout into a dense ``diag_val [N]`` applied as an
        elementwise multiply-add — saves their gather transactions entirely
        (normalized GCN adjacencies are ~13% self-loops). Used by the GCN
        normalization cache; the GAT layout keeps self-loops packed because
        attention needs their scores inside the softmax.
        """
        index = convert_union_to_numpy(index, np.int64)
        value = convert_union_to_numpy(value, np.float32)
        if value is None:
            value = np.ones(index.shape[1], np.float32)
        num_rows, num_cols = int(shape[0]), int(shape[1])
        num_edges = index.shape[1]
        # drop out-of-range (padded) edges before packing
        ok = ((index[0] >= 0) & (index[0] < num_rows)
              & (index[1] >= 0) & (index[1] < num_cols))
        diag_val = diag_eid = None
        if split_diag:
            if num_rows != num_cols:
                raise ValueError("split_diag requires a square matrix")
            # split exactly ONE diagonal entry per row (the first); duplicate
            # self-loops stay packed so with_edge_values re-skins exactly
            d_idx = np.nonzero(ok & (index[0] == index[1]))[0]
            if len(d_idx) == 0:
                pass  # no diagonal entries: skip the dense diag pass entirely
            else:
                d_rows = index[0][d_idx].astype(np.int64)
                uniq_rows, first_pos = np.unique(d_rows, return_index=True)
                chosen = d_idx[first_pos]
                dv = np.zeros(num_rows, np.float32)
                de = np.full(num_rows, num_edges, np.int64)
                dv[uniq_rows] = value[chosen]
                de[uniq_rows] = chosen
                diag_val, diag_eid = jnp.asarray(dv), jnp.asarray(de, jnp.int32)
                ok = ok.copy()
                ok[chosen] = False
        rows, cols, vals = index[0][ok], index[1][ok], value[ok]
        eids = np.nonzero(ok)[0].astype(np.int64)
        if k is None:
            k = _choose_k(len(rows), num_rows)
        sc, sv, tr, tc, tv, se, te = build_ell_arrays(
            rows, cols, vals, num_rows, num_cols, k, edge_ids=eids,
            eid_sentinel=num_edges)
        tsc, tsv, ttr, ttc, ttv, tse, tte = build_ell_arrays(
            cols, rows, vals, num_cols, num_rows, k, edge_ids=eids,
            eid_sentinel=num_edges)
        return cls(slots_col=jnp.asarray(sc), slots_val=jnp.asarray(sv),
                   tail_row=jnp.asarray(tr), tail_col=jnp.asarray(tc),
                   tail_val=jnp.asarray(tv),
                   t_slots_col=jnp.asarray(tsc), t_slots_val=jnp.asarray(tsv),
                   t_tail_row=jnp.asarray(ttr), t_tail_col=jnp.asarray(ttc),
                   t_tail_val=jnp.asarray(ttv),
                   slot_eid=jnp.asarray(se), tail_eid=jnp.asarray(te),
                   t_slot_eid=jnp.asarray(tse), t_tail_eid=jnp.asarray(tte),
                   diag_val=diag_val, diag_eid=diag_eid,
                   shape=(num_rows, num_cols), num_edges=num_edges)

    def with_edge_values(self, edge_values) -> "EllAdj":
        """Re-skin the static layout with per-edge values (shape [E]).

        The slot↔edge maps keep forward and transpose consistent, so dynamic
        values (attention weights, per-step edge dropout) work exactly —
        and gradients flow back to ``edge_values`` through the gathers.
        """
        padded = jnp.concatenate([jnp.asarray(edge_values),
                                  jnp.zeros((1,), jnp.asarray(edge_values).dtype)])
        E = self._num_edges

        def pick(eid):
            return jnp.take(padded, jnp.clip(eid, 0, E), axis=0)

        kw = {n: getattr(self, n) for n in self._LEAVES}
        kw.update(slots_val=pick(self.slot_eid), tail_val=pick(self.tail_eid),
                  t_slots_val=pick(self.t_slot_eid),
                  t_tail_val=pick(self.t_tail_eid),
                  shape=self._shape, num_edges=E)
        if self.diag_val.shape[0]:
            # one self-loop per row assumed (true for normalized adjacencies)
            kw.update(diag_val=pick(self.diag_eid))
        return EllAdj(**kw)

    # -- SparseMatrix-compatible surface -------------------------------------
    def matmul(self, h, num_or_size_splits=None):
        from ..sparse.matrix import chunked_feature_matmul
        return chunked_feature_matmul(lambda c: ell_spmm(self, c), h,
                                      num_or_size_splits)

    def __matmul__(self, h):
        return ell_spmm(self, h)

    def dropout(self, rate: float, key=None, training: bool = True) -> "EllAdj":
        """Edge dropout is NOT supported on the packed layout: the forward and
        transpose value arrays would need a consistent per-edge mask, which
        requires the slot↔transpose-slot permutation. Callers (see
        ``nn/conv/gcn.py``) fall back to the COO path when training with
        ``edge_drop_rate > 0``; inference passes through unchanged."""
        if not training or rate <= 0.0 or key is None:
            return self
        raise NotImplementedError(
            "edge dropout on EllAdj — use the COO SparseMatrix path")

    def __repr__(self):
        return (f"EllAdj(shape={self._shape}, K={self.slots_col.shape[1]}, "
                f"tail={self.tail_row.shape[0]})")
