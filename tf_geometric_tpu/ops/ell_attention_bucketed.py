"""Degree-bucketed fused GAT attention (generalizes ops/ell_attention.py).

The uniform-K fused kernel (ops/ell_attention.py) pays every wide gather
pass — K scores, V aggregation, V·dy (dã), K·ds (dQ), and the dy/Q
transpose pass — on N·K slot lanes plus a sorted tail. On the headline
graph (arxiv-like, K=8) only ~65% of those lanes hold real edges and ~25%
of edges overflow to the tail: every pass runs ~1.4× more gather rows than
edges. This kernel groups destination rows by degree with DP-optimal slot
widths (ops/ell_bucketed._optimal_caps) so lanes ≈ edges and the tail all
but disappears (max cap 256).

Cost of bucketing: Q is no longer row-aligned. The kernel works in a
*permuted row space* (groups concatenated, ordered by degree bucket):

    Q_p  = Q[perm]      one wide gather            (forward)
    dy_p = dy[perm]     one wide gather            (backward)
    out  = out_p[inv]   one wide gather            (forward)
    dQ   = dQ_p[inv]    one wide gather            (backward)

— 4 extra full-width [N, H·d] gather passes, against ~0.5M wasted lanes
removed from ~5 wide passes on the headline graph. The transpose (source)
side is grouped the same way; its gather indices are pre-composed with the
destination permutation on host, so backward reads dy_p/Q_p directly.
``perm=None`` on a side degenerates to the classic single-group layout
(no permutation, no unpermute) — the uniform kernel as a special case.

Reference semantics: nn/conv/gat.py:49-89 (score = <Q_row, K_col>/√d,
destination softmax over incoming edges, attention dropout, weighted SpMM).
Numerics match the segment-path oracle (tests/test_ell_attention_bucketed).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ell import _choose_k
from .ell_bucketed import _optimal_caps

__all__ = ["BucketedGatLayout", "build_gat_layout_bucketed",
           "gat_attention_bucketed"]

_NEG = -1e30  # large-negative instead of -inf keeps exp()/where() NaN-free


def _slot_loop(n_slots: int, body, init, flag: str = "ell_attention_unroll_all"):
    """Unrolled (default) or fori_loop slot iteration — see ops/ell_attention."""
    from . import config as _config
    if getattr(_config, flag):
        carry = init
        for k in range(n_slots):
            carry = body(k, carry)
        return carry
    return jax.lax.fori_loop(0, n_slots, body, init)


class GatGroup(NamedTuple):
    """One degree bucket of destination (or source) rows.

    Rows of this group occupy a contiguous slice of the permuted row space;
    ``slots_col`` holds source ids in ORIGINAL node space (gather targets
    never need permuting), ``slot_eid`` the edge id or the ``num_edges``
    sentinel for padding lanes. ``aux`` is the per-lane int32 payload of the
    transpose side (flat weight positions); None on the forward side.
    """
    slots_col: jnp.ndarray            # [Ng_pad, Kg] int32
    slot_eid: jnp.ndarray             # [Ng_pad, Kg] int32
    aux: Optional[jnp.ndarray]        # [Ng_pad, Kg] int32 or None


class GatSide(NamedTuple):
    """One direction of the attention matmul in permuted row space."""
    groups: Tuple[GatGroup, ...]
    perm: Optional[jnp.ndarray]       # [Np] original row per permuted pos
    inv_pos: Optional[jnp.ndarray]    # [num_rows] -> permuted pos (Np = none)
    tail_prow: jnp.ndarray            # [T] permuted row positions, sorted
    tail_col: jnp.ndarray             # [T] original col ids
    tail_eid: jnp.ndarray             # [T] edge ids (sentinel-padded)
    tail_aux: Optional[jnp.ndarray]   # [T] int32 (transpose side) or None


@jax.tree_util.register_pytree_node_class
class BucketedGatLayout:
    """Host-built dual-direction layout for the fused bucketed attention.

    A registered pytree whose static sizes live in aux data (NOT leaves) so
    they stay Python ints under jit — the kernel shapes depend on them.
    """

    __slots__ = ("fwd", "bwd", "num_rows", "num_cols", "num_edges",
                 "slot_total", "tail_total", "w_scatter_pos",
                 "bwd_flat_total")

    def __init__(self, fwd: GatSide, bwd: GatSide, num_rows: int,
                 num_cols: int, num_edges: int, slot_total: int,
                 tail_total: int, w_scatter_pos=None, bwd_flat_total: int = 0):
        self.fwd = fwd
        self.bwd = bwd
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.num_edges = num_edges
        self.slot_total = slot_total
        self.tail_total = tail_total
        # fwd flat weight lane -> bwd flat lane (transpose-scatter variant)
        self.w_scatter_pos = w_scatter_pos
        self.bwd_flat_total = bwd_flat_total

    def tree_flatten(self):
        return ((self.fwd, self.bwd, self.w_scatter_pos),
                (self.num_rows, self.num_cols, self.num_edges,
                 self.slot_total, self.tail_total, self.bwd_flat_total))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux[:5],
                   w_scatter_pos=children[2], bwd_flat_total=aux[5])

    def __repr__(self):
        def side_repr(s):
            caps = ",".join(str(g.slots_col.shape[1]) for g in s.groups)
            mode = "classic" if s.perm is None else "bucketed"
            return f"{mode}[{caps}]"
        return (f"BucketedGatLayout(N={self.num_rows}, E={self.num_edges}, "
                f"fwd={side_repr(self.fwd)}, bwd={side_repr(self.bwd)}, "
                f"tail={self.fwd.tail_prow.shape[0]})")


def _np_side(rows, cols, eids, num_rows, caps, num_edges, force_classic):
    """Host-side grouping. Returns numpy pieces + the eid→flat-position map
    (flat weight layout: group lanes concatenated, then tail, then zero row).
    """
    order = np.argsort(rows, kind="stable")
    r, c, e = rows[order], cols[order], eids[order]
    deg = (np.bincount(r, minlength=num_rows) if len(r)
           else np.zeros(num_rows, np.int64))
    starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
    pos = (np.arange(len(r)) - starts[r]) if len(r) else np.zeros(0, np.int64)

    if force_classic:
        # uniform K ≈ mean degree, one full-coverage group, overflow → tail
        # (the ops/ell_attention layout as a special case of this kernel)
        caps_arr = np.asarray([_choose_k(len(r), num_rows)], np.int64)
    else:
        caps_arr = np.asarray(caps if caps is not None else _optimal_caps(deg),
                              np.int64)
    bucket = np.searchsorted(caps_arr, np.minimum(deg, caps_arr[-1]))
    cap_of_row = caps_arr[np.minimum(bucket, len(caps_arr) - 1)]
    in_slot = pos < cap_of_row[r]

    classic = force_classic
    groups = []
    perm_chunks = []
    inv_pos = np.full(num_rows, -1, np.int64)
    eid_flat_pos = np.full(num_edges + 1, -1, np.int64)
    offset = 0        # permuted-row offset
    flat_off = 0      # flat weight-lane offset
    for bi, cap in enumerate(caps_arr):
        if classic:
            rows_g = np.arange(num_rows)
        else:
            # deg-0 rows ride in the first group (all-sentinel lanes) so
            # every row exists in permuted space — required when the caller
            # splits self-loops into the diag lane (their softmax runs here)
            rows_g = np.nonzero((bucket == bi)
                                & ((deg > 0) | (bi == 0)))[0]
        if rows_g.size == 0:
            continue
        ng = int(rows_g.size)
        ng_pad = ng if classic else -(-ng // 8) * 8
        sc = np.zeros((ng_pad, cap), np.int64)
        se = np.full((ng_pad, cap), num_edges, np.int64)
        local = np.full(num_rows, -1, np.int64)
        local[rows_g] = np.arange(ng)
        sel = in_slot & (local[r] >= 0)
        lr, lp = local[r[sel]], pos[sel]
        sc[lr, lp] = c[sel]
        se[lr, lp] = e[sel]
        eid_flat_pos[e[sel]] = flat_off + lr * cap + lp
        inv_pos[rows_g] = offset + np.arange(ng)
        perm_chunks.append(np.concatenate(
            [rows_g, np.full(ng_pad - ng, num_rows)]))
        offset += ng_pad
        flat_off += ng_pad * cap
        groups.append((sc.astype(np.int32), se.astype(np.int32)))
    slot_total = flat_off
    np_total = offset

    # tail: per-row overflow beyond its cap, in PERMUTED row coordinates
    t_sel = ~in_slot
    tr, tc, te = r[t_sel], c[t_sel], e[t_sel]
    t_prow = inv_pos[tr] if len(tr) else tr
    t_order = np.argsort(t_prow, kind="stable")
    t_prow, tc, te = t_prow[t_order], tc[t_order], te[t_order]
    pad = (-len(t_prow)) % 128
    if pad:
        t_prow = np.concatenate([t_prow, np.full(pad, np_total, np.int64)])
        tc = np.concatenate([tc, np.zeros(pad, np.int64)])
        te = np.concatenate([te, np.full(pad, num_edges, np.int64)])
    valid_t = te < num_edges
    eid_flat_pos[te[valid_t]] = slot_total + np.nonzero(valid_t)[0]
    tail_total = len(t_prow)
    # unplaced edges (none expected) and the sentinel map to the zero row
    eid_flat_pos[eid_flat_pos < 0] = slot_total + tail_total

    return (groups, perm_chunks, inv_pos, np_total,
            (t_prow, tc, te), eid_flat_pos, slot_total, tail_total, classic)


def build_gat_layout_bucketed(sorted_edge_index, num_nodes: int,
                              caps=None, layout: str = "auto",
                              ) -> BucketedGatLayout:
    """Host-side build (eager only) from the row-sorted self-looped edge
    list (same input contract as nn/conv/gat._gat_edge_cache).

    ``layout``: "bucketed" groups both sides; "classic" keeps both sides as
    one full-coverage group (≈ the uniform kernel's layout, for A/B);
    "auto" buckets a side only when the lane+tail savings per gather pass
    exceed the extra full-width permutation passes (~1·N rows per side).
    """
    if layout not in ("auto", "bucketed", "classic"):
        raise ValueError(f"layout must be auto|bucketed|classic, got {layout!r}")
    ei = np.asarray(jax.device_get(sorted_edge_index)).astype(np.int64)
    rows, cols = ei[0], ei[1]
    num_edges = ei.shape[1]
    ok = ((rows >= 0) & (rows < num_nodes) & (cols >= 0) & (cols < num_nodes))
    rows, cols = rows[ok], cols[ok]
    eids = np.nonzero(ok)[0].astype(np.int64)

    def decide(r):
        if layout != "auto":
            return layout == "classic"
        deg = np.bincount(r, minlength=num_nodes) if len(r) else \
            np.zeros(num_nodes, np.int64)
        side_caps = np.asarray(caps if caps is not None else _optimal_caps(deg),
                               np.int64)
        k_classic = _choose_k(len(r), num_nodes)
        b = np.searchsorted(side_caps, np.minimum(deg, side_caps[-1]))
        cap_of = side_caps[np.minimum(b, len(side_caps) - 1)]
        lanes_b = int(cap_of[deg > 0].sum())
        tail_b = int((deg - np.minimum(deg, cap_of)).sum())
        lanes_c = num_nodes * k_classic
        tail_c = int((deg - np.minimum(deg, k_classic)).sum())
        # tail rows cost ~2.5× a slot lane on the wide passes (extra segment
        # reduction); permutation costs ~1 extra full-N wide pass per side
        saved = (lanes_c + 2.5 * tail_c) - (lanes_b + 2.5 * tail_b)
        return saved < num_nodes  # True → classic

    fwd_classic = decide(rows)
    (f_groups, f_perm, f_inv, f_np, f_tail, f_eid_pos, slot_total,
     tail_total, f_is_classic) = _np_side(rows, cols, eids, num_nodes, caps,
                                          num_edges, fwd_classic)

    bwd_classic = decide(cols)
    (b_groups, b_perm, b_inv, b_np, b_tail, _b_eid_pos, _st, _tt,
     b_is_classic) = _np_side(cols, rows, eids, num_nodes, caps, num_edges,
                              bwd_classic)

    zero_flat = slot_total + tail_total
    # compose: transpose lanes fetch forward-layout weights by flat position,
    # and gather dy_p/Q_p by PERMUTED destination position
    dest_ppos = f_inv.copy()
    dest_ppos[dest_ppos < 0] = f_np  # rows absent from fwd groups → pad row

    def compose(groups, tail):
        out_groups, np_auxes = [], []
        for sc, se in groups:
            aux = f_eid_pos[np.minimum(se, num_edges)]
            aux[se >= num_edges] = zero_flat
            pcol = dest_ppos[np.clip(sc, 0, num_nodes - 1)]
            pcol[se >= num_edges] = f_np
            out_groups.append(GatGroup(
                slots_col=jnp.asarray(pcol.astype(np.int32)),
                slot_eid=jnp.asarray(se.astype(np.int32)),
                aux=jnp.asarray(aux.astype(np.int32))))
            np_auxes.append((aux, se))
        t_prow, tc, te = tail
        t_aux = f_eid_pos[np.minimum(te, num_edges)]
        t_aux[te >= num_edges] = zero_flat
        t_pcol = dest_ppos[np.clip(tc, 0, num_nodes - 1)]
        t_pcol[te >= num_edges] = f_np
        return out_groups, t_pcol, t_aux, np_auxes

    b_groups_c, b_tail_pcol, b_tail_aux, b_np_auxes = compose(b_groups, b_tail)

    # transpose-scatter map: fwd flat weight lane -> bwd flat lane, so the
    # backward can PLACE ã‖ds into transpose order with one unique-index
    # scatter instead of gathering per bwd lane (the "7th gather set",
    # benchmarks/README.md GAT phase table). Padding fwd lanes -> sink
    # (dropped by mode="drop").
    b_off = 0
    w_scatter_pos = np.full(zero_flat + 1, 0, np.int64)
    seen = np.zeros(zero_flat + 1, bool)
    for aux, se in b_np_auxes:
        mg, kg = se.shape
        lanes = b_off + np.arange(mg * kg, dtype=np.int64).reshape(mg, kg)
        real = se < num_edges
        w_scatter_pos[aux[real]] = lanes[real]
        seen[aux[real]] = True
        b_off += mg * kg
    tail_real = b_tail[2] < num_edges
    w_scatter_pos[b_tail_aux[tail_real]] = b_off + np.nonzero(tail_real)[0]
    seen[b_tail_aux[tail_real]] = True
    b_flat_total = b_off + len(b_tail[2])
    w_scatter_pos[~seen] = b_flat_total  # unreferenced fwd lanes -> dropped
    w_scatter_pos = w_scatter_pos[:zero_flat]  # the zero row never scatters

    def side_arrays(groups, perm_chunks, inv, np_total, tail, is_classic,
                    aux_groups=None, tail_col_override=None, tail_aux=None):
        gs = []
        for gi, (sc, se) in enumerate(groups):
            if aux_groups is not None:
                gs.append(aux_groups[gi])
            else:
                gs.append(GatGroup(slots_col=jnp.asarray(sc),
                                   slot_eid=jnp.asarray(se), aux=None))
        t_prow, tc, te = tail
        return GatSide(
            groups=tuple(gs),
            perm=(None if is_classic else jnp.asarray(
                np.concatenate(perm_chunks).astype(np.int32))),
            inv_pos=(None if is_classic else jnp.asarray(
                np.where(inv < 0, np_total, inv).astype(np.int32))),
            tail_prow=jnp.asarray(t_prow.astype(np.int32)),
            tail_col=jnp.asarray(
                (tail_col_override if tail_col_override is not None else tc)
                .astype(np.int32)),
            tail_eid=jnp.asarray(te.astype(np.int32)),
            tail_aux=(None if tail_aux is None
                      else jnp.asarray(tail_aux.astype(np.int32))))

    fwd = side_arrays(f_groups, f_perm, f_inv, f_np, f_tail, f_is_classic)
    bwd = side_arrays(b_groups, b_perm, b_inv, b_np, b_tail, b_is_classic,
                      aux_groups=b_groups_c, tail_col_override=b_tail_pcol,
                      tail_aux=b_tail_aux)
    return BucketedGatLayout(fwd=fwd, bwd=bwd, num_rows=num_nodes,
                             num_cols=num_nodes, num_edges=num_edges,
                             slot_total=slot_total, tail_total=tail_total,
                             w_scatter_pos=jnp.asarray(
                                 w_scatter_pos.astype(np.int32)),
                             bwd_flat_total=int(b_flat_total))


# ---------------------------------------------------------------------------
# kernel helpers (shared shapes: H heads of width d, flat [·, H·d] tensors)


def _blocksum(prod, H: int, d: int):
    """[M, H·d] → [M, H] per-head block reduction (accumulate f32)."""
    return prod.astype(jnp.float32).reshape(prod.shape[0], H, d).sum(-1)


def _expand(a, d: int):
    """[M, H] → [M, H·d]."""
    return jnp.repeat(a, d, axis=-1)


def _group_slices(side: GatSide):
    """Static (offset, size) of each group in the permuted row space."""
    out, off = [], 0
    for g in side.groups:
        n = g.slots_col.shape[0]
        out.append((off, n))
        off += n
    return out, off


def _permute(arr, perm, num_rows):
    """arr[perm] with pad positions (== num_rows) reading a zero row."""
    if perm is None:
        return arr
    padded = jnp.concatenate([arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)])
    return jnp.take(padded, perm, axis=0)


def _unpermute(arr_p, inv_pos, np_total):
    """Back to original row order; absent rows read the appended zero row."""
    if inv_pos is None:
        return arr_p
    padded = jnp.concatenate([arr_p,
                              jnp.zeros((1,) + arr_p.shape[1:], arr_p.dtype)])
    return jnp.take(padded, jnp.clip(inv_pos, 0, np_total), axis=0)


def _fused_core(layout: BucketedGatLayout, Q, K, V, H, d,
                keep_slots, keep_tail, keep_diag, s_diag_orig):
    """Forward: returns (out, residual softmax weights per group/tail/diag).

    ``s_diag_orig`` is the row-aligned self-loop score [N, H] or None;
    ``keep_slots`` is a tuple of per-group dropout masks (or scalars).
    """
    from . import config as _config
    fwd = layout.fwd
    N = layout.num_rows
    n_src = K.shape[0]
    E = layout.num_edges
    inv_scale = 1.0 / np.sqrt(float(d))
    slices, np_total = _group_slices(fwd)

    # Save the gathered K/V slot lanes as residuals: backward's dã/dQ passes
    # then read them back streaming instead of re-gathering (see
    # ops/config.ell_attention_save_lanes). Gated on unroll_all — a fori
    # carry of the full lane array would round-trip HBM every iteration.
    save_lanes = bool(_config.ell_attention_save_lanes
                      and _config.ell_attention_unroll_all)

    Q_p = _permute(Q, fwd.perm, N)

    # --- scores per group -------------------------------------------------
    s_groups, k_lanes = [], []
    for gi, g in enumerate(fwd.groups):
        off, ng = slices[gi]
        Kg = g.slots_col.shape[1]
        Q_g = jax.lax.dynamic_slice_in_dim(Q_p, off, ng, axis=0)

        def body(k, carry, g=g, Q_g=Q_g):
            s, kl = carry
            col_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1,
                                                 keepdims=False)
            k_rows = jnp.take(K, jnp.clip(col_k, 0, n_src - 1), axis=0)
            s_k = _blocksum(Q_g * k_rows, H, d) * inv_scale
            eid_k = jax.lax.dynamic_index_in_dim(g.slot_eid, k, 1,
                                                 keepdims=False)
            s_k = jnp.where((eid_k < E)[:, None], s_k, _NEG)
            s = jax.lax.dynamic_update_index_in_dim(s, s_k, k, 1)
            if kl is not None:
                # SLOT-MAJOR [Kg, ng, Hd]: slot k's rows form one contiguous
                # block so the backward read streams (row-major [ng, Kg, Hd]
                # would make it ng strided 512B reads — the same transaction
                # count as the gather it replaces; measured slower)
                kl = jax.lax.dynamic_update_index_in_dim(kl, k_rows, k, 0)
            return s, kl

        s_g, kl_g = _slot_loop(
            Kg, body,
            (jnp.full((ng, Kg, H), _NEG, jnp.float32),
             jnp.zeros((Kg, ng, K.shape[1]), K.dtype) if save_lanes
             else None))
        s_groups.append(s_g)
        k_lanes.append(kl_g)

    # --- tail scores (permuted rows) ---------------------------------------
    T = fwd.tail_prow.shape[0]
    if T:
        q_t = jnp.take(jnp.concatenate(
            [Q_p, jnp.zeros((1, Q_p.shape[1]), Q_p.dtype)]),
            jnp.clip(fwd.tail_prow, 0, np_total), axis=0)
        k_t = jnp.take(K, jnp.clip(fwd.tail_col, 0, n_src - 1), axis=0)
        s_tail = _blocksum(q_t * k_t, H, d) * inv_scale
        s_tail = jnp.where((fwd.tail_eid < E)[:, None], s_tail, _NEG)
    else:
        s_tail = jnp.zeros((0, H), jnp.float32)

    # --- diag lane (original space, permuted narrow) -----------------------
    if s_diag_orig is not None:
        s_diag_p = _permute(s_diag_orig, fwd.perm, N)  # [Np, H] narrow
    else:
        s_diag_p = None

    # --- softmax across (group lanes ∪ tail ∪ diag) per permuted row -------
    row_max = jnp.concatenate([s.max(axis=1) for s in s_groups], axis=0)
    if T:
        t_max = jax.ops.segment_max(s_tail, fwd.tail_prow,
                                    num_segments=np_total,
                                    indices_are_sorted=True)
        row_max = jnp.maximum(row_max, t_max)
    if s_diag_p is not None:
        row_max = jnp.maximum(row_max, s_diag_p)

    p_groups, denom_parts = [], []
    for gi, (s, g) in enumerate(zip(s_groups, fwd.groups)):
        off, ng = slices[gi]
        rm = jax.lax.dynamic_slice_in_dim(row_max, off, ng, axis=0)
        p = jnp.exp(s - rm[:, None, :])
        p = jnp.where((g.slot_eid < E)[:, :, None], p, 0.0)
        p_groups.append(p)
        denom_parts.append(p.sum(axis=1))
    denom = jnp.concatenate(denom_parts, axis=0)                 # [Np, H]
    if s_diag_p is not None:
        p_diag = jnp.exp(s_diag_p - row_max)
        if fwd.perm is not None:
            p_diag = jnp.where((fwd.perm < N)[:, None], p_diag, 0.0)
        denom = denom + p_diag
    else:
        p_diag = None
    if T:
        rm_t = jnp.take(jnp.concatenate(
            [row_max, jnp.full((1, H), _NEG, jnp.float32)]),
            jnp.clip(fwd.tail_prow, 0, np_total), axis=0)
        p_tail = jnp.exp(s_tail - rm_t)
        p_tail = jnp.where((fwd.tail_eid < E)[:, None], p_tail, 0.0)
        denom = denom + jax.ops.segment_sum(p_tail, fwd.tail_prow,
                                            num_segments=np_total,
                                            indices_are_sorted=True)
    else:
        p_tail = jnp.zeros((0, H), jnp.float32)
    inv_denom = 1.0 / (denom + 1e-16)                            # [Np, H]

    a_groups = []
    for gi, p in enumerate(p_groups):
        off, ng = slices[gi]
        idv = jax.lax.dynamic_slice_in_dim(inv_denom, off, ng, axis=0)
        a_groups.append(p * idv[:, None, :])
    a_diag_p = p_diag * inv_denom if p_diag is not None else None
    if T:
        id_t = jnp.take(jnp.concatenate(
            [inv_denom, jnp.zeros((1, H), jnp.float32)]),
            jnp.clip(fwd.tail_prow, 0, np_total), axis=0)
        a_tail = p_tail * id_t
    else:
        a_tail = p_tail

    # --- dropout ------------------------------------------------------------
    ad_groups = [a * ks for a, ks in zip(a_groups, keep_slots)]
    ad_tail = a_tail * keep_tail
    ad_diag_p = a_diag_p * keep_diag if a_diag_p is not None else None

    # --- aggregation ---------------------------------------------------------
    out_parts, v_lanes = [], []
    for gi, g in enumerate(fwd.groups):
        off, ng = slices[gi]
        Kg = g.slots_col.shape[1]
        ad = ad_groups[gi]

        def body(k, carry, g=g, ad=ad):
            out, vl = carry
            col_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1,
                                                 keepdims=False)
            v = jnp.take(V, jnp.clip(col_k, 0, n_src - 1), axis=0)
            a_k = jax.lax.dynamic_index_in_dim(ad, k, 1, keepdims=False)
            out = out + v * _expand(a_k, d).astype(V.dtype)
            if vl is not None:
                vl = jax.lax.dynamic_update_index_in_dim(vl, v, k, 0)
            return out, vl

        out_g, vl_g = _slot_loop(
            Kg, body,
            (jnp.zeros((ng, V.shape[1]), V.dtype),
             jnp.zeros((Kg, ng, V.shape[1]), V.dtype) if save_lanes
             else None))
        out_parts.append(out_g)
        v_lanes.append(vl_g)
    out_p = jnp.concatenate(out_parts, axis=0)
    k_tail = v_tail = None
    if T:
        v_t = jnp.take(V, jnp.clip(fwd.tail_col, 0, n_src - 1), axis=0)
        out_p = out_p + jax.ops.segment_sum(
            v_t * _expand(ad_tail, d).astype(V.dtype), fwd.tail_prow,
            num_segments=np_total, indices_are_sorted=True)
        if save_lanes:
            # reuse the tail K gather from the scores pass instead of
            # re-deriving it (no reliance on XLA CSE)
            k_tail = k_t
            v_tail = v_t
    out = _unpermute(out_p, fwd.inv_pos, np_total)
    if ad_diag_p is not None:
        ad_diag = _unpermute(ad_diag_p, fwd.inv_pos, np_total)
        out = out + V * _expand(ad_diag, d).astype(V.dtype)
    if not save_lanes:
        k_lanes = v_lanes = None
    # row_max/inv_denom feed the transpose-recompute backward (per-row lse)
    return out, (Q_p, a_groups, a_tail, a_diag_p, row_max, inv_denom,
                 (tuple(k_lanes), tuple(v_lanes), k_tail, v_tail)
                 if save_lanes else None)


def _flat_weights(ad_groups, ds_groups, ad_tail, ds_tail, H):
    """Concatenate per-lane ã and ds into the flat [slot+tail+1, 2H] array
    the transpose pass gathers from (same trick as ops/ell_attention)."""
    a_parts = [g.reshape(-1, H) for g in ad_groups] + [ad_tail]
    s_parts = [g.reshape(-1, H) for g in ds_groups] + [ds_tail]
    return jnp.concatenate([
        jnp.concatenate(a_parts + [jnp.zeros((1, H), jnp.float32)]),
        jnp.concatenate(s_parts + [jnp.zeros((1, H), jnp.float32)]),
    ], axis=-1)


def _fused_impl(layout: BucketedGatLayout, H, d,
                Q, K, V, keep_slots, keep_tail, keep_diag, diag_eid):
    out, _ = _call_core(layout, H, d, Q, K, V, keep_slots, keep_tail,
                        keep_diag, diag_eid)
    return out


def _call_core(layout, H, d, Q, K, V, keep_slots, keep_tail, keep_diag,
               diag_eid):
    E = layout.num_edges
    inv_scale = 1.0 / np.sqrt(float(d))
    if diag_eid is not None and diag_eid.shape[0]:
        s_diag = _blocksum(Q * K, H, d) * inv_scale
        s_diag = jnp.where((diag_eid < E)[:, None], s_diag, _NEG)
    else:
        s_diag = None
    return _fused_core(layout, Q, K, V, H, d, keep_slots, keep_tail,
                       keep_diag, s_diag)


def _fused_fwd(layout, H, d, Q, K, V, keep_slots, keep_tail, keep_diag,
               diag_eid):
    out, (Q_p, a_groups, a_tail, a_diag_p, row_max, inv_denom,
          saved_lanes) = _call_core(
        layout, H, d, Q, K, V, keep_slots, keep_tail, keep_diag, diag_eid)
    return out, (layout, Q, K, V, Q_p, a_groups, a_tail, a_diag_p,
                 row_max, inv_denom, keep_slots, keep_tail, keep_diag,
                 diag_eid, saved_lanes)


def _pack_stats_rider(wide_p, stats_f32):
    """Append per-row f32 stats to a wide operand as rider columns so ONE
    gather fetches both. When the wide operand is 16-bit (bf16 compute
    policy) each f32 stat is BIT-CAST into two 16-bit lanes — the gather
    moves bits, the unpack restores exact f32 (no precision loss from
    riding a narrow dtype)."""
    if wide_p.dtype == jnp.float32:
        return jnp.concatenate([wide_p, stats_f32], axis=-1)
    assert jnp.dtype(wide_p.dtype).itemsize == 2, wide_p.dtype
    bits = jax.lax.bitcast_convert_type(stats_f32, jnp.uint16)
    rider = jax.lax.bitcast_convert_type(
        bits.reshape(stats_f32.shape[0], -1), wide_p.dtype)
    return jnp.concatenate([wide_p, rider], axis=-1)


def _unpack_stats_rider(ext, width, num_stats):
    """Inverse of :func:`_pack_stats_rider` on gathered rows."""
    wide = ext[:, :width]
    rider = ext[:, width:]
    if ext.dtype == jnp.float32:
        return wide, rider
    bits = jax.lax.bitcast_convert_type(rider, jnp.uint16)
    stats = jax.lax.bitcast_convert_type(
        bits.reshape(ext.shape[0], num_stats, 2), jnp.float32)
    return wide, stats


def _fused_bwd(H, d, residuals, dy):
    (layout, Q, K, V, Q_p, a_groups, a_tail, a_diag_p,
     row_max, inv_denom, keep_slots, keep_tail, keep_diag,
     diag_eid, saved_lanes) = residuals
    if saved_lanes is not None:
        k_lanes, v_lanes, k_tail_saved, v_tail_saved = saved_lanes
    else:
        k_lanes = v_lanes = k_tail_saved = v_tail_saved = None
    fwd = layout.fwd
    bwd = layout.bwd
    N = layout.num_rows
    n_src = V.shape[0]
    E = layout.num_edges
    T = fwd.tail_prow.shape[0]
    inv_scale = 1.0 / np.sqrt(float(d))
    slices, np_total = _group_slices(fwd)

    dy_p = _permute(dy, fwd.perm, N)

    ad_groups = [a * ks for a, ks in zip(a_groups, keep_slots)]
    ad_tail = a_tail * keep_tail
    has_diag = a_diag_p is not None
    ad_diag_p = a_diag_p * keep_diag if has_diag else None

    # --- dã per group lane ---------------------------------------------------
    # With saved_lanes the V rows come back as a STREAMING slice of the
    # forward's gathered lanes instead of a second random gather set.
    da_groups = []
    for gi, g in enumerate(fwd.groups):
        off, ng = slices[gi]
        Kg = g.slots_col.shape[1]
        dy_g = jax.lax.dynamic_slice_in_dim(dy_p, off, ng, axis=0)
        vl_g = v_lanes[gi] if v_lanes is not None else None

        def body(k, da, g=g, dy_g=dy_g, vl_g=vl_g):
            if vl_g is not None:
                v = jax.lax.dynamic_index_in_dim(vl_g, k, 0, keepdims=False)
            else:
                col_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1,
                                                     keepdims=False)
                v = jnp.take(V, jnp.clip(col_k, 0, n_src - 1), axis=0)
            da_k = _blocksum(dy_g * v, H, d)
            return jax.lax.dynamic_update_index_in_dim(da, da_k, k, 1)

        da_groups.append(_slot_loop(
            Kg, body, jnp.zeros((ng, Kg, H), jnp.float32)))
    if T:
        dy_t = jnp.take(jnp.concatenate(
            [dy_p, jnp.zeros((1, dy_p.shape[1]), dy_p.dtype)]),
            jnp.clip(fwd.tail_prow, 0, np_total), axis=0)
        v_t = v_tail_saved if v_tail_saved is not None else \
            jnp.take(V, jnp.clip(fwd.tail_col, 0, n_src - 1), axis=0)
        da_tail = _blocksum(dy_t * v_t, H, d)
    else:
        da_tail = jnp.zeros((0, H), jnp.float32)
    if has_diag:
        da_diag = _blocksum(dy * V, H, d)          # original space, aligned
        da_diag_p = _permute(da_diag, fwd.perm, N)
    # dropout: ã = a·keep ⇒ da = dã·keep
    da_groups = [da * ks for da, ks in zip(da_groups, keep_slots)]
    da_tail = da_tail * keep_tail
    if has_diag:
        da_diag_p = da_diag_p * keep_diag

    # --- softmax backward: ds = a ⊙ (da − g[row]) ---------------------------
    gsum = jnp.concatenate(
        [(a * da).sum(axis=1) for a, da in zip(a_groups, da_groups)], axis=0)
    if has_diag:
        gsum = gsum + a_diag_p * da_diag_p
    if T:
        gsum = gsum + jax.ops.segment_sum(a_tail * da_tail, fwd.tail_prow,
                                          num_segments=np_total,
                                          indices_are_sorted=True)
    ds_groups = []
    for gi, (a, da) in enumerate(zip(a_groups, da_groups)):
        off, ng = slices[gi]
        g_g = jax.lax.dynamic_slice_in_dim(gsum, off, ng, axis=0)
        ds_groups.append(a * (da - g_g[:, None, :]) * inv_scale)
    if has_diag:
        ds_diag_p = a_diag_p * (da_diag_p - gsum) * inv_scale
    if T:
        g_t = jnp.take(jnp.concatenate(
            [gsum, jnp.zeros((1, H), jnp.float32)]),
            jnp.clip(fwd.tail_prow, 0, np_total), axis=0)
        ds_tail = a_tail * (da_tail - g_t) * inv_scale
    else:
        ds_tail = da_tail

    # --- dQ (permuted space, then unpermute) --------------------------------
    dq_parts = []
    for gi, g in enumerate(fwd.groups):
        off, ng = slices[gi]
        Kg = g.slots_col.shape[1]
        ds = ds_groups[gi]
        kl_g = k_lanes[gi] if k_lanes is not None else None

        def body(k, dq, g=g, ds=ds, kl_g=kl_g):
            if kl_g is not None:
                krows = jax.lax.dynamic_index_in_dim(kl_g, k, 0,
                                                     keepdims=False)
            else:
                col_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1,
                                                     keepdims=False)
                krows = jnp.take(K, jnp.clip(col_k, 0, n_src - 1), axis=0)
            ds_k = jax.lax.dynamic_index_in_dim(ds, k, 1, keepdims=False)
            return dq + krows * _expand(ds_k, d).astype(K.dtype)

        dq_parts.append(_slot_loop(
            Kg, body, jnp.zeros((ng, K.shape[1]), K.dtype)))
    dQ_p = jnp.concatenate(dq_parts, axis=0)
    if T:
        k_t = k_tail_saved if k_tail_saved is not None else \
            jnp.take(K, jnp.clip(fwd.tail_col, 0, n_src - 1), axis=0)
        dQ_p = dQ_p + jax.ops.segment_sum(
            k_t * _expand(ds_tail, d).astype(K.dtype), fwd.tail_prow,
            num_segments=np_total, indices_are_sorted=True)
    dQ = _unpermute(dQ_p, fwd.inv_pos, np_total)
    if has_diag:
        ds_diag = _unpermute(ds_diag_p, fwd.inv_pos, np_total)
        ad_diag = _unpermute(ad_diag_p, fwd.inv_pos, np_total)
        dQ = dQ + K * _expand(ds_diag, d).astype(K.dtype)

    # --- transpose pass: dV[m] = Σ ã·dy[row], dK[m] = Σ ds·Q[row] -----------
    # dy_p/Q_p are read directly (bwd.slots_col pre-composed to permuted
    # destination positions on host — see build_gat_layout_bucketed)
    from . import config as _config
    scalar_keep = (all(getattr(ks, "ndim", None) == 0 for ks in keep_slots)
                   and getattr(keep_tail, "ndim", None) == 0)
    use_recompute = bool(_config.ell_attention_recompute_transpose
                         and scalar_keep)
    b_slices, b_np_total = _group_slices(bwd)
    q_pz = jnp.concatenate([Q_p, jnp.zeros((1, Q_p.shape[1]), Q_p.dtype)])

    if use_recompute:
        # Recompute ã/ds per lane instead of gathering the flat [·, 2H]
        # weight array — in the transaction-bound regime that narrow gather
        # costs a full transaction per lane (one of the step's seven gather
        # sets, benchmarks/README.md). Per-row softmax stats (lse, gsum —
        # exact f32, bit-cast) RIDE the existing dy gather; K/V are read
        # row-aligned via bwd-space permutes (~0.34M rows traded for ~1.4M).
        # Only valid with scalar dropout masks: ã·keep has no per-edge state.
        keep_s = keep_slots[0] if keep_slots else jnp.ones((), jnp.float32)
        lse = row_max - jnp.log(inv_denom)  # = m + log(denom + ε) exactly
        stats = jnp.concatenate([lse, gsum], axis=-1)        # [Np, 2H] f32
        dy_ext = _pack_stats_rider(dy_p, stats)
        dy_ext_z = jnp.concatenate(
            [dy_ext, jnp.zeros((1, dy_ext.shape[1]), dy_ext.dtype)])
        width = dy_p.shape[1]
        K_bp = _permute(K, bwd.perm, N)
        V_bp = _permute(V, bwd.perm, N)

        def lane_grads(pcol_k, k_rows, v_rows):
            safe = jnp.clip(pcol_k, 0, np_total)
            ext = jnp.take(dy_ext_z, safe, axis=0)
            dyr, st = _unpack_stats_rider(ext, width, 2 * H)
            lse_r, gsum_r = st[:, :H], st[:, H:]
            qr = jnp.take(q_pz, safe, axis=0)
            s_e = _blocksum(qr * k_rows, H, d) * inv_scale
            a_e = jnp.exp(s_e - lse_r)
            # padding lanes read the zero stats row: a_e = exp(0) = 1, but
            # dyr/qr are zero rows so every contribution still vanishes
            da_e = _blocksum(dyr * v_rows, H, d) * keep_s
            ds_e = a_e * (da_e - gsum_r) * inv_scale
            return dyr, qr, a_e * keep_s, ds_e

        dv_parts, dk_parts = [], []
        for gi, g in enumerate(bwd.groups):
            off, mg = b_slices[gi]
            Kg = g.slots_col.shape[1]
            K_g = jax.lax.dynamic_slice_in_dim(K_bp, off, mg, axis=0)
            V_g = jax.lax.dynamic_slice_in_dim(V_bp, off, mg, axis=0)

            def body(k, carry, g=g, K_g=K_g, V_g=V_g):
                dV_g, dK_g = carry
                pcol_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1,
                                                      keepdims=False)
                dyr, qr, ad_e, ds_e = lane_grads(pcol_k, K_g, V_g)
                dV_g = dV_g + dyr * _expand(ad_e, d).astype(dy.dtype)
                dK_g = dK_g + qr * _expand(ds_e, d).astype(Q.dtype)
                return dV_g, dK_g

            dV_g, dK_g = _slot_loop(
                Kg, body,
                (jnp.zeros((mg, dy.shape[1]), dy.dtype),
                 jnp.zeros((mg, K.shape[1]), K.dtype)),
                flag="ell_attention_unroll_transpose")
            dv_parts.append(dV_g)
            dk_parts.append(dK_g)
        dV_p = jnp.concatenate(dv_parts, axis=0)
        dK_p = jnp.concatenate(dk_parts, axis=0)
        if bwd.tail_prow.shape[0]:
            K_bpz = jnp.concatenate(
                [K_bp, jnp.zeros((1, K_bp.shape[1]), K_bp.dtype)])
            V_bpz = jnp.concatenate(
                [V_bp, jnp.zeros((1, V_bp.shape[1]), V_bp.dtype)])
            safe_t = jnp.clip(bwd.tail_prow, 0, b_np_total)
            k_t = jnp.take(K_bpz, safe_t, axis=0)
            v_t = jnp.take(V_bpz, safe_t, axis=0)
            dyr, qr, ad_e, ds_e = lane_grads(bwd.tail_col, k_t, v_t)
            msg = jnp.concatenate(
                [dyr * _expand(ad_e, d).astype(dy.dtype),
                 qr * _expand(ds_e, d).astype(Q.dtype)], axis=-1)
            seg = jax.ops.segment_sum(msg, bwd.tail_prow,
                                      num_segments=b_np_total,
                                      indices_are_sorted=True)
            Hd = dy.shape[1]
            dV_p = dV_p + seg[:, :Hd]
            dK_p = dK_p + seg[:, Hd:]
    else:
        # per-edge dropout masks: the weights move from forward to transpose
        # lane order either by one narrow gather per lane from the flat
        # [·, 2H] array (default), or — transpose-scatter variant — by ONE
        # unique-index scatter into bwd flat order so the loop reads them
        # as contiguous slices (see ops/config.ell_attention_transpose_scatter)
        w_flat = _flat_weights(ad_groups, ds_groups, ad_tail, ds_tail, H)
        zero_flat = layout.slot_total + layout.tail_total
        use_scatter = bool(_config.ell_attention_transpose_scatter
                           and layout.w_scatter_pos is not None)
        if use_scatter:
            w_t = jnp.zeros((layout.bwd_flat_total, 2 * H), jnp.float32)
            w_t = w_t.at[layout.w_scatter_pos].set(w_flat[:-1], mode="drop")
        dy_pz = jnp.concatenate(
            [dy_p, jnp.zeros((1, dy_p.shape[1]), dy_p.dtype)])

        dv_parts, dk_parts = [], []
        b_flat_off = 0
        for gi, g in enumerate(bwd.groups):
            off, mg = b_slices[gi]
            Kg = g.slots_col.shape[1]
            if use_scatter:
                w_g = jax.lax.dynamic_slice_in_dim(
                    w_t, b_flat_off, mg * Kg).reshape(mg, Kg, 2 * H)
            else:
                w_g = None
            b_flat_off += mg * Kg

            def body(k, carry, g=g, w_g=w_g):
                dV_g, dK_g = carry
                pcol_k = jax.lax.dynamic_index_in_dim(g.slots_col, k, 1,
                                                      keepdims=False)
                if w_g is not None:
                    w = jax.lax.dynamic_index_in_dim(w_g, k, 1, keepdims=False)
                else:
                    pos_k = jax.lax.dynamic_index_in_dim(g.aux, k, 1,
                                                         keepdims=False)
                    w = jnp.take(w_flat, jnp.clip(pos_k, 0, zero_flat), axis=0)
                safe = jnp.clip(pcol_k, 0, np_total)
                dyr = jnp.take(dy_pz, safe, axis=0)
                qr = jnp.take(q_pz, safe, axis=0)
                dV_g = dV_g + dyr * _expand(w[:, :H], d).astype(dy.dtype)
                dK_g = dK_g + qr * _expand(w[:, H:], d).astype(Q.dtype)
                return dV_g, dK_g

            dV_g, dK_g = _slot_loop(
                Kg, body,
                (jnp.zeros((mg, dy.shape[1]), dy.dtype),
                 jnp.zeros((mg, K.shape[1]), K.dtype)),
                flag="ell_attention_unroll_transpose")
            dv_parts.append(dV_g)
            dk_parts.append(dK_g)
        dV_p = jnp.concatenate(dv_parts, axis=0)
        dK_p = jnp.concatenate(dk_parts, axis=0)
        if bwd.tail_prow.shape[0]:
            if use_scatter:
                w = jax.lax.dynamic_slice_in_dim(
                    w_t, b_flat_off, bwd.tail_prow.shape[0])
            else:
                w = jnp.take(w_flat, jnp.clip(bwd.tail_aux, 0, zero_flat),
                             axis=0)
            safe = jnp.clip(bwd.tail_col, 0, np_total)
            dyr = jnp.take(dy_pz, safe, axis=0)
            qr = jnp.take(q_pz, safe, axis=0)
            msg = jnp.concatenate(
                [dyr * _expand(w[:, :H], d).astype(dy.dtype),
                 qr * _expand(w[:, H:], d).astype(Q.dtype)], axis=-1)
            seg = jax.ops.segment_sum(msg, bwd.tail_prow,
                                      num_segments=b_np_total,
                                      indices_are_sorted=True)
            Hd = dy.shape[1]
            dV_p = dV_p + seg[:, :Hd]
            dK_p = dK_p + seg[:, Hd:]
    dV = _unpermute(dV_p, bwd.inv_pos, b_np_total)
    dK = _unpermute(dK_p, bwd.inv_pos, b_np_total)
    if has_diag:
        dV = dV + dy * _expand(ad_diag, d).astype(dy.dtype)
        dK = dK + Q * _expand(ds_diag, d).astype(Q.dtype)

    zero_keep_slots = tuple(jnp.zeros_like(ks) for ks in keep_slots)
    return (None, dQ.astype(Q.dtype), dK.astype(K.dtype), dV.astype(V.dtype),
            zero_keep_slots, jnp.zeros_like(keep_tail),
            jnp.zeros_like(keep_diag), None)


_fused_vjp = jax.custom_vjp(_fused_impl, nondiff_argnums=(1, 2))
_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def gat_attention_bucketed(layout: BucketedGatLayout, Q, K, V,
                           num_heads: int, edge_drop_rate: float = 0.0,
                           training: bool = False, dropout_key=None,
                           compute_dtype=None, diag_eid=None):
    """Fused bucketed GAT attention (see module docstring). Same contract as
    ops/ell_attention.gat_attention_ell: Q/K/V are [N, H·d] head-blocked with
    equal head width; returns [num_rows, H·d]."""
    from . import config as _config
    cd = compute_dtype if compute_dtype is not None \
        else _config.ell_compute_dtype
    H = num_heads
    d_q = Q.shape[-1] // H
    d_v = V.shape[-1] // H
    if d_q != d_v:
        raise NotImplementedError(
            "fused bucketed attention requires equal query/value head width; "
            "use the segment path otherwise")
    if training and edge_drop_rate > 0.0 and dropout_key is None:
        raise ValueError(
            "gat_attention_bucketed requires dropout_key when training with "
            "edge_drop_rate > 0 (a silent no-op would train unregularized)")
    if diag_eid is None:
        diag_eid = jnp.zeros((0,), jnp.int32)
    if training and edge_drop_rate > 0.0:
        keys = jax.random.split(dropout_key, len(layout.fwd.groups) + 2)
        scale = 1.0 / (1.0 - edge_drop_rate)
        keep_slots = tuple(
            jax.random.bernoulli(
                keys[i], 1.0 - edge_drop_rate,
                layout.fwd.groups[i].slot_eid.shape + (H,)
            ).astype(jnp.float32) * scale
            for i in range(len(layout.fwd.groups)))
        keep_tail = jax.random.bernoulli(
            keys[-2], 1.0 - edge_drop_rate,
            (layout.fwd.tail_prow.shape[0], H)).astype(jnp.float32) * scale
        keep_diag = jax.random.bernoulli(
            keys[-1], 1.0 - edge_drop_rate,
            (diag_eid.shape[0], H)).astype(jnp.float32) * scale
    else:
        keep_slots = tuple(jnp.ones((), jnp.float32)
                           for _ in layout.fwd.groups)
        keep_tail = jnp.ones((), jnp.float32)
        keep_diag = jnp.ones((), jnp.float32)

    out_dtype = V.dtype
    if cd is not None:
        Q, K, V = Q.astype(cd), K.astype(cd), V.astype(cd)
    out = _fused_vjp(layout, H, d_v, Q, K, V, keep_slots, keep_tail,
                     keep_diag, diag_eid)
    return out.astype(out_dtype)
