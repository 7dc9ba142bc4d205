"""Degree-bucketed ELL SpMM: per-degree-group slot counts for heavy tails.

The uniform-K ELL (ops/ell.py) is optimal when the degree distribution is
concentrated near its mean, but on skewed sides (e.g. the in-degree of a
preferential-attachment citation graph) a large fraction of edges lands in
the sorted-segment tail, which costs ~6× more per row than a dense slot
gather. Measured on the headline graph (benchmarks/gcn_phase_times.py,
benchmarks/ell_k_sweep.py, v5e, F=40):

    slot gather    ≈ 2.1 ns/row  (valid or padding alike)
    tail row       ≈ 13.2 ns/row (gather + sorted segment_sum)
    → forward pass 6.55 ms (24.5% tail) vs transpose 4.10 ms (8.6% tail)
      for the SAME matrix and K

This layout groups rows by degree — DP-optimal slot widths from the degree
histogram (``_optimal_caps``, ≤16 groups) — so slot lanes ≈ edges. Group
outputs are concatenated and assembled into row order by ONE
inverse-permutation gather (~3 ns/row). Rows beyond ``caps[-1]`` (hub rows)
are ROW-SPLIT into full-width virtual rows merged back by a tiny sorted
segment-sum (~E/caps[-1] rows), so no edge ever takes the sorted-COO tail.
Raising the uniform K instead does NOT work: K=16 already loses
(ell_k_sweep.py) because every row pays every slot lane.

Whether bucketing wins is decided PER DIRECTION from the measured cost
constants above — on the headline graph the forward side buckets
(estimated 6.55 → ~4.3 ms) while the transpose keeps the classic layout
(bucketing it would add the unpermute pass for almost no tail savings).

Values are treated as constants (the cached-normalization case —
``ell_spmm(..., diff_values=False)`` semantics); ``with_edge_values``
re-skins per-edge values (edge dropout) through the eid maps exactly like
``EllAdj``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.union_utils import convert_union_to_numpy
from .ell import _choose_k, build_ell_arrays

__all__ = ["BucketedEllAdj", "bucketed_spmm",
           "SLOT_NS", "TAIL_NS", "UNPERM_NS"]

# v5e cost model (ns/row) for the layout choice — see module docstring.
SLOT_NS = 2.1
TAIL_NS = 13.2
UNPERM_NS = 3.0

_DEFAULT_CAPS = (1, 2, 4, 8, 16, 32, 64, 128)

# Adaptive-cap defaults (caps=None): bound the group count (each group is a
# separately-unrolled slot loop — compile time) and the widest slot group.
_MAX_GROUPS = 16
_MAX_CAP = 256
# Per-group fixed overhead expressed in slot-lane equivalents (launch +
# row padding); keeps the DP from emitting near-empty groups.
_GROUP_PENALTY_LANES = 1024


def _optimal_caps(deg, max_groups: int = _MAX_GROUPS,
                  max_cap: int = _MAX_CAP) -> Tuple[int, ...]:
    """DP-optimal slot widths from the degree histogram.

    Partitions the distinct (clipped) degrees into ≤ ``max_groups``
    contiguous intervals minimizing total slot lanes
    ``Σ_groups rows(group) · cap(group)`` plus a fixed per-group penalty.
    The pow2 default wastes up to 2× lanes within a group (measured 1.31-
    1.34× total on the headline graph); the DP caps land within ~3% of the
    ``Σ deg`` ideal. Degrees above ``max_cap`` are ROW-SPLIT by the builder
    into full-width virtual rows, so callers should pass the POST-SPLIT
    remainder degrees here (``from_coo`` does) — optimizing the clipped
    pre-split histogram would allocate lanes for rows that no longer exist.
    """
    deg = deg[deg > 0]
    if deg.size == 0:
        return (1,)
    clipped = np.minimum(deg, max_cap)
    ds, cnt = np.unique(clipped, return_counts=True)
    m = len(ds)
    if m <= max_groups:
        return tuple(int(d) for d in ds)
    csum = np.concatenate([[0], np.cumsum(cnt)])
    INF = float("inf")
    # cost[g][i] = min lanes to cover ds[:i] with exactly g groups, each
    # group an interval whose cap is its largest degree
    cost = np.full((max_groups + 1, m + 1), INF)
    back = np.zeros((max_groups + 1, m + 1), np.int64)
    cost[0][0] = 0.0
    for g in range(1, max_groups + 1):
        for i in range(g, m + 1):
            j = np.arange(g - 1, i)  # last group = ds[j:i]
            cands = cost[g - 1][j] + (csum[i] - csum[j]) * ds[i - 1] \
                + _GROUP_PENALTY_LANES
            b = int(np.argmin(cands))
            cost[g][i] = cands[b]
            back[g][i] = j[b]
    g_best = int(np.argmin(cost[:, m]))
    caps = []
    i = m
    for g in range(g_best, 0, -1):
        caps.append(int(ds[i - 1]))
        i = int(back[g][i])
    return tuple(sorted(caps))


class EllGroup(NamedTuple):
    """One degree bucket: rows whose degree fits this group's slot width.

    Slot arrays are stored TRANSPOSED — [Kg, Ng], slot-major — so the
    per-slot row ``slots_col[k]`` is a contiguous read even when the layout
    rides as a jit ARGUMENT (default row-major arg layouts make a [Ng, Kg]
    column slice a 4-byte-strided gather; constants don't care because XLA
    relays them out). Required for graphs whose packed arrays exceed the
    remote-compile literal limit (~600MB HLO at Reddit scale → HTTP 413).

    ``row_ids is None`` marks a classic (ungrouped) side: the single group
    covers every row in natural order and needs no inverse permutation.
    """
    row_ids: Optional[jnp.ndarray]   # [Ng] original row indices, or None
    slots_col: jnp.ndarray           # [Kg, Ng]
    slots_val: jnp.ndarray           # [Kg, Ng]
    slot_eid: jnp.ndarray            # [Kg, Ng]


class VirtGroup(NamedTuple):
    """Row-split overflow: rows with degree > caps[-1] are chopped into
    ``deg // caps[-1]`` virtual rows of full width (the remainder re-enters
    the normal buckets). Virtual outputs merge into their owner row by ONE
    tiny sorted segment-sum (~E/caps[-1] rows) — ~6× cheaper per edge than
    the sorted-COO tail it replaces on hub-heavy graphs."""
    owner: jnp.ndarray               # [Nv_pad] original row ids, sorted
    slots_col: jnp.ndarray           # [caps[-1], Nv_pad] (slot-major)
    slots_val: jnp.ndarray
    slot_eid: jnp.ndarray


class BucketedSide(NamedTuple):
    """One matmul direction: groups + optional inverse map + sorted tail."""
    groups: Tuple[EllGroup, ...]
    inv_map: Optional[jnp.ndarray]   # [num_rows] → row in concat(groups)+zero
    tail_row: jnp.ndarray            # sorted, original row ids
    tail_col: jnp.ndarray
    tail_val: jnp.ndarray
    tail_eid: jnp.ndarray
    virt: Optional[VirtGroup] = None


def _side_matmul(side: BucketedSide, h, num_rows: int, diag_val):
    """Per-group K dense gathers + unpermute + sorted tail + dense diag."""
    n_src = h.shape[0]
    outs = []
    for g in side.groups:
        Kg = g.slots_col.shape[0]
        acc = jnp.zeros((g.slots_col.shape[1],) + h.shape[1:], h.dtype)
        for k in range(Kg):
            col_k = jnp.clip(g.slots_col[k], 0, n_src - 1)
            acc = acc + jnp.take(h, col_k, axis=0) \
                * g.slots_val[k][:, None].astype(h.dtype)
        outs.append(acc)
    if side.inv_map is None:
        out = outs[0]
    else:
        stacked = jnp.concatenate(
            outs + [jnp.zeros((1,) + h.shape[1:], h.dtype)], axis=0)
        out = jnp.take(stacked, side.inv_map, axis=0)
    if side.tail_row.shape[0]:
        safe_tc = jnp.clip(side.tail_col, 0, n_src - 1)
        tmsg = jnp.take(h, safe_tc, axis=0) \
            * side.tail_val[:, None].astype(h.dtype)
        out = out + jax.ops.segment_sum(tmsg, side.tail_row,
                                        num_segments=num_rows,
                                        indices_are_sorted=True)
    if side.virt is not None:
        v = side.virt
        vacc = jnp.zeros((v.slots_col.shape[1],) + h.shape[1:], h.dtype)
        for k in range(v.slots_col.shape[0]):
            col_k = jnp.clip(v.slots_col[k], 0, n_src - 1)
            vacc = vacc + jnp.take(h, col_k, axis=0) \
                * v.slots_val[k][:, None].astype(h.dtype)
        out = out + jax.ops.segment_sum(vacc, v.owner,
                                        num_segments=num_rows,
                                        indices_are_sorted=True)
    if diag_val is not None and diag_val.shape[0]:
        out = out + h * diag_val[:, None].astype(h.dtype)
    return out


def _b_impl(fwd_side, bwd_side, diag_val, num_rows, num_cols, h):
    return _side_matmul(fwd_side, h, num_rows, diag_val)


_b_vjp = jax.custom_vjp(_b_impl, nondiff_argnums=(3, 4))


def _b_fwd(fwd_side, bwd_side, diag_val, num_rows, num_cols, h):
    out = _side_matmul(fwd_side, h, num_rows, diag_val)
    return out, (bwd_side, diag_val)


def _b_bwd(num_rows, num_cols, residuals, dy):
    bwd_side, diag_val = residuals
    # dh = Aᵀ dy on the transpose side's own layout (Aᵀ's diagonal == A's)
    dh = _side_matmul(bwd_side, dy, num_cols, diag_val)
    return None, None, None, dh


_b_vjp.defvjp(_b_fwd, _b_bwd)


def bucketed_spmm(adj: "BucketedEllAdj", h, compute_dtype=None):
    """A @ h. Values are constants for AD (the cached-normalization case)."""
    from . import config as _config
    cd = compute_dtype if compute_dtype is not None else _config.ell_compute_dtype
    orig_dtype = h.dtype
    if cd is not None and orig_dtype != cd:
        h = h.astype(cd)
    out = _b_vjp(adj.fwd, adj.bwd, adj.diag_val, adj.shape[0], adj.shape[1], h)
    if cd is not None and orig_dtype != cd:
        out = out.astype(orig_dtype)
    return out


def _build_bucketed_side(rows, cols, vals, eids, num_rows, caps,
                         eid_sentinel, split_width=None) -> BucketedSide:
    """Vectorized host-side grouping. Rows with degree 0 map to the zero
    row of the concatenated output; rows with degree > ``split_width``
    (default ``caps[-1]``) are ROW-SPLIT: ``deg // split_width`` full-width
    virtual rows (merged back by one tiny sorted segment-sum) with the
    remainder re-entering the buckets — no edge ever takes the slow
    sorted-COO tail. Requires ``caps[-1]`` ≥ every remainder degree."""
    order = np.argsort(rows, kind="stable")
    r, c, v, e = rows[order], cols[order], vals[order], eids[order]
    deg = (np.bincount(r, minlength=num_rows) if len(r)
           else np.zeros(num_rows, np.int64))
    starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
    pos = (np.arange(len(r)) - starts[r]) if len(r) else np.zeros(0, np.int64)

    caps_arr = np.asarray(caps, np.int64)
    cap_max = int(split_width) if split_width is not None else int(caps_arr[-1])
    chunks = np.where(deg > cap_max, deg // cap_max, 0)
    deg_eff = deg - chunks * cap_max            # remainder enters the buckets
    # bucket of each row by its REMAINDER degree (0 → no regular group)
    bucket = np.searchsorted(caps_arr, deg_eff)
    cap_of_row = caps_arr[np.minimum(bucket, len(caps_arr) - 1)]
    virt_edge = pos < chunks[r] * cap_max
    pos_reg = pos - chunks[r] * cap_max         # lane within the regular slot
    in_slot = ~virt_edge                        # remainder always fits

    groups = []
    inv_map = np.full(num_rows + 1, -1, np.int64)
    offset = 0
    for bi, cap in enumerate(caps_arr):
        rows_g = np.nonzero((bucket == bi) & (deg_eff > 0))[0]
        if rows_g.size == 0:
            continue
        ng = int(rows_g.size)
        ng_pad = -(-ng // 8) * 8
        sc = np.zeros((ng_pad, cap), np.int32)
        sv = np.zeros((ng_pad, cap), np.float32)
        se = np.full((ng_pad, cap), eid_sentinel, np.int32)
        # local index of each group row
        local = np.full(num_rows, -1, np.int64)
        local[rows_g] = np.arange(ng)
        sel = in_slot & (local[r] >= 0)
        sc[local[r[sel]], pos_reg[sel]] = c[sel]
        sv[local[r[sel]], pos_reg[sel]] = v[sel]
        se[local[r[sel]], pos_reg[sel]] = e[sel]
        inv_map[rows_g] = offset + np.arange(ng)
        offset += ng_pad
        groups.append(EllGroup(row_ids=jnp.asarray(
            np.concatenate([rows_g, np.full(ng_pad - ng, num_rows)])
            .astype(np.int32)),
            slots_col=jnp.asarray(np.ascontiguousarray(sc.T)),
            slots_val=jnp.asarray(np.ascontiguousarray(sv.T)),
            slot_eid=jnp.asarray(np.ascontiguousarray(se.T))))
    zero_row = offset
    inv_map[inv_map < 0] = zero_row

    # virtual rows for the split hubs
    virt = None
    nv = int(chunks.sum())
    if nv:
        v_start = np.concatenate([[0], np.cumsum(chunks)[:-1]])
        nv_pad = -(-nv // 8) * 8
        vsc = np.zeros((nv_pad, cap_max), np.int32)
        vsv = np.zeros((nv_pad, cap_max), np.float32)
        vse = np.full((nv_pad, cap_max), eid_sentinel, np.int32)
        owner = np.full(nv_pad, num_rows, np.int64)
        split_rows = np.nonzero(chunks > 0)[0]
        owner[:nv] = np.repeat(split_rows, chunks[split_rows])
        vr = v_start[r[virt_edge]] + pos[virt_edge] // cap_max
        vl = pos[virt_edge] % cap_max
        vsc[vr, vl] = c[virt_edge]
        vsv[vr, vl] = v[virt_edge]
        vse[vr, vl] = e[virt_edge]
        virt = VirtGroup(owner=jnp.asarray(owner.astype(np.int32)),
                         slots_col=jnp.asarray(np.ascontiguousarray(vsc.T)),
                         slots_val=jnp.asarray(np.ascontiguousarray(vsv.T)),
                         slot_eid=jnp.asarray(np.ascontiguousarray(vse.T)))

    empty_i = np.zeros(0, np.int32)
    empty_f = np.zeros(0, np.float32)
    return BucketedSide(
        groups=tuple(groups),
        inv_map=jnp.asarray(inv_map[:num_rows].astype(np.int32)),
        tail_row=jnp.asarray(empty_i), tail_col=jnp.asarray(empty_i),
        tail_val=jnp.asarray(empty_f), tail_eid=jnp.asarray(empty_i),
        virt=virt)


def _build_classic_side(rows, cols, vals, eids, num_rows, num_cols, k,
                        eid_sentinel) -> BucketedSide:
    sc, sv, tr, tc, tv, se, te = build_ell_arrays(
        rows, cols, vals, num_rows, num_cols, k, edge_ids=eids,
        eid_sentinel=eid_sentinel)
    group = EllGroup(row_ids=None,
                     slots_col=jnp.asarray(np.ascontiguousarray(
                         np.asarray(sc).T)),
                     slots_val=jnp.asarray(np.ascontiguousarray(
                         np.asarray(sv).T)),
                     slot_eid=jnp.asarray(np.ascontiguousarray(
                         np.asarray(se).T)))
    return BucketedSide(groups=(group,), inv_map=None,
                        tail_row=jnp.asarray(tr), tail_col=jnp.asarray(tc),
                        tail_val=jnp.asarray(tv), tail_eid=jnp.asarray(te))


def _side_costs(deg, num_rows, caps, k_classic, split_width=None):
    """(classic_ns, bucketed_ns) estimates from the v5e cost constants."""
    tail_classic = int((deg - np.minimum(deg, k_classic)).sum())
    cost_classic = num_rows * k_classic * SLOT_NS + tail_classic * TAIL_NS
    caps_arr = np.asarray(caps, np.int64)
    cap_max = int(split_width) if split_width is not None else int(caps_arr[-1])
    chunks = np.where(deg > cap_max, deg // cap_max, 0)
    deg_eff = deg - chunks * cap_max
    bucket = np.searchsorted(caps_arr, deg_eff)
    cap_of_row = caps_arr[np.minimum(bucket, len(caps_arr) - 1)]
    slot_gathers = (int(cap_of_row[deg_eff > 0].sum())
                    + int(chunks.sum()) * cap_max)
    # virtual rows merge by a sorted segment-sum (a tail-row-priced op each)
    cost_bucketed = (slot_gathers * SLOT_NS + int(chunks.sum()) * TAIL_NS
                     + num_rows * UNPERM_NS)
    return cost_classic, cost_bucketed


@jax.tree_util.register_pytree_node_class
class BucketedEllAdj:
    """Dual-direction sparse adjacency with per-direction layout choice:
    degree-bucketed ELL where the tail is heavy, classic uniform-K ELL where
    it is not. Values are AD-constants; duck-types the EllAdj surface
    (``matmul`` / ``@`` / ``dropout`` / ``with_edge_values``)."""

    __slots__ = ("fwd", "bwd", "diag_val", "diag_eid", "_shape", "_num_edges")

    def __init__(self, fwd, bwd, diag_val, diag_eid, shape, num_edges):
        self.fwd = fwd
        self.bwd = bwd
        if diag_val is None:
            diag_val = jnp.zeros((0,), jnp.float32)
            diag_eid = jnp.zeros((0,), jnp.int32)
        self.diag_val = diag_val
        self.diag_eid = diag_eid
        self._shape = tuple(shape)
        self._num_edges = num_edges

    def tree_flatten(self):
        return ((self.fwd, self.bwd, self.diag_val, self.diag_eid),
                (self._shape, self._num_edges))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.fwd, obj.bwd, obj.diag_val, obj.diag_eid = children
        obj._shape, obj._num_edges = aux
        return obj

    @property
    def shape(self):
        return self._shape

    @property
    def num_edges(self):
        return self._num_edges

    @classmethod
    def from_coo(cls, index, value, shape, caps=None,
                 split_diag: bool = False,
                 layout: str = "auto") -> "BucketedEllAdj":
        """Host-side build (eager only). ``layout``: "auto" chooses per
        direction from the cost model; "bucketed"/"classic" force it.
        ``caps=None`` picks DP-optimal per-direction slot widths from the
        degree histogram (``_optimal_caps``); pass an explicit tuple to
        override (e.g. the pow2 ``_DEFAULT_CAPS``)."""
        if layout not in ("auto", "bucketed", "classic"):
            raise ValueError(f"layout must be auto|bucketed|classic, got {layout!r}")
        index = convert_union_to_numpy(index, np.int64)
        value = convert_union_to_numpy(value, np.float32)
        if value is None:
            value = np.ones(index.shape[1], np.float32)
        num_rows, num_cols = int(shape[0]), int(shape[1])
        num_edges = index.shape[1]
        ok = ((index[0] >= 0) & (index[0] < num_rows)
              & (index[1] >= 0) & (index[1] < num_cols))
        diag_val = diag_eid = None
        if split_diag:
            if num_rows != num_cols:
                raise ValueError("split_diag requires a square matrix")
            d_idx = np.nonzero(ok & (index[0] == index[1]))[0]
            if len(d_idx):
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

        def build(r, c, n_rows, n_cols):
            deg = (np.bincount(r, minlength=n_rows) if len(r)
                   else np.zeros(n_rows, np.int64))
            if caps is not None:
                side_caps, width = tuple(caps), None
            else:
                # DP over the POST-SPLIT remainder degrees: hubs beyond
                # _MAX_CAP become full-width virtual rows, so the buckets
                # only ever see remainders in [0, _MAX_CAP)
                chunks = np.where(deg > _MAX_CAP, deg // _MAX_CAP, 0)
                side_caps = _optimal_caps(deg - chunks * _MAX_CAP)
                width = _MAX_CAP
            k_classic = _choose_k(len(r), n_rows)
            cost_c, cost_b = _side_costs(deg, n_rows, side_caps, k_classic,
                                         split_width=width)
            use_bucketed = (layout == "bucketed"
                            or (layout == "auto" and cost_b < cost_c))
            if use_bucketed:
                return _build_bucketed_side(r, c, vals, eids, n_rows,
                                            side_caps, num_edges,
                                            split_width=width)
            return _build_classic_side(r, c, vals, eids, n_rows, n_cols,
                                       k_classic, num_edges)

        fwd = build(rows, cols, num_rows, num_cols)
        bwd = build(cols, rows, num_cols, num_rows)
        return cls(fwd, bwd, diag_val, diag_eid, (num_rows, num_cols),
                   num_edges)

    def with_edge_values(self, edge_values) -> "BucketedEllAdj":
        """Re-skin per-edge values through the eid maps (both directions)."""
        padded = jnp.concatenate([jnp.asarray(edge_values),
                                  jnp.zeros((1,), jnp.asarray(edge_values).dtype)])
        E = self._num_edges

        def pick(eid):
            return jnp.take(padded, jnp.clip(eid, 0, E), axis=0)

        def reskin(side: BucketedSide) -> BucketedSide:
            groups = tuple(g._replace(slots_val=pick(g.slot_eid))
                           for g in side.groups)
            virt = side.virt
            if virt is not None:
                virt = virt._replace(slots_val=pick(virt.slot_eid))
            return side._replace(groups=groups, tail_val=pick(side.tail_eid),
                                 virt=virt)

        diag_val = self.diag_val
        if diag_val.shape[0]:
            diag_val = pick(self.diag_eid)
        return BucketedEllAdj(reskin(self.fwd), reskin(self.bwd), diag_val,
                              self.diag_eid, self._shape, E)

    # -- EllAdj-compatible surface -------------------------------------------
    def matmul(self, h, num_or_size_splits=None):
        from ..sparse.matrix import chunked_feature_matmul
        return chunked_feature_matmul(lambda c: bucketed_spmm(self, c), h,
                                      num_or_size_splits)

    def __matmul__(self, h):
        return bucketed_spmm(self, h)

    def dropout(self, rate: float, key=None, training: bool = True):
        if not training or rate <= 0.0 or key is None:
            return self
        raise NotImplementedError(
            "edge dropout on BucketedEllAdj — use with_edge_values "
            "(nn/conv/gcn.py does this) or the COO SparseMatrix path")

    def __repr__(self):
        def side_repr(s):
            if s.inv_map is None:
                return f"classic(K={s.groups[0].slots_col.shape[0]})"
            r = ("bucketed[" + ",".join(str(g.slots_col.shape[0])
                                        for g in s.groups) + "]")
            if s.virt is not None:
                r += f"+virt({s.virt.owner.shape[0]})"
            return r
        return (f"BucketedEllAdj(shape={self._shape}, "
                f"fwd={side_repr(self.fwd)}, bwd={side_repr(self.bwd)}, "
                f"tail={self.fwd.tail_row.shape[0]})")
