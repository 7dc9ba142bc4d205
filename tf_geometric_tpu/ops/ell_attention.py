"""Fused scatter-free GAT attention on the ELL layout.

The measured cost of the un-fused GAT step at ogbn-arxiv scale (v5e, 8 heads,
256 units — see benchmarks/gat_breakdown.py) is ~405 ms: multihead ELL
aggregation fwd+bwd 197 ms (the d_att ``.at[eid].add`` scatters), SDDMM
fwd+bwd 99 ms (gather backward = scatter-add), segment softmax fwd+bwd
108 ms. Every one of those scatters disappears in the slot layout:

* **SDDMM**: slot (n, k) holds edge (row=n, col=slots_col[n,k]) — Q is
  row-ALIGNED (no gather), only K is gathered per slot; scores come out
  dense as ``[N, K, H]``.
* **softmax**: a per-destination softmax is a dense max/sum over the K slot
  lanes plus a short sorted-COO tail (sorted segment ops, no scatter).
* **aggregation**: weighted V gathers per slot (as ell_spmm_multihead).
* **backward**: dV and dK ride the *transpose* ELL (gathers of dy / Q by
  t_slots_col, with per-edge weights fetched by ``eid → flat slot position``
  gathers — the inverse map is precomputed on host); d(att) and dQ are
  row-aligned dense reductions. The only segment ops touch the tail, which
  is row-sorted.

Reference semantics: nn/conv/gat.py:49-89 (score = <Q_row, K_col>/√d,
destination softmax, attention dropout, weighted SpMM).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ell import EllAdj

__all__ = ["GatEllLayout", "build_gat_layout", "gat_attention_ell"]


def _slot_loop(n_slots: int, body, init, flag: str = "ell_attention_unroll_all"):
    """fori_loop or config-gated unroll over the K slot lanes.

    Unrolling lets XLA fuse the per-slot gathers and the accumulator adds
    into one fusion (accumulators written once instead of streaming HBM per
    iteration) — measured 63.0 → 40.8 ms on the transpose pass
    (benchmarks/transpose_variants.py); the larger-HLO compile cost is
    one-time via the persistent compilation cache. ``flag`` names the
    ops.config attribute gating the unroll."""
    from . import config as _config
    if getattr(_config, flag):
        carry = init
        for k in range(n_slots):
            carry = body(k, carry)
        return carry
    return jax.lax.fori_loop(0, n_slots, body, init)

_NEG = -1e30  # large-negative instead of -inf: keeps exp()/where() NaN-free


class GatEllLayout(NamedTuple):
    """EllAdj + host-composed transpose→forward-position maps.

    ``eid_pos[e]`` is the flat position of edge ``e`` in the forward layout:
    ``n*K + k`` if it landed in slot (n, k), ``N*K + t`` if it landed at tail
    position t. ``t_slot_pos``/``t_tail_pos`` are ``eid_pos`` pre-composed
    with the transpose layout's edge ids (sentinel → the zero row
    ``N*K + T``), so backward fetches forward-layout per-edge quantities for
    the transpose pass with ONE narrow gather — no edge-order round trip.
    """
    ell: EllAdj
    eid_pos: jnp.ndarray     # [E] int32
    t_slot_pos: jnp.ndarray  # [num_cols, K] int32
    t_tail_pos: jnp.ndarray  # [T_t] int32


def build_gat_layout(ell: EllAdj) -> GatEllLayout:
    """Host-side: invert slot_eid/tail_eid into eid→position and compose it
    with the transpose layout's edge ids (eager only)."""
    slot_eid = np.asarray(jax.device_get(ell.slot_eid))
    tail_eid = np.asarray(jax.device_get(ell.tail_eid))
    t_slot_eid = np.asarray(jax.device_get(ell.t_slot_eid))
    t_tail_eid = np.asarray(jax.device_get(ell.t_tail_eid))
    N, K = slot_eid.shape
    T = tail_eid.shape[0]
    E = ell.num_edges
    zero_row = N * K + T  # flat per-edge arrays carry one extra zero row
    pos = np.full(E + 1, zero_row, np.int32)  # sentinel → zero row
    flat = slot_eid.reshape(-1)
    ok = flat < E
    pos[flat[ok]] = np.nonzero(ok)[0].astype(np.int32)
    tok = tail_eid < E
    pos[tail_eid[tok]] = (N * K + np.nonzero(tok)[0]).astype(np.int32)
    t_slot_pos = pos[np.clip(t_slot_eid, 0, E)]
    t_tail_pos = pos[np.clip(t_tail_eid, 0, E)]
    return GatEllLayout(ell=ell, eid_pos=jnp.asarray(pos[:E]),
                        t_slot_pos=jnp.asarray(t_slot_pos),
                        t_tail_pos=jnp.asarray(t_tail_pos))


def _blocksum(prod, H: int, d: int):
    """[M, H·d] → [M, H]: per-head block reduction (accumulate in f32)."""
    return prod.astype(jnp.float32).reshape(prod.shape[0], H, d).sum(-1)


def _expand(a, d: int):
    """[M, H] → [M, H·d]: per-head scalar repeated across its block."""
    return jnp.repeat(a, d, axis=-1)


def _slot_scores(slots_col, slot_eid, Q, K, H, d, inv_scale, num_edges):
    """Dense [N, Kslots, H] scores; invalid slots → large-negative."""
    N = slots_col.shape[0]
    Kslots = slots_col.shape[1]
    n_src = K.shape[0]

    def body(k, s):
        col_k = jax.lax.dynamic_index_in_dim(slots_col, k, 1, keepdims=False)
        k_rows = jnp.take(K, jnp.clip(col_k, 0, n_src - 1), axis=0)
        s_k = _blocksum(Q * k_rows, H, d) * inv_scale           # [N, H]
        eid_k = jax.lax.dynamic_index_in_dim(slot_eid, k, 1, keepdims=False)
        s_k = jnp.where((eid_k < num_edges)[:, None], s_k, _NEG)
        return jax.lax.dynamic_update_index_in_dim(s, s_k, k, 1)

    return _slot_loop(Kslots, body,
                      jnp.full((N, Kslots, H), _NEG, jnp.float32))


def _tail_scores(tail_row, tail_col, Q, K, H, d, inv_scale, num_rows):
    n_src = K.shape[0]
    q = jnp.take(Q, jnp.clip(tail_row, 0, num_rows - 1), axis=0)
    k = jnp.take(K, jnp.clip(tail_col, 0, n_src - 1), axis=0)
    s = _blocksum(q * k, H, d) * inv_scale                       # [T, H]
    return jnp.where((tail_row < num_rows)[:, None], s, _NEG)


def _softmax_slots_tail(s_slots, s_tail, slot_valid, tail_valid, tail_row,
                        num_rows, s_diag=None, diag_valid=None):
    """Destination softmax across (K slots ∪ tail ∪ diag lane) per row,
    denominator folded in; invalid entries → exactly 0 (empty rows aggregate
    to 0). ``s_diag`` [N, H] carries the split-out self-loop scores — a
    fully dense lane (no gathers, no segment ops); ``diag_valid`` [N] masks
    rows whose diag slot is the padding sentinel (a row with NO valid entry
    has row_max == _NEG, so exp(s_diag - row_max) would be 1 unmasked)."""
    H = s_slots.shape[-1]
    slot_max = s_slots.max(axis=1)                               # [N, H]
    if s_tail.shape[0]:
        t_max = jax.ops.segment_max(s_tail, tail_row, num_segments=num_rows,
                                    indices_are_sorted=True)
        row_max = jnp.maximum(slot_max, t_max)
    else:
        row_max = slot_max
    if s_diag is not None:
        row_max = jnp.maximum(row_max, s_diag)
    p_slots = jnp.exp(s_slots - row_max[:, None, :])
    p_slots = jnp.where(slot_valid[:, :, None], p_slots, 0.0)
    denom = p_slots.sum(axis=1)
    if s_diag is not None:
        p_diag = jnp.exp(s_diag - row_max)                       # [N, H]
        if diag_valid is not None:
            p_diag = jnp.where(diag_valid[:, None], p_diag, 0.0)
        denom = denom + p_diag
    else:
        p_diag = None
    if s_tail.shape[0]:
        safe_tr = jnp.clip(tail_row, 0, num_rows - 1)
        p_tail = jnp.exp(s_tail - jnp.take(row_max, safe_tr, axis=0))
        p_tail = jnp.where(tail_valid[:, None], p_tail, 0.0)
        denom = denom + jax.ops.segment_sum(p_tail, tail_row,
                                            num_segments=num_rows,
                                            indices_are_sorted=True)
    else:
        p_tail = jnp.zeros((0, H), jnp.float32)
    inv_denom = 1.0 / (denom + 1e-16)
    a_slots = p_slots * inv_denom[:, None, :]
    a_diag = p_diag * inv_denom if p_diag is not None else None
    if s_tail.shape[0]:
        a_tail = p_tail * jnp.take(inv_denom, jnp.clip(tail_row, 0,
                                                       num_rows - 1), axis=0)
    else:
        a_tail = p_tail
    return a_slots, a_tail, a_diag


def _aggregate(slots_col, tail_row, tail_col, a_slots, a_tail, V, d,
               num_rows, a_diag=None):
    """out[n] = Σ_k a_slots[n,k,:]⊗V[col_k]  (+ sorted tail + dense diag)."""
    n_src = V.shape[0]
    Kslots = slots_col.shape[1]

    def body(k, out):
        col_k = jax.lax.dynamic_index_in_dim(slots_col, k, 1, keepdims=False)
        v = jnp.take(V, jnp.clip(col_k, 0, n_src - 1), axis=0)
        a_k = jax.lax.dynamic_index_in_dim(a_slots, k, 1, keepdims=False)
        return out + v * _expand(a_k, d).astype(V.dtype)

    out = _slot_loop(Kslots, body,
                     jnp.zeros((num_rows, V.shape[1]), V.dtype))
    if tail_row.shape[0]:
        v = jnp.take(V, jnp.clip(tail_col, 0, n_src - 1), axis=0)
        msg = v * _expand(a_tail, d).astype(V.dtype)
        out = out + jax.ops.segment_sum(msg, tail_row, num_segments=num_rows,
                                        indices_are_sorted=True)
    if a_diag is not None:
        out = out + V * _expand(a_diag, d).astype(V.dtype)  # row-aligned
    return out


# ---------------------------------------------------------------------------
# custom VJP. Layout index arrays are ordinary (non-differentiated) array
# args with None cotangents — the same pattern as ops/ell.py; statics are
# nondiff_argnums.


def _fused_core(slots_col, slot_eid, tail_row, tail_col, diag_eid,
                num_rows, num_edges, H, d,
                Q, K, V, keep_slots, keep_tail, keep_diag):
    inv_scale = 1.0 / np.sqrt(float(d))
    s_slots = _slot_scores(slots_col, slot_eid, Q, K, H, d, inv_scale,
                           num_edges)
    s_tail = _tail_scores(tail_row, tail_col, Q, K, H, d, inv_scale, num_rows)
    if diag_eid.shape[0]:
        # split-out self-loops: score, softmax lane, and aggregation are all
        # row-aligned dense ops — zero gathers for ~13% of the edges
        s_diag = _blocksum(Q * K, H, d) * inv_scale              # [N, H]
        s_diag = jnp.where((diag_eid < num_edges)[:, None], s_diag, _NEG)
    else:
        s_diag = None
    slot_valid = slot_eid < num_edges
    tail_valid = tail_row < num_rows
    diag_valid = (diag_eid < num_edges) if s_diag is not None else None
    a_slots, a_tail, a_diag = _softmax_slots_tail(
        s_slots, s_tail, slot_valid, tail_valid, tail_row, num_rows, s_diag,
        diag_valid)
    ad_slots = a_slots * keep_slots
    ad_tail = a_tail * keep_tail
    ad_diag = a_diag * keep_diag if a_diag is not None else None
    out = _aggregate(slots_col, tail_row, tail_col, ad_slots, ad_tail, V, d,
                     num_rows, ad_diag)
    return out, (a_slots, a_tail, a_diag, ad_slots, ad_tail, ad_diag)


def _fused_impl(num_rows, num_edges, H, d,
                slots_col, slot_eid, tail_row, tail_col, diag_eid,
                t_slots_col, t_slot_pos, t_tail_row, t_tail_col, t_tail_pos,
                Q, K, V, keep_slots, keep_tail, keep_diag):
    out, _ = _fused_core(slots_col, slot_eid, tail_row, tail_col, diag_eid,
                         num_rows, num_edges, H, d,
                         Q, K, V, keep_slots, keep_tail, keep_diag)
    return out


_fused_vjp = jax.custom_vjp(_fused_impl, nondiff_argnums=(0, 1, 2, 3))


def _fused_fwd(num_rows, num_edges, H, d,
               slots_col, slot_eid, tail_row, tail_col, diag_eid,
               t_slots_col, t_slot_pos, t_tail_row, t_tail_col, t_tail_pos,
               Q, K, V, keep_slots, keep_tail, keep_diag):
    out, (a_slots, a_tail, a_diag, _, _, _) = _fused_core(
        slots_col, slot_eid, tail_row, tail_col, diag_eid,
        num_rows, num_edges, H, d, Q, K, V, keep_slots, keep_tail, keep_diag)
    # ad_* = a_* · keep_* is recomputed in backward (one VPU multiply) —
    # saving both would double the [N, K, H] softmax residual in HBM
    return out, (slots_col, tail_row, tail_col,
                 t_slots_col, t_slot_pos, t_tail_row, t_tail_col, t_tail_pos,
                 Q, K, V, a_slots, a_tail, a_diag,
                 keep_slots, keep_tail, keep_diag)


def _fused_bwd(num_rows, num_edges, H, d, residuals, dy):
    (slots_col, tail_row, tail_col,
     t_slots_col, t_slot_pos, t_tail_row, t_tail_col, t_tail_pos,
     Q, K, V, a_slots, a_tail, a_diag,
     keep_slots, keep_tail, keep_diag) = residuals
    ad_slots = a_slots * keep_slots
    ad_tail = a_tail * keep_tail
    ad_diag = a_diag * keep_diag if a_diag is not None else None
    N = num_rows
    n_src = V.shape[0]
    Kslots = slots_col.shape[1]
    T = tail_row.shape[0]
    inv_scale = 1.0 / np.sqrt(float(d))

    # dã[n,k,h] = <dy[n] block h, V[col_k] block h>  (dense, row-aligned)
    def body_da(k, da):
        col_k = jax.lax.dynamic_index_in_dim(slots_col, k, 1, keepdims=False)
        v = jnp.take(V, jnp.clip(col_k, 0, n_src - 1), axis=0)
        da_k = _blocksum(dy * v, H, d)
        return jax.lax.dynamic_update_index_in_dim(da, da_k, k, 1)

    da_slots = _slot_loop(Kslots, body_da,
                          jnp.zeros((N, Kslots, H), jnp.float32))
    if T:
        dyr = jnp.take(dy, jnp.clip(tail_row, 0, N - 1), axis=0)
        vc = jnp.take(V, jnp.clip(tail_col, 0, n_src - 1), axis=0)
        da_tail = _blocksum(dyr * vc, H, d)
    else:
        da_tail = jnp.zeros((0, H), jnp.float32)

    has_diag = a_diag is not None
    if has_diag:
        da_diag = _blocksum(dy * V, H, d)                     # row-aligned
    # dropout: ã = a·keep  ⇒  da = dã·keep
    da_slots = da_slots * keep_slots
    da_tail = da_tail * keep_tail
    if has_diag:
        da_diag = da_diag * keep_diag

    # softmax backward: ds = a ⊙ (da − g[row]),  g = Σ_edges a·da per row
    g = (a_slots * da_slots).sum(axis=1)                      # [N, H]
    if has_diag:
        g = g + a_diag * da_diag
    if T:
        g = g + jax.ops.segment_sum(a_tail * da_tail, tail_row,
                                    num_segments=N, indices_are_sorted=True)
    ds_slots = a_slots * (da_slots - g[:, None, :]) * inv_scale
    if has_diag:
        ds_diag = a_diag * (da_diag - g) * inv_scale          # [N, H]
    if T:
        g_t = jnp.take(g, jnp.clip(tail_row, 0, N - 1), axis=0)
        ds_tail = a_tail * (da_tail - g_t) * inv_scale
    else:
        ds_tail = da_tail

    # dQ[n] = Σ_k ds[n,k,:] ⊗ K[col_k]  (dense) + tail (sorted segsum)
    def body_dq(k, dq):
        col_k = jax.lax.dynamic_index_in_dim(slots_col, k, 1, keepdims=False)
        krows = jnp.take(K, jnp.clip(col_k, 0, n_src - 1), axis=0)
        ds_k = jax.lax.dynamic_index_in_dim(ds_slots, k, 1, keepdims=False)
        return dq + krows * _expand(ds_k, d).astype(K.dtype)

    dQ = _slot_loop(Kslots, body_dq, jnp.zeros_like(Q))
    if T:
        kc = jnp.take(K, jnp.clip(tail_col, 0, n_src - 1), axis=0)
        msg = kc * _expand(ds_tail, d).astype(K.dtype)
        dQ = dQ + jax.ops.segment_sum(msg, tail_row, num_segments=N,
                                      indices_are_sorted=True)
    if has_diag:
        # every diag term is row-aligned: dQ += K·ds, dK += Q·ds, dV += dy·ã
        dQ = dQ + K * _expand(ds_diag, d).astype(K.dtype)

    # dV[m] = Σ_{e: col=m} ã_e ⊗ dy[row_e]  and
    # dK[m] = Σ_{e: col=m} ds_e ⊗ Q[row_e]  share the transpose layout and
    # the same per-edge positions — ONE combined pass: a single narrow
    # gather fetches both weights ([·, 2H] from the concatenated flat
    # array), then two wide gathers (dy, Q) update both outputs.
    w_flat = jnp.concatenate([
        jnp.concatenate([ad_slots.reshape(N * Kslots, H),
                         ad_tail.reshape(-1, H),
                         jnp.zeros((1, H), ad_slots.dtype)]),
        jnp.concatenate([ds_slots.reshape(N * Kslots, H),
                         ds_tail.reshape(-1, H),
                         jnp.zeros((1, H), ds_slots.dtype)]),
    ], axis=-1)                                               # [N·K+T+1, 2H]
    zero_row = N * Kslots + T
    TKslots = t_slots_col.shape[1]

    def body_t(k, carry):
        dV, dK = carry
        col_k = jax.lax.dynamic_index_in_dim(t_slots_col, k, 1, keepdims=False)
        pos_k = jax.lax.dynamic_index_in_dim(t_slot_pos, k, 1, keepdims=False)
        w = jnp.take(w_flat, jnp.clip(pos_k, 0, zero_row), axis=0)  # [M, 2H]
        safe = jnp.clip(col_k, 0, N - 1)
        dyr = jnp.take(dy, safe, axis=0)
        qr = jnp.take(Q, safe, axis=0)
        dV = dV + dyr * _expand(w[:, :H], d).astype(dy.dtype)
        dK = dK + qr * _expand(w[:, H:], d).astype(Q.dtype)
        return dV, dK

    dV, dK = _slot_loop(
        TKslots, body_t,
        (jnp.zeros((n_src, dy.shape[1]), dy.dtype), jnp.zeros_like(K)),
        flag="ell_attention_unroll_transpose")
    if t_tail_row.shape[0]:
        w = jnp.take(w_flat, jnp.clip(t_tail_pos, 0, zero_row), axis=0)
        safe = jnp.clip(t_tail_col, 0, N - 1)
        dyr = jnp.take(dy, safe, axis=0)
        qr = jnp.take(Q, safe, axis=0)
        msg = jnp.concatenate([dyr * _expand(w[:, :H], d).astype(dy.dtype),
                               qr * _expand(w[:, H:], d).astype(Q.dtype)],
                              axis=-1)
        seg = jax.ops.segment_sum(msg, t_tail_row, num_segments=n_src,
                                  indices_are_sorted=True)
        Hd = dy.shape[1]
        dV = dV + seg[:, :Hd]
        dK = dK + seg[:, Hd:]
    if has_diag:
        dV = dV + dy * _expand(ad_diag, d).astype(dy.dtype)
        dK = dK + Q * _expand(ds_diag, d).astype(Q.dtype)

    return (None, None, None, None, None, None, None, None, None, None,
            dQ.astype(Q.dtype), dK.astype(K.dtype), dV.astype(V.dtype),
            jnp.zeros_like(keep_slots), jnp.zeros_like(keep_tail),
            jnp.zeros_like(keep_diag))


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def gat_attention_ell(layout: GatEllLayout, Q, K, V, num_heads: int,
                      edge_drop_rate: float = 0.0, training: bool = False,
                      dropout_key=None, compute_dtype=None):
    """Fused GAT attention: SDDMM scores, destination softmax, attention
    dropout, and weighted aggregation in one scatter-free pass over the ELL
    layout.

    Q/K/V: [N, H·d] head-blocked, with equal per-head width d (the reference
    layers always satisfy this; nn/conv/gat.py falls back to the segment
    path otherwise). Returns [num_rows, H·d]. Matches the reference pipeline
    nn/conv/gat.py:49-89 numerically (same √d scaling, same softmax).

    ``compute_dtype`` (default ``ops.config.ell_compute_dtype``) runs the
    gather-heavy passes in reduced precision; scores accumulate and softmax
    runs in float32 for stability.
    """
    from . import config as _config
    cd = compute_dtype if compute_dtype is not None else _config.ell_compute_dtype
    ell = layout.ell
    H = num_heads
    d_q = Q.shape[-1] // H
    d_v = V.shape[-1] // H
    if d_q != d_v:
        raise NotImplementedError(
            "fused ELL attention requires query/key head width == value "
            "head width; use the segment path otherwise")
    if training and edge_drop_rate > 0.0 and dropout_key is None:
        raise ValueError(
            "gat_attention_ell requires dropout_key when training with "
            "edge_drop_rate > 0 (a silent no-op would train unregularized)")
    if training and edge_drop_rate > 0.0:
        k1, k2, k3 = jax.random.split(dropout_key, 3)
        scale = 1.0 / (1.0 - edge_drop_rate)
        keep_slots = jax.random.bernoulli(
            k1, 1.0 - edge_drop_rate,
            (ell.shape[0], ell.slots_col.shape[1], H)).astype(jnp.float32) * scale
        keep_tail = jax.random.bernoulli(
            k2, 1.0 - edge_drop_rate,
            (ell.tail_row.shape[0], H)).astype(jnp.float32) * scale
        keep_diag = jax.random.bernoulli(
            k3, 1.0 - edge_drop_rate,
            (ell.diag_eid.shape[0], H)).astype(jnp.float32) * scale
    else:
        keep_slots = jnp.ones((), jnp.float32)
        keep_tail = jnp.ones((), jnp.float32)
        keep_diag = jnp.ones((), jnp.float32)

    out_dtype = V.dtype
    if cd is not None:
        Q, K, V = Q.astype(cd), K.astype(cd), V.astype(cd)
    out = _fused_vjp(ell.shape[0], ell.num_edges, H, d_v,
                     ell.slots_col, ell.slot_eid, ell.tail_row, ell.tail_col,
                     ell.diag_eid,
                     ell.t_slots_col, layout.t_slot_pos, ell.t_tail_row,
                     ell.t_tail_col, layout.t_tail_pos,
                     Q, K, V, keep_slots, keep_tail, keep_diag)
    return out.astype(out_dtype)
