"""shard_map graph-parallel execution: edge-partitioned SpMM + DP training.

Replaces the reference's replicated MirroredStrategy demos (SURVEY §2.8) with
a real graph-parallel runtime: nodes live in contiguous row blocks (one per
device along the ``graph`` mesh axis), every SpMM segment-reduces locally on
the destination side and fetches source features via an XLA collective
(``all_gather`` over ICI; halo-indexed exchange is the optimization on top).

The mesh may also carry a ``data`` axis for batched-graph data parallelism —
inputs here are replicated along it, so gradients are identical across
``data`` and only the ``graph`` axis needs a ``psum`` (a true data-parallel
variant that splits batches over ``data`` must psum over both axes; see
``demo/demo_distributed_mean_pool.py`` for that pattern).

Halo-plan arrays are passed as shard_map ARGUMENTS sharded over the graph
axis — each device holds only its own edge shard. (Baking them in as jit
constants would replicate all P shards onto every device: per-device plan
memory would scale with TOTAL edges, which defeats sharding at exactly the
graph sizes that need it. The constants-vs-arguments 2.1× rule from
docs/performance.md was measured single-chip on the ELL kernels and does
not transfer here.)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["sharded_spmm_local", "make_graph_parallel_gcn_step", "make_batch_2d_step",
           "make_graph_parallel_gat_step", "make_graph_parallel_gat_fused_step",
           "make_graph_parallel_mincut_step", "build_mesh"]


def build_mesh(axis_sizes: dict, devices: Optional[Sequence] = None) -> Mesh:
    """Create a Mesh from {axis_name: size}; total must cover the devices."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, tuple(axis_sizes.keys()))


def sharded_spmm_local(h_global, local_row, global_col, value, nodes_per_part: int):
    """Device-local half of a sharded SpMM: gather from the (all-gathered)
    global features, segment-reduce into the local row block.

    Runs *inside* shard_map; all shapes are the per-device shard shapes.
    """
    safe_col = jnp.clip(global_col, 0, h_global.shape[0] - 1)
    msg = jnp.take(h_global, safe_col, axis=0) * value[:, None]
    return jax.ops.segment_sum(msg, local_row, num_segments=nodes_per_part)


def _plan_arrays(halo_spec):
    """The halo plan as jnp arrays, in the order the sharded steps expect:
    (send_idx, loc_row, loc_col, loc_val, rem_row, rem_addr, rem_val)."""
    return tuple(jnp.asarray(a) for a in
                 (halo_spec.send_idx,
                  halo_spec.loc_row, halo_spec.loc_col, halo_spec.loc_val,
                  halo_spec.rem_row, halo_spec.rem_addr, halo_spec.rem_val))


def _plan_specs(graph_axis: str):
    """shard_map in_specs for ``_plan_arrays`` (leading dim = device)."""
    return (P(graph_axis, None, None),) + (P(graph_axis, None),) * 6


def _squeeze_plan(plan):
    """Inside shard_map each plan array arrives with a leading length-1
    device dim — drop it."""
    return tuple(a[0] for a in plan)


def _resolve_plan(halo_spec, graph_axis: str):
    """(plan_args, in_specs) for either plan flavor.

    Accepts a HaloSpec (COO blocks), a HaloSpecEll (packed ELL blocks), or a
    plain tuple of already-distributed arrays (multi-host per-process shard
    loading, parallel/multihost.distribute_halo_plan) — distinguished by
    length: 7 = COO, 23 = ELL.
    """
    from jax.sharding import PartitionSpec
    from .halo import ell_plan_arrays, ell_plan_specs

    if hasattr(halo_spec, "local"):           # HaloSpecEll
        return ell_plan_arrays(halo_spec), ell_plan_specs(halo_spec, graph_axis)
    if hasattr(halo_spec, "send_idx"):        # HaloSpec
        return _plan_arrays(halo_spec), _plan_specs(graph_axis)
    plan = tuple(halo_spec)                   # pre-distributed arrays
    if len(plan) == 7:
        return plan, _plan_specs(graph_axis)
    return plan, tuple(
        PartitionSpec(graph_axis, *([None] * (a.ndim - 1))) for a in plan)


def make_graph_parallel_gcn_step(mesh: Mesh, graph_axis: str = "graph",
                                 num_layers: int = 2, hidden: int = 16,
                                 num_classes: int = 7, learning_rate: float = 1e-2,
                                 halo_spec=None):
    """Build a jitted, shard_map'd full training step for an edge-partitioned
    multi-layer GCN.

    Without ``halo_spec`` (all_gather mode) the step is
    ``step(params, opt_state, x_shard, rows, cols, vals, y_shard,
    mask_shard)``. With ``halo_spec`` the returned step closes over the plan
    (each device receives only its shard through shard_map) and is
    ``step(params, opt_state, x_shard, y_shard, mask_shard)``: forward,
    backward (grads psum-ed over the graph axis → replicated), Adam update,
    entirely under ``jit`` over the mesh. The halo forward starts the
    all_to_all first and aggregates the device-local edges while it is in
    flight (no data dependency), so ICI time hides under local compute.
    """
    import optax

    optimizer = optax.adam(learning_rate)

    def forward_halo(params, x_local, send_idx_local, plan, nodes_per_part):
        from .halo import halo_exchange, halo_spmm_ell, halo_spmm_split
        ell_mode = len(plan) == 22  # 11 local + 11 remote block arrays
        h_local = x_local
        for li, (w, b) in enumerate(params):
            hw_local = h_local @ w
            recv = halo_exchange(hw_local, send_idx_local, graph_axis)
            if ell_mode:
                h_local = halo_spmm_ell(hw_local, recv, plan) + b
            else:
                h_local = halo_spmm_split(hw_local, recv, *plan,
                                          nodes_per_part) + b
            if li < len(params) - 1:
                h_local = jax.nn.relu(h_local)
        return h_local

    def forward(params, x_local, rows, cols, vals, nodes_per_part):
        """cols are global node ids, resolved against the all-gathered h."""
        h_local = x_local
        for li, (w, b) in enumerate(params):
            hw_local = h_local @ w
            h_global = jax.lax.all_gather(hw_local, graph_axis, tiled=True)
            h_local = sharded_spmm_local(h_global, rows, cols, vals,
                                         nodes_per_part) + b
            if li < len(params) - 1:
                h_local = jax.nn.relu(h_local)
        return h_local

    def finish_step(params, opt_state, loss_fn):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Each device's grads hold only its local contribution to the global
        # loss (psum's AD transpose is a broadcast, and cross-device feature
        # terms already flowed through the collective's transpose); summing
        # over the graph axis yields the full gradient. Inputs are replicated
        # along any data axis, so values stay invariant there (vma-typed) —
        # no further reduction needed.
        grads = jax.tree.map(lambda g: jax.lax.psum(g, graph_axis), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def masked_ce(logits, y_local, mask_local):
        import optax as _optax
        ce = _optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.clip(y_local, 0, None))
        total = jax.lax.psum(jnp.sum(ce * mask_local), graph_axis)
        count = jax.lax.psum(jnp.sum(mask_local), graph_axis)
        return total / jnp.maximum(count, 1.0)

    shard_spec = P(graph_axis, None)
    edge_spec = P(graph_axis)
    if halo_spec is not None:
        def local_step(params, opt_state, x_local, y_local, mask_local, *plan):
            send_idx_local = plan[0][0]
            edge_plan = _squeeze_plan(plan[1:])
            nodes_per_part = x_local.shape[0]

            def loss_fn(p):
                logits = forward_halo(p, x_local, send_idx_local, edge_plan,
                                      nodes_per_part)
                return masked_ce(logits, y_local, mask_local)

            return finish_step(params, opt_state, loss_fn)

        plan_args, plan_specs = _resolve_plan(halo_spec, graph_axis)
        inner = shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), shard_spec, P(graph_axis), P(graph_axis))
            + plan_specs,
            out_specs=(P(), P(), P()),
        )
        jitted = jax.jit(inner)

        def step(params, opt_state, x, y, mask):
            return jitted(params, opt_state, x, y, mask, *plan_args)

        return step, optimizer

    def local_step_ag(params, opt_state, x_local, rows, cols, vals,
                      y_local, mask_local):
        nodes_per_part = x_local.shape[0]

        def loss_fn(p):
            logits = forward(p, x_local, rows, cols, vals, nodes_per_part)
            return masked_ce(logits, y_local, mask_local)

        return finish_step(params, opt_state, loss_fn)

    step = shard_map(
        local_step_ag, mesh=mesh,
        in_specs=(P(), P(), shard_spec, edge_spec, edge_spec, edge_spec,
                  P(graph_axis), P(graph_axis)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(step), optimizer


def make_graph_parallel_mincut_step(mesh: Mesh, graph_axis: str = "graph",
                                    num_clusters: int = 32, hidden: int = 16,
                                    num_classes: int = 7,
                                    learning_rate: float = 1e-2,
                                    cut_coef: float = 1.0,
                                    orth_coef: float = 1.0,
                                    variant: str = "min_cut"):
    """Edge-partitioned hierarchical pooling (BASELINE config 5): a sharded
    GCN encoder + assignment GNN, MinCutPool/DiffPool coarsening distributed
    over the ``graph`` mesh axis, a dense coarse-level GCN, unpooling, and a
    node-classification head — one jitted shard_map training step.

    Distribution layout (single large graph, edges owned by destination row):

    * encoder + assignment: one ``all_gather`` carries both projections
      (``x·W0 ‖ x·Wa``), local segment-sum aggregation per row block;
    * coarsening: ``SᵀÃS`` and ``Sᵀh`` reduce to *local MXU matmuls over the
      device's edge/node shard* followed by a ``psum`` of the tiny [C, C] /
      [C, hidden] partials — the TPU-native form of the reference's global
      densify (nn/pool/cluster_pool.py:31-38), which never materializes a
      global assignment matrix on any device;
    * MinCut losses (nn/pool/min_cut_pool.py:8-90): ``tr(SᵀÃS)`` is the trace
      of the psum-ed pooled adjacency; ``tr(SᵀDS)`` and ``SᵀS`` come from
      device-local partials + psum — identical formulas, distributed
      evaluation;
    * coarse level: the pooled graph is C×C dense and replicated — its GCN
      layer costs nothing at C ≤ a few hundred;
    * unpool: ``h2 = S_local @ coarse`` needs no collective (row-aligned).

    ``variant``: ``"min_cut"`` zeroes pooled self-loops and adds
    ``cut_coef·L_cut + orth_coef·L_orth`` to the loss
    (min_cut_pool.py:127-146); ``"diff"`` keeps the diagonal and trains on
    CE alone (nn/pool/diff_pool.py:42-52 semantics).

    For exact MinCut semantics pass edge values from
    ``adj_norm_edge(..., add_self_loop=False)`` — the same normalized
    weights then drive the encoder GNNs (the reference's
    ``gnn_use_normed_edge=True`` default, min_cut_pool.py:163).

    Returns ``(step, optimizer)`` with
    ``step(params, opt_state, x, rows, cols, vals, y, mask, valid)
    -> (params, opt_state, (loss, ce, cut, orth))`` where rows/cols/vals are
    the flattened ``partition_edges_by_row`` shards,
    ``params = ((w0, b0), (wa, ba), (wc, bc), (wo, bo))``, ``mask`` is the
    training-label mask and ``valid`` flags real (non-padding) node rows —
    padding rows would otherwise leak ``softmax(ba)`` assignment mass into
    the pooled partials (their assignment rows are zeroed).
    """
    import optax

    if variant not in ("min_cut", "diff"):
        raise ValueError(f"variant must be 'min_cut' or 'diff', got {variant!r}")
    optimizer = optax.adam(learning_rate)
    C = num_clusters

    def local_step(params, opt_state, x_local, rows, cols, vals,
                   y_local, mask_local, valid_local):
        npp = x_local.shape[0]

        def loss_fn(p):
            (w0, b0), (wa, ba), (wc, bc), (wo, bo) = p
            # one all_gather carries encoder ‖ assignment projections
            proj = jnp.concatenate([x_local @ w0, x_local @ wa], axis=-1)
            proj_g = jax.lax.all_gather(proj, graph_axis, tiled=True)
            agg = sharded_spmm_local(proj_g, rows, cols, vals, npp)
            h1 = jax.nn.relu(agg[:, :w0.shape[1]] + b0)          # [npp, H]
            s_local = jax.nn.softmax(agg[:, w0.shape[1]:] + ba)  # [npp, C]
            s_local = s_local * valid_local[:, None]  # padding rows → 0

            # coarsen: pooled_x = psum(S_locᵀ h1); pooled_adj = psum over
            # local edges of w_e·S[row_e]⊗S[col_e] — both local matmuls
            pooled_x = jax.lax.psum(s_local.T @ h1, graph_axis)  # [C, H]
            s_g = jax.lax.all_gather(s_local, graph_axis, tiled=True)
            s_row = jnp.take(s_local, jnp.clip(rows, 0, npp - 1), axis=0)
            s_row = jnp.where((rows < npp)[:, None], s_row, 0.0)
            s_col = jnp.take(s_g, jnp.clip(cols, 0, s_g.shape[0] - 1), axis=0)
            pooled_adj = jax.lax.psum(
                (s_row * vals[:, None]).T @ s_col, graph_axis)   # [C, C]

            if variant == "min_cut":
                # cut = −tr(SᵀÃS)/tr(SᵀDS); orth = ‖SᵀS/‖SᵀS‖_F − I/√C‖_F
                intra = jnp.trace(pooled_adj)
                deg_local = jax.ops.segment_sum(vals, rows, num_segments=npp)
                all_sum = jax.lax.psum(
                    jnp.sum(deg_local * jnp.sum(s_local * s_local, axis=-1)),
                    graph_axis)
                cut_loss = -intra / (all_sum + 1e-8)
                sts = jax.lax.psum(s_local.T @ s_local, graph_axis)
                sts_n = sts / (jnp.sqrt(jnp.sum(sts * sts)) + 1e-8)
                dev = sts_n - jnp.eye(C) / jnp.sqrt(jnp.float32(C))
                orth_loss = jnp.sqrt(jnp.sum(dev * dev))
                # zero pooled self-loops (min_cut_pool.py:127-146)
                pooled_adj = pooled_adj * (1.0 - jnp.eye(C))
            else:
                cut_loss = orth_loss = jnp.float32(0.0)

            # coarse dense GCN (replicated, C×C) + unpool + head
            coarse = jax.nn.relu(pooled_adj @ (pooled_x @ wc) + bc)
            h2 = s_local @ coarse                                # [npp, H]
            logits = jnp.concatenate([h1, h2], axis=-1) @ wo + bo
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(y_local, 0, None))
            total = jax.lax.psum(jnp.sum(ce * mask_local), graph_axis)
            count = jax.lax.psum(jnp.sum(mask_local), graph_axis)
            ce_loss = total / jnp.maximum(count, 1.0)
            loss = ce_loss + cut_coef * cut_loss + orth_coef * orth_loss
            return loss, (ce_loss, cut_loss, orth_loss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # each device's grad holds the loss's sensitivity through ITS shard
        # only (psum's transpose broadcasts the cotangent; replicated coarse
        # math feeds only the local CE terms) — summing over the graph axis
        # reassembles the full gradient, as in make_graph_parallel_gcn_step
        grads = jax.tree.map(lambda g: jax.lax.psum(g, graph_axis), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (loss,) + aux

    shard_spec = P(graph_axis, None)
    edge_spec = P(graph_axis)
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), shard_spec, edge_spec, edge_spec, edge_spec,
                  P(graph_axis), P(graph_axis), P(graph_axis)),
        out_specs=(P(), P(), (P(), P(), P(), P())),
    )
    return jax.jit(step), optimizer


def make_graph_parallel_gat_step(mesh: Mesh, halo_spec, num_heads: int = 8,
                                 units: int = 8, num_classes: int = 7,
                                 graph_axis: str = "graph",
                                 learning_rate: float = 5e-3,
                                 query_activation=jax.nn.relu,
                                 key_activation=jax.nn.relu):
    """Edge-partitioned multi-head GAT training step (SDDMM path, sharded).

    Scales BASELINE workload config 2 (multi-head GAT) across the ``graph``
    mesh axis with the same halo plan as the GCN step. The destination
    softmax needs no collective: edges are owned by their destination row,
    so per-row max / sum / normalize are device-local segment ops — only the
    source-side K and V rows cross devices, in the one all_to_all per layer
    (K‖V concatenated so a single exchange carries both). Reference
    semantics: nn/conv/gat.py:49-89 — Q = query_activation(xW_q + b_q),
    K = key_activation(xW_k + b_k) (relu defaults as in layers/conv/gat.py),
    score = <Q_row, K_col>/√d, destination softmax, weighted aggregation,
    concat heads; self-loops are expected to be pre-added to the edge list
    before partitioning (the reference adds them at :43). Plan arrays are
    shard_map arguments (each device holds its shard only); the step is
    ``step(params, opt_state, x_shard, y_shard, mask_shard)``.

    ``params = ((wq, bq, wk, bk, wv, bias), (w_out, b_out))`` — one GAT
    layer (heads concatenated, ELU) + a linear classifier, mirroring the
    reference GAT demo's single-attention-layer shape (demo/demo_gat.py).
    """
    import optax

    optimizer = optax.adam(learning_rate)
    H, d = num_heads, units
    npp = halo_spec.nodes_per_part
    inv_scale = 1.0 / (d ** 0.5)

    def _blocksum(prod):  # [M, H·d] → [M, H] per-head reduction in f32
        return prod.astype(jnp.float32).reshape(prod.shape[0], H, d).sum(-1)

    def _expand(a, like):  # [M, H] → [M, H·d]
        return jnp.repeat(a, d, axis=-1).astype(like.dtype)

    def gat_layer(x_local, wq, bq, wk, bk, wv, bias, plan, send_idx_local):
        from .halo import halo_exchange
        (loc_row, loc_col, loc_val, rem_row, rem_addr, rem_val) = plan
        Q = x_local @ wq + bq
        if query_activation is not None:
            Q = query_activation(Q)
        K = x_local @ wk + bk
        if key_activation is not None:
            K = key_activation(K)
        V = x_local @ wv
        # one exchange carries K‖V (halves the collective launches)
        recv = halo_exchange(jnp.concatenate([K, V], axis=-1),
                             send_idx_local, graph_axis)
        recv_flat = recv.reshape(-1, 2 * H * d)
        kv_loc = jnp.take(jnp.concatenate([K, V], axis=-1),
                          jnp.clip(loc_col, 0, npp - 1), axis=0)
        kv_rem = jnp.take(recv_flat, jnp.clip(rem_addr, 0,
                                              recv_flat.shape[0] - 1), axis=0)
        q_loc = jnp.take(Q, jnp.clip(loc_row, 0, npp - 1), axis=0)
        q_rem = jnp.take(Q, jnp.clip(rem_row, 0, npp - 1), axis=0)
        s_loc = _blocksum(q_loc * kv_loc[:, :H * d]) * inv_scale   # [EL, H]
        s_rem = _blocksum(q_rem * kv_rem[:, :H * d]) * inv_scale   # [ER, H]
        neg = jnp.float32(-1e30)
        s_loc = jnp.where((loc_row < npp)[:, None], s_loc, neg)
        s_rem = jnp.where((rem_row < npp)[:, None], s_rem, neg)
        # destination softmax: per-row max over both edge lists (local ops)
        m = jnp.maximum(
            jax.ops.segment_max(s_loc, loc_row, num_segments=npp + 1),
            jax.ops.segment_max(s_rem, rem_row, num_segments=npp + 1))[:npp]
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        safe_lr = jnp.clip(loc_row, 0, npp - 1)
        safe_rr = jnp.clip(rem_row, 0, npp - 1)
        p_loc = jnp.exp(s_loc - jnp.take(m, safe_lr, axis=0))
        p_rem = jnp.exp(s_rem - jnp.take(m, safe_rr, axis=0))
        p_loc = jnp.where((loc_row < npp)[:, None], p_loc, 0.0) \
            * loc_val[:, None]
        p_rem = jnp.where((rem_row < npp)[:, None], p_rem, 0.0) \
            * rem_val[:, None]
        denom = (jax.ops.segment_sum(p_loc, loc_row, num_segments=npp + 1)
                 + jax.ops.segment_sum(p_rem, rem_row,
                                       num_segments=npp + 1))[:npp] + 1e-16
        a_loc = p_loc / jnp.take(denom, safe_lr, axis=0)
        a_rem = p_rem / jnp.take(denom, safe_rr, axis=0)
        out = (jax.ops.segment_sum(
                   kv_loc[:, H * d:] * _expand(a_loc, V), loc_row,
                   num_segments=npp + 1)
               + jax.ops.segment_sum(
                   kv_rem[:, H * d:] * _expand(a_rem, V), rem_row,
                   num_segments=npp + 1))[:npp]
        return out + bias

    def local_step(params, opt_state, x_local, y_local, mask_local, *plan):
        send_idx_local = plan[0][0]
        edge_plan = _squeeze_plan(plan[1:])

        def loss_fn(p):
            (wq, bq, wk, bk, wv, bias), (w_out, b_out) = p
            h = gat_layer(x_local, wq, bq, wk, bk, wv, bias, edge_plan,
                          send_idx_local)
            h = jax.nn.elu(h)
            logits = h @ w_out + b_out
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(y_local, 0, None))
            total = jax.lax.psum(jnp.sum(ce * mask_local), graph_axis)
            count = jax.lax.psum(jnp.sum(mask_local), graph_axis)
            return total / jnp.maximum(count, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, graph_axis), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    shard_spec = P(graph_axis, None)
    inner = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), shard_spec, P(graph_axis), P(graph_axis))
        + _plan_specs(graph_axis),
        out_specs=(P(), P(), P()),
    )
    jitted = jax.jit(inner)
    # a plain tuple/list means the caller already distributed the plan
    # (multi-host per-process shard loading — same contract as the GCN step)
    plan_args = (_plan_arrays(halo_spec) if hasattr(halo_spec, "send_idx")
                 else tuple(halo_spec))

    def step(params, opt_state, x, y, mask):
        return jitted(params, opt_state, x, y, mask, *plan_args)

    return step, optimizer


def make_graph_parallel_gat_fused_step(mesh: Mesh, gat_spec,
                                       layer_dims=((8, 8),),
                                       num_classes: int = 7,
                                       graph_axis: str = "graph",
                                       learning_rate: float = 5e-3,
                                       edge_drop_rate: float = 0.0,
                                       feat_drop_rate: float = 0.0,
                                       query_activation=jax.nn.relu,
                                       key_activation=jax.nn.relu):
    """Edge-partitioned multi-head GAT training step on the PRODUCTION fused
    attention kernel (ops/ell_attention.py) — the packed counterpart of
    :func:`make_graph_parallel_gat_step`.

    Each device's local + halo edges are one rectangular ELL layout over the
    concatenated source space ``[local rows ‖ recv slots]``
    (halo.build_gat_halo_spec), so SDDMM scores, the destination softmax,
    attention dropout and the weighted aggregation all run scatter-free —
    the same kernel ``bench.py`` measures single-chip. One all_to_all per
    layer carries K‖V; the destination softmax stays device-local because
    edges are owned by their destination row.

    ``layer_dims``: a tuple of (num_heads, units_per_head) per GAT layer
    (heads concatenated, ELU between layers — the reference two-layer stack
    is ``((8, 8), (1, num_classes))``-shaped via a trailing linear head
    here; reference nn/conv/gat.py:73-89, demo/demo_gat.py:14-23).
    ``edge_drop_rate`` is the reference's attention dropout; per-device
    dropout keys are derived by folding the mesh position into the step key.

    ``params = ([(wq, bq, wk, bk, wv, bias) per layer], (w_out, b_out))``;
    the step is ``step(params, opt_state, key, x_shard, y_shard,
    mask_shard)``.
    """
    import optax

    from .halo import gat_plan_arrays, gat_plan_specs, halo_exchange, \
        halo_gat_attention

    optimizer = optax.adam(learning_rate)
    E_cap = gat_spec.num_edges
    heads = [h for h, _ in layer_dims]

    def local_step(params, opt_state, key, x_local, y_local, mask_local,
                   *plan):
        send_idx_local = plan[0][0]
        layout_arrays = _squeeze_plan(plan[1:])
        dev_key = jax.random.fold_in(key, jax.lax.axis_index(graph_axis))

        def loss_fn(p):
            gat_layers, (w_out, b_out) = p
            h = x_local
            k = dev_key
            for li, (wq, bq, wk, bk, wv, bias) in enumerate(gat_layers):
                k, k_feat, k_att = jax.random.split(k, 3)
                if feat_drop_rate > 0.0:
                    keep = jax.random.bernoulli(k_feat, 1.0 - feat_drop_rate,
                                                h.shape)
                    h = jnp.where(keep, h / (1.0 - feat_drop_rate), 0.0)
                Q = h @ wq + bq
                if query_activation is not None:
                    Q = query_activation(Q)
                K = h @ wk + bk
                if key_activation is not None:
                    K = key_activation(K)
                V = h @ wv
                HD = V.shape[1]
                recv = halo_exchange(jnp.concatenate([K, V], axis=-1),
                                     send_idx_local, graph_axis)
                recv_flat = recv.reshape(-1, 2 * HD)
                K_src = jnp.concatenate([K, recv_flat[:, :HD]], axis=0)
                V_src = jnp.concatenate([V, recv_flat[:, HD:]], axis=0)
                h = halo_gat_attention(
                    Q, K_src, V_src, layout_arrays, E_cap, heads[li],
                    edge_drop_rate=edge_drop_rate,
                    training=edge_drop_rate > 0.0,
                    dropout_key=k_att) + bias
                h = jax.nn.elu(h)
            logits = h @ w_out + b_out
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(y_local, 0, None))
            total = jax.lax.psum(jnp.sum(ce * mask_local), graph_axis)
            count = jax.lax.psum(jnp.sum(mask_local), graph_axis)
            return total / jnp.maximum(count, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, graph_axis), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    shard_spec = P(graph_axis, None)
    plan_args = gat_plan_arrays(gat_spec)
    inner = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), shard_spec, P(graph_axis), P(graph_axis))
        + gat_plan_specs(gat_spec, graph_axis),
        out_specs=(P(), P(), P()),
    )
    jitted = jax.jit(inner)

    def step(params, opt_state, key, x, y, mask):
        return jitted(params, opt_state, key, x, y, mask, *plan_args)

    return step, optimizer


def make_batch_2d_step(mesh: Mesh, data_axis: str = "data",
                       graph_axis: str = "graph", hidden: int = 16,
                       num_classes: int = 7, graphs_per_data_shard: int = 8,
                       learning_rate: float = 1e-2):
    """TRUE 2-D parallel batched graph classification: the ``data`` axis
    splits the batch of graphs (each data shard owns a disjoint sub-batch,
    reference demo/demo_distributed_mean_pool.py:90-112), while the
    ``graph`` axis edge-partitions each sub-batch's disjoint union. Both
    axes carry real parallelism; the loss/grad reductions psum over BOTH.

    Global array layout (D = data size, P = graph size, npp nodes per cell):

    * ``x``   [D·P·npp, F]  sharded ``P((data, graph), None)`` — data-major
      node blocks, each split into P row blocks;
    * ``rows/cols/vals`` [D·P·Es] sharded ``P((data, graph))`` — the edge
      shard of cell (d, p); ``rows`` local to the cell's row block
      (sentinel ≥ npp for padding), ``cols`` local to the data shard's node
      space [0, P·npp);
    * ``ngi`` [D·P·npp] like ``x`` — graph ids LOCAL to the data shard
      (sentinel ≥ graphs_per_data_shard for padding);
    * ``y``/``gmask`` [D·graphs_per_data_shard] sharded ``P(data)``.

    Forward per cell: one mean-aggregation GCN layer (all_gather of the
    projected features over ``graph`` only — batch shards never talk), a
    per-graph mean readout whose segment-sums psum over ``graph`` (a
    graph's nodes span row blocks), and a dense head on the data shard's
    own graphs.
    """
    import optax

    optimizer = optax.adam(learning_rate)
    G = graphs_per_data_shard

    def local_step(params, opt_state, x_local, rows, cols, vals, ngi_local,
                   y_local, gmask_local):
        npp = x_local.shape[0]

        def loss_fn(p):
            w0, b0, wd, bd = p
            hw = x_local @ w0
            h_shard = jax.lax.all_gather(hw, graph_axis, tiled=True)
            deg = jax.ops.segment_sum(vals, rows, num_segments=npp) + 1e-6
            agg = sharded_spmm_local(h_shard, rows, cols, vals, npp)
            h = jax.nn.relu(agg / deg[:, None] + b0)
            # readout: this cell's node rows contribute partial per-graph
            # sums; complete them over the graph axis (nodes of one graph
            # live in several row blocks)
            safe_ngi = jnp.clip(ngi_local, 0, G)
            ones = jnp.where(ngi_local < G, 1.0, 0.0)
            cnt = jax.lax.psum(
                jax.ops.segment_sum(ones, safe_ngi, num_segments=G + 1)[:G],
                graph_axis)
            pooled = jax.lax.psum(
                jax.ops.segment_sum(h * ones[:, None], safe_ngi,
                                    num_segments=G + 1)[:G], graph_axis)
            pooled = pooled / jnp.maximum(cnt, 1.0)[:, None]
            logits = pooled @ wd + bd
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(y_local, 0, None))
            total = jax.lax.psum(jax.lax.psum(jnp.sum(ce * gmask_local),
                                              data_axis), graph_axis)
            count = jax.lax.psum(jax.lax.psum(jnp.sum(gmask_local),
                                              data_axis), graph_axis)
            # the graph-axis psum double-counts nothing: ce/gmask are
            # graph-axis-invariant (pooled was completed by psum), and the
            # normalization divides it back out
            return total / jnp.maximum(count, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(jax.lax.psum(g, graph_axis), data_axis),
            grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    both = (data_axis, graph_axis)
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(both, None), P(both), P(both), P(both),
                  P(both), P(data_axis), P(data_axis)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(step), optimizer


def pack_batch_2d(graphs, num_data_shards: int, num_graph_parts: int,
                  graphs_per_data_shard: int, nodes_per_cell: int,
                  edges_per_cell: int):
    """Host-side packing for :func:`make_batch_2d_step`.

    ``graphs``: list of (x [n,F], edge_index [2,e], y int) numpy triples.
    Graph g goes to data shard g // graphs_per_data_shard; within a data
    shard, nodes are laid out consecutively and split into
    ``num_graph_parts`` row blocks of ``nodes_per_cell`` rows; each edge is
    owned by its destination's row block. Returns the global arrays in the
    P((data, graph), ...) layouts the step expects.
    """
    import numpy as np

    D, Pg, G = num_data_shards, num_graph_parts, graphs_per_data_shard
    F = graphs[0][0].shape[1]
    shard_nodes = Pg * nodes_per_cell
    x = np.zeros((D * shard_nodes, F), np.float32)
    ngi = np.full(D * shard_nodes, G, np.int32)
    rows = np.full((D, Pg, edges_per_cell), nodes_per_cell, np.int32)
    cols = np.zeros((D, Pg, edges_per_cell), np.int32)
    vals = np.zeros((D, Pg, edges_per_cell), np.float32)
    y = np.zeros(D * G, np.int32)
    gmask = np.zeros(D * G, np.float32)

    fill = np.zeros(D, np.int64)              # next free node row per shard
    edge_fill = np.zeros((D, Pg), np.int64)   # next free edge slot per cell
    for g, (xg, eig, yg) in enumerate(graphs):
        d = g // G
        if d >= D:
            raise ValueError("more graphs than D*G slots")
        base = fill[d]
        n = xg.shape[0]
        if base + n > shard_nodes:
            raise ValueError("nodes_per_cell too small for this batch")
        x[d * shard_nodes + base: d * shard_nodes + base + n] = xg
        ngi[d * shard_nodes + base: d * shard_nodes + base + n] = g - d * G
        y[d * G + (g - d * G)] = yg
        gmask[d * G + (g - d * G)] = 1.0
        er = np.asarray(eig[0]) + base        # shard-local ids
        ec = np.asarray(eig[1]) + base
        owner = er // nodes_per_cell
        for p in range(Pg):
            sel = owner == p
            k = int(sel.sum())
            if k == 0:
                continue
            s = edge_fill[d, p]
            if s + k > edges_per_cell:
                raise ValueError("edges_per_cell too small")
            rows[d, p, s:s + k] = er[sel] - p * nodes_per_cell
            cols[d, p, s:s + k] = ec[sel]
            vals[d, p, s:s + k] = 1.0
            edge_fill[d, p] += k
        fill[d] += n
    return (x, rows.reshape(-1), cols.reshape(-1), vals.reshape(-1), ngi, y,
            gmask)
