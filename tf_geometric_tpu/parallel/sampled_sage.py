"""Multi-chip neighbor-sampled GraphSAGE (BASELINE config 3 at pod scale).

The reference's sampled training is single-device with host sampling
(reference demo/demo_graph_sage.py + utils/graph_utils.py:630-802). The
TPU-native scale-out: partition NODES into contiguous blocks, one per device;
each device holds the CSR rows of its block (``build_csr_shards``) and draws
its own fixed-k neighbors ON DEVICE inside the shard_map'd training step
(per-device PRNG stream via ``axis_index`` fold). Neighbor features resolve
against an all-gathered PROJECTED feature table — the mean aggregator is
linear, so the neighbor kernel applies before the collective and the
all_gather moves F_out-wide rows instead of F_in-wide ones (matmul-first:
the same reorder that cuts single-chip gather traffic ~4.7× at Reddit scale
also cuts ICI volume). Gradients psum over the graph axis; a data axis
composes the same way as the GCN step (parallel/sharded.py).

Random halo note: sampled neighbors are uniform over the whole graph, so a
precomputed boundary plan (parallel/halo.py) cannot help — all_gather of the
projected table IS the minimal exchange.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["build_csr_shards", "make_sampled_sage_step",
           "set_exchange_dtype"]

# dtype the projected feature table crosses the all_gather in (None = keep
# f32). bf16 halves the step's two per-device-constant costs — collective
# bytes and the backward full-table-gradient scatter — measured on the
# virtual mesh in benchmarks/sage_scaling_decompose.py.
exchange_dtype = None


def set_exchange_dtype(dtype) -> None:
    global exchange_dtype
    exchange_dtype = dtype


def build_csr_shards(edge_index, num_nodes: int, num_parts: int,
                     edge_weight=None):
    """Partition the CSR adjacency into ``num_parts`` contiguous node blocks.

    Returns a dict of stacked per-device arrays (leading dim = device) for
    shard_map: ``row_start [P, n_local]`` (offsets into the LOCAL column
    shard), ``degree [P, n_local]``, ``sorted_col [P, e_max]`` (GLOBAL
    column ids, zero-padded — pad slots are unreachable because draws stay
    below ``degree``), optional ``sorted_weight``. ``num_nodes`` must divide
    evenly into blocks; pad the graph first (data/padding.py) if not.
    """
    if num_nodes % num_parts:
        raise ValueError(f"num_nodes={num_nodes} not divisible by "
                         f"num_parts={num_parts}; pad the graph first")
    n_local = num_nodes // num_parts
    edge_index = np.asarray(edge_index, np.int64)
    weight = None if edge_weight is None else np.asarray(edge_weight, np.float32)
    # native wrappers fall back to safe clamped numpy internally (strays
    # sort past row_ptr[num_nodes], unreachable by any draw)
    from .. import native
    order = native.sort_by_row(edge_index[0], num_nodes)
    row_ptr = native.build_row_ptr(edge_index[0], num_nodes)
    col_sorted = edge_index[1][order].astype(np.int32)
    w_sorted = None if weight is None else weight[order]

    block_edges = [row_ptr[(p + 1) * n_local] - row_ptr[p * n_local]
                   for p in range(num_parts)]
    e_max = max(1, int(-(-max(block_edges) // 128) * 128))
    row_start = np.zeros((num_parts, n_local), np.int32)
    degree = np.zeros((num_parts, n_local), np.int32)
    sorted_col = np.zeros((num_parts, e_max), np.int32)
    sorted_weight = (None if w_sorted is None
                     else np.zeros((num_parts, e_max), np.float32))
    for p in range(num_parts):
        lo, hi = row_ptr[p * n_local], row_ptr[(p + 1) * n_local]
        rp = row_ptr[p * n_local:(p + 1) * n_local + 1] - lo
        row_start[p] = rp[:-1]
        degree[p] = rp[1:] - rp[:-1]
        sorted_col[p, :hi - lo] = col_sorted[lo:hi]
        if sorted_weight is not None:
            sorted_weight[p, :hi - lo] = w_sorted[lo:hi]
    shards = {"row_start": jnp.asarray(row_start),
              "degree": jnp.asarray(degree),
              "sorted_col": jnp.asarray(sorted_col)}
    if sorted_weight is not None:
        shards["sorted_weight"] = jnp.asarray(sorted_weight)
    return shards


def _sampled_mean_layer(x_local, key, csr, k, self_kernel, neighbor_kernel,
                        bias, graph_axis, activation):
    """One mean-SAGE layer under shard_map: project locally, all_gather the
    PROJECTED table, draw + gather k slot lanes against global ids.

    The table crosses the collective (and its AD-transpose materializes a
    full-table gradient per device) in ``exchange_dtype`` — bf16 halves the
    two dominant per-device-constant costs of this step (ICI bytes and the
    backward d-table scatter; see benchmarks/sage_scaling_decompose.py and
    SCALING.md). Accumulation stays f32.
    """
    from ..nn.sampling.device_sampler import draw_fixed_k
    from . import sampled_sage as _self
    hw_local = x_local @ neighbor_kernel                      # matmul-first
    ex_dtype = _self.exchange_dtype
    if ex_dtype is not None:
        hw_local = hw_local.astype(ex_dtype)
    hw_global = jax.lax.all_gather(hw_local, graph_axis, tiled=True)
    n_local = x_local.shape[0]
    # zero-degree rows self-point at their GLOBAL id (weight 0 kills them)
    block0 = jax.lax.axis_index(graph_axis).astype(jnp.int32) * n_local
    self_ids = block0 + jnp.arange(n_local, dtype=jnp.int32)
    idx, weight = draw_fixed_k(key, csr, k, self_ids=self_ids)
    acc = jnp.zeros((n_local, hw_global.shape[1]), jnp.float32)
    for j in range(k):                                        # unrolled lanes
        col_j = jnp.clip(idx[j], 0, hw_global.shape[0] - 1)
        acc = acc + (jnp.take(hw_global, col_j, axis=0).astype(jnp.float32)
                     * weight[j][:, None])
    h = jnp.concatenate([x_local @ self_kernel, acc / k], axis=1) + bias
    return activation(h) if activation is not None else h


def make_sampled_sage_step(mesh: Mesh, csr_shards, num_features: int,
                           num_classes: int, graph_axis: str = "graph",
                           k: Sequence[int] = (25, 10), hidden: int = 256,
                           learning_rate: float = 1e-2):
    """Build ``(step, init_params, optimizer)`` for node-partitioned sampled
    mean-SAGE. ``step(params, opt_state, key, x, y, mask)`` jits over the
    mesh: x/y/mask shard along ``graph_axis`` rows, params/opt_state
    replicated, CSR shards threaded as per-device arguments (never
    constants — a constant would replicate every shard onto every device,
    parallel/sharded.py).
    """
    import optax

    optimizer = optax.adam(learning_rate)
    num_layers = len(k)

    def init_params(rng: np.random.Generator):
        params = []
        f_in = num_features
        for _ in range(num_layers):
            params.append({
                "self": jnp.asarray(rng.normal(scale=0.05, size=(f_in, hidden // 2)), jnp.float32),
                "nb": jnp.asarray(rng.normal(scale=0.05, size=(f_in, hidden // 2)), jnp.float32),
                "bias": jnp.zeros(hidden, jnp.float32),
            })
            f_in = hidden
        params.append({"w": jnp.asarray(
            rng.normal(scale=0.05, size=(f_in, num_classes)), jnp.float32),
            "b": jnp.zeros(num_classes, jnp.float32)})
        return params

    def local_step(params, opt_state, key, x_local, y_local, mask_local,
                   *csr_flat):
        names = sorted(csr_shards.keys())
        csr = {n: a[0] for n, a in zip(names, csr_flat)}
        dev = jax.lax.axis_index(graph_axis)
        key = jax.random.fold_in(key, dev)

        def loss_fn(p):
            h = x_local
            for li in range(num_layers):
                h = _sampled_mean_layer(
                    h, jax.random.fold_in(key, li), csr, int(k[li]),
                    p[li]["self"], p[li]["nb"], p[li]["bias"],
                    graph_axis, jax.nn.relu)
            logits = h @ p[-1]["w"] + p[-1]["b"]
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

    names = sorted(csr_shards.keys())
    csr_args = tuple(csr_shards[n] for n in names)
    inner = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(graph_axis, None), P(graph_axis),
                  P(graph_axis)) + (P(graph_axis, None),) * len(names),
        out_specs=(P(), P(), P()),
    )
    jitted = jax.jit(inner)

    def step(params, opt_state, key, x, y, mask):
        return jitted(params, opt_state, key, x, y, mask, *csr_args)

    return step, init_params, optimizer
