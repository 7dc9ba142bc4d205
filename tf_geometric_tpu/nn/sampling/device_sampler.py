"""Device-resident fixed-k neighbor sampling — the TPU-native counterpart of
the reference's host-side ``RandomNeighborSampler`` (reference
utils/graph_utils.py:630-802).

The reference samples on the host in numpy and re-enters the device every
layer (SURVEY §3.3: "control crosses host↔device every layer call"). Here the
CSR adjacency (row_ptr, sorted_col, sorted_weight) is uploaded ONCE and the
draw itself is jnp — it jits INTO the training step, so a sampled-minibatch
epoch has zero per-step host work and zero host↔device transfer. At Reddit
scale the host path spends ~575 ms/step sampling + tunneling ~65 MB of draws;
the device draw is ~k gather lanes over the int32 column table.

Semantics match ``RandomNeighborSampler.sample(k, padding=True)`` /
``sample_dense(k)``: exactly k neighbors WITH replacement per node, uniform
over that node's edge multiset (an edge's weight rides along, it does not
bias the draw); zero-degree nodes self-point with weight 0. Output is
slot-major [k, S] (see docs/performance.md) ready for
``mean_graph_sage_fixed_k`` / ``sum_graph_sage_fixed_k``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...utils.union_utils import convert_union_to_numpy

__all__ = ["DeviceNeighborSampler", "draw_fixed_k"]


def draw_fixed_k(key, csr, k: int, self_ids=None):
    """The shared device-side fixed-k with-replacement draw (pure jnp).

    ``csr`` is a dict with ``row_start [S]``, ``degree [S]``, ``sorted_col``
    (column ids in whatever space the caller gathers from) and optionally
    ``sorted_weight``. Returns ``(idx [k, S], weight [k, S])``; zero-degree
    rows emit ``self_ids`` (default ``arange(S)`` — pass the global ids of
    the local rows under shard_map) with weight 0. Used by both
    ``DeviceNeighborSampler.sample`` and the sharded sampled-SAGE step
    (parallel/sampled_sage.py) so the two never drift.
    """
    deg = csr["degree"]
    n = deg.shape[0]
    degc = jnp.maximum(deg, 1)
    # uniform in [0, deg): modulo bias is < deg / 2^31, negligible
    r = jax.random.randint(key, (k, n), 0, jnp.iinfo(jnp.int32).max,
                           dtype=jnp.int32)
    pick = csr["row_start"][None, :] + r % degc[None, :]
    pick = jnp.clip(pick, 0, max(csr["sorted_col"].shape[0] - 1, 0))
    isolated = deg == 0
    if self_ids is None:
        self_ids = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.where(isolated[None, :], self_ids[None, :],
                    jnp.take(csr["sorted_col"], pick.reshape(-1),
                             axis=0).reshape(k, n))
    alive = jnp.where(isolated, 0.0, 1.0).astype(jnp.float32)
    if csr.get("sorted_weight") is None:
        weight = jnp.broadcast_to(alive[None, :], (k, n))
    else:
        weight = jnp.take(csr["sorted_weight"], pick.reshape(-1),
                          axis=0).reshape(k, n) * alive[None, :]
    return idx, weight


class DeviceNeighborSampler:
    """CSR adjacency on device; ``sample`` is pure jnp (jit/vmap-safe).

    ``sample`` is meant to be called INSIDE your jitted train step with a
    per-step PRNG key. The CSR arrays are device arrays — close over them
    (constants mode, small graphs) or thread them as arguments via
    ``csr_pytree()`` past the compile-payload limit (docs/performance.md).
    """

    def __init__(self, edge_index, edge_weight=None, num_nodes: Optional[int] = None):
        edge_index = convert_union_to_numpy(edge_index, np.int64)
        if num_nodes is None:
            num_nodes = int(edge_index.max()) + 1 if edge_index.size else 0
        self.num_nodes = num_nodes
        weight_np = (None if edge_weight is None
                     else convert_union_to_numpy(edge_weight, np.float32))
        # native wrappers fall back to safe clamped numpy internally: strays
        # (padded rows == num_nodes, negatives) sort to a trailing sentinel
        # bucket past row_ptr[num_nodes] that no draw can reach
        from ... import native
        order = native.sort_by_row(edge_index[0], num_nodes)
        row_ptr = native.build_row_ptr(edge_index[0], num_nodes)
        self.row_start = jnp.asarray(row_ptr[:-1].astype(np.int32))
        self.degree = jnp.asarray(
            (row_ptr[1:] - row_ptr[:-1]).astype(np.int32))
        self.sorted_col = jnp.asarray(edge_index[1][order].astype(np.int32))
        # all-ones weights are common (unweighted graphs): skip the table
        # and the per-slot weight gather entirely
        if weight_np is None or np.all(weight_np == 1.0):
            self.sorted_weight = None
        else:
            self.sorted_weight = jnp.asarray(weight_np[order])

    def csr_pytree(self):
        """The device arrays as a dict pytree — thread this through jit as an
        argument when the graph is too large for constants mode."""
        return {"row_start": self.row_start, "degree": self.degree,
                "sorted_col": self.sorted_col,
                "sorted_weight": self.sorted_weight}

    def sample(self, key, k: int, csr=None):
        """Draw k neighbors per node → ``(neighbor_idx [k, N], weight [k, N])``.

        Pure jnp — call inside jit with a fresh key per step. ``csr``
        overrides the closed-over arrays with a ``csr_pytree()`` passed as a
        jit argument. Weight is 1.0 (or the edge's weight) on real draws and
        0.0 on zero-degree self-slots, broadcast lazily when uniform.
        """
        c = csr if csr is not None else self.csr_pytree()
        return draw_fixed_k(key, c, k)
