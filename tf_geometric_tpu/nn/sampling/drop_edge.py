"""DropEdge: random edge dropout at train time (reference: nn/sampling/drop_edge.py).

TPU-native twist: instead of boolean-mask filtering (dynamic output size,
drop_edge.py:32-41), dropped edges are *masked* — their indices are moved out
of range (→ dropped by every segment op) and their attrs zeroed — so shapes
stay static under jit. ``force_undirected`` drops/keeps both directions of an
undirected pair by keying the mask on the canonical (min, max) pair.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["drop_edge"]


def drop_edge(inputs, rate: float = 0.5, force_undirected: bool = False,
              training=None, key=None, num_nodes=None):
    """Returns ``[edge_index, *edge_attrs]`` with ~``rate`` edges masked out.

    ``num_nodes``: the out-of-range sentinel for masked edges; defaults to
    ``max(edge_index)+1`` computed eagerly (pass explicitly under jit).
    """
    if rate < 0.0 or rate > 1.0:
        raise ValueError(f"Dropout probability has to be between 0 and 1, got {rate}")
    if not training or rate == 0.0:
        return inputs
    if key is None:
        raise ValueError(
            "drop_edge requires a PRNG key when training with rate > 0 "
            "(a silent no-op would train without edge dropout)")

    edge_index, *edge_attrs = inputs
    edge_index = jnp.asarray(edge_index)
    if num_nodes is None:
        num_nodes = int(jax.device_get(jnp.max(edge_index))) + 1

    row, col = edge_index[0], edge_index[1]
    if force_undirected:
        # one coin per canonical pair: hash (min, max) and derive the keep
        # decision from a random permutation-invariant draw
        lo = jnp.minimum(row, col)
        hi = jnp.maximum(row, col)
        pair_hash = lo.astype(jnp.uint32) * jnp.uint32(2654435761) + hi.astype(jnp.uint32)
        base = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
        mixed = pair_hash ^ base
        mixed = (mixed ^ (mixed >> 16)) * jnp.uint32(0x45d9f3b)
        mixed = (mixed ^ (mixed >> 16)) * jnp.uint32(0x45d9f3b)
        mixed = mixed ^ (mixed >> 16)
        keep = (mixed.astype(jnp.float32) / jnp.float32(2 ** 32)) >= rate
    else:
        keep = jax.random.bernoulli(key, 1.0 - rate, row.shape)

    masked_index = jnp.where(keep[None, :], edge_index, num_nodes)
    out_attrs = []
    for attr in edge_attrs:
        attr = jnp.asarray(attr)
        mask = keep.reshape(keep.shape + (1,) * (attr.ndim - 1))
        out_attrs.append(jnp.where(mask, attr, 0))
    return [masked_index] + out_attrs
