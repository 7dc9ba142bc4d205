"""COO sparse-matrix container — the TPU-native replacement for ``tf_sparse``.

The reference delegates all sparse linear algebra to the external ``tf_sparse``
package (required API reconstructed in SURVEY.md §2.9 from call sites such as
``nn/conv/gcn.py:128,280``, ``nn/conv/gat.py:83-84``, ``nn/pool/cluster_pool.py:32-36``).
This module provides that surface natively on JAX:

* ``SparseMatrix`` is a **registered pytree**: ``index [2, nnz]`` (int32) and
  ``value [nnz]`` (float) are leaves; ``shape`` is static aux data. It passes
  transparently through ``jit`` / ``grad`` / ``vmap`` / ``shard_map``.
* nnz is static. Padded entries use out-of-range row ids (``row == shape[0]``)
  with zero values; every segment/scatter op drops them for free.
* SpMM / SDDMM bottom out in gather + segment ops, which XLA fuses well on
  TPU; ``tf_geometric_tpu.ops`` provides Pallas kernels behind the same
  signatures for the hot paths.

Row convention matches the reference: ``index[0] = row`` is the aggregation
destination, ``index[1] = col`` the source.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import _segment_core as _seg

__all__ = ["SparseMatrix", "diags", "eye", "concat", "sparse_shape",
           "chunked_feature_matmul"]


def chunked_feature_matmul(spmm_fn, h, num_or_size_splits):
    """Feature-dim chunked SpMM (the reference's large-graph lever,
    nn/conv/gcn.py:274-280): split ``h``'s last dim, run ``spmm_fn`` per
    chunk sequentially to bound peak memory, and concatenate. Shared by
    SparseMatrix.matmul and EllAdj.matmul."""
    if num_or_size_splits is None:
        return spmm_fn(h)
    if isinstance(num_or_size_splits, int):
        chunks = jnp.array_split(h, num_or_size_splits, axis=-1)
    else:
        sections = np.cumsum(num_or_size_splits)[:-1]
        chunks = jnp.split(h, sections, axis=-1)
    return jnp.concatenate([spmm_fn(c) for c in chunks], axis=-1)


@jax.tree_util.register_pytree_node_class
class SparseMatrix:
    """Immutable COO matrix with static shape and static nnz.

    Mirrors ``tf_sparse.SparseMatrix(index, value, shape)`` (SURVEY §2.9).
    """

    __slots__ = ("index", "value", "_shape")

    def __init__(self, index, value=None, shape=None, *, _validate: bool = True):
        index = jnp.asarray(index)
        if index.dtype not in (jnp.int32, jnp.int64):
            index = index.astype(jnp.int32)
        if _validate and (index.ndim != 2 or index.shape[0] != 2):
            raise ValueError(f"index must be [2, nnz], got shape {index.shape}")
        if value is None:
            value = jnp.ones((index.shape[-1],), dtype=jnp.float32)
        else:
            value = jnp.asarray(value)
            if value.dtype in (jnp.float64,):
                value = value.astype(jnp.float32)
            if _validate and value.shape[:1] != index.shape[-1:]:
                raise ValueError(
                    f"value length {value.shape} does not match nnz "
                    f"{index.shape[-1]}")
        if shape is None:
            # Host-side fallback only; inside jit, shape must be provided.
            n = int(np.asarray(jax.device_get(jnp.max(index))) + 1) if index.size else 0
            shape = (n, n)
        self.index = index
        self.value = value
        self._shape = (int(shape[0]), int(shape[1]))

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.index, self.value), self._shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.index = children[0]
        obj.value = children[1]
        obj._shape = aux
        return obj

    # -- basic accessors ----------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        return self._shape

    @property
    def row(self):
        return self.index[0]

    @property
    def col(self):
        return self.index[1]

    @property
    def nnz(self) -> int:
        return int(self.index.shape[-1])

    def with_value(self, new_value) -> "SparseMatrix":
        return SparseMatrix(self.index, new_value, self._shape)

    def __repr__(self):
        return (f"SparseMatrix(shape={self._shape}, nnz={self.nnz}, "
                f"dtype={self.value.dtype})")

    # -- construction helpers ----------------------------------------------
    @classmethod
    def from_dense(cls, dense) -> "SparseMatrix":
        dense = np.asarray(jax.device_get(dense))
        row, col = np.nonzero(dense)
        index = np.stack([row, col], axis=0).astype(np.int32)
        return cls(index, dense[row, col].astype(np.float32), dense.shape)

    def to_scipy(self):
        """scipy.sparse.coo_matrix view (host-side interop)."""
        import scipy.sparse as sp
        import jax as _jax
        index = np.asarray(_jax.device_get(self.index))
        value = np.asarray(_jax.device_get(self.value))
        ok = ((index[0] >= 0) & (index[0] < self._shape[0])
              & (index[1] >= 0) & (index[1] < self._shape[1]))
        return sp.coo_matrix((value[ok], (index[0][ok], index[1][ok])),
                             shape=self._shape)

    @classmethod
    def from_scipy(cls, mat) -> "SparseMatrix":
        coo = mat.tocoo()
        index = np.stack([coo.row, coo.col], axis=0).astype(np.int32)
        return cls(index, coo.data.astype(np.float32), coo.shape)

    # -- linear algebra ------------------------------------------------------
    def matmul(self, h, num_or_size_splits=None):
        """SpMM: ``self @ h`` for dense ``h`` of shape [shape[1], F].

        ``num_or_size_splits`` mirrors the reference's feature-chunked SpMM
        (``nn/conv/gcn.py:274-280``): split the feature dim and process
        sequentially to bound peak memory on very wide features.
        """
        if isinstance(h, SparseMatrix):
            return self._matmul_sparse(h)
        return chunked_feature_matmul(self._spmm, h, num_or_size_splits)

    def _spmm(self, h):
        from ..ops import spmm as _spmm_op
        return _spmm_op.spmm(self.index, self.value, h, self._shape[0])

    def _matmul_sparse(self, other: "SparseMatrix") -> "SparseMatrix":
        """Sparse @ sparse, used by cluster coarsening (Sᵀ A S).

        The reference densifies A for this chain (cluster_pool.py:31-38); nnz
        of a product is data-dependent, so under static shapes we likewise go
        through a dense intermediate and re-sparsify host-side only when
        shapes are concrete. Inside jit, prefer the dense pooling path in
        ``nn/pool`` (batched einsum on the MXU).
        """
        dense = self.to_dense() @ other.to_dense()
        return SparseMatrix.from_dense(dense)

    def __matmul__(self, h):
        return self.matmul(h)

    def rmatmul_dense(self, h):
        """``h @ self`` for dense h: (selfᵀ @ hᵀ)ᵀ."""
        return self.transpose()._spmm(h.T).T

    # -- segment reductions --------------------------------------------------
    def _axis_ids(self, axis: int):
        if axis in (-1, 1):
            return self.row, self._shape[0]
        if axis in (0, -2):
            return self.col, self._shape[1]
        raise ValueError(f"invalid axis {axis}")

    def segment_sum(self, axis: int = -1):
        """Reduce values along ``axis``; axis=-1 sums each row (gcn.py:80,88)."""
        ids, n = self._axis_ids(axis)
        return _seg.segment_sum(self.value, ids, n)

    def segment_max(self, axis: int = -1):
        ids, n = self._axis_ids(axis)
        return _seg.segment_max(self.value, ids, n)

    def segment_mean(self, axis: int = -1):
        ids, n = self._axis_ids(axis)
        return _seg.segment_mean(self.value, ids, n)

    def segment_softmax(self, axis: int = -1) -> "SparseMatrix":
        """Softmax over each row's entries (the GAT path, gat.py:83-84)."""
        ids, n = self._axis_ids(axis)
        return self.with_value(_seg.segment_softmax(self.value, ids, n))

    # -- structural ops ------------------------------------------------------
    def add_diag(self, diag_value: Union[float, jnp.ndarray] = 1.0) -> "SparseMatrix":
        """Append diagonal entries (self-loops); nnz grows by min(shape).

        Duplicate coordinates are fine: COO semantics sum them in every
        downstream segment op, matching sparse-add behavior.
        """
        n = min(self._shape)
        diag_idx = jnp.tile(jnp.arange(n, dtype=self.index.dtype)[None, :], (2, 1))
        if isinstance(diag_value, (int, float)):
            diag_val = jnp.full((n,), float(diag_value), dtype=self.value.dtype)
        else:
            diag_val = jnp.broadcast_to(jnp.asarray(diag_value, self.value.dtype), (n,))
        index = jnp.concatenate([self.index, diag_idx], axis=1)
        value = jnp.concatenate([self.value, diag_val], axis=0)
        return SparseMatrix(index, value, self._shape)

    def add_self_loop(self, fill_weight: float = 1.0) -> "SparseMatrix":
        return self.add_diag(fill_weight)

    def transpose(self) -> "SparseMatrix":
        return SparseMatrix(
            jnp.stack([self.index[1], self.index[0]], axis=0),
            self.value,
            (self._shape[1], self._shape[0]),
        )

    @property
    def T(self) -> "SparseMatrix":
        return self.transpose()

    def dropout(self, rate: float, key=None, training: bool = True) -> "SparseMatrix":
        """Randomly zero entries with prob ``rate``, scaling survivors by 1/(1-rate).

        Mirrors ``SparseMatrix.dropout`` used for edge dropout (gcn.py:262).
        Functional: requires an explicit PRNG ``key`` when training.
        """
        if not training or rate <= 0.0:
            return self
        if key is None:
            raise ValueError(
                "SparseMatrix.dropout requires a PRNG key when training with "
                "rate > 0 (a silent no-op would train unregularized)")
        keep = jax.random.bernoulli(key, 1.0 - rate, self.value.shape)
        return self.with_value(jnp.where(keep, self.value / (1.0 - rate), 0.0))

    def to_dense(self):
        """Densify; duplicate coordinates sum (COO semantics)."""
        n_rows, n_cols = self._shape
        flat = jnp.where(
            (self.row >= 0) & (self.row < n_rows) & (self.col >= 0) & (self.col < n_cols),
            self.row * n_cols + self.col,
            n_rows * n_cols,  # out of range → dropped by scatter
        )
        dense = jax.ops.segment_sum(self.value, flat, num_segments=n_rows * n_cols)
        return dense.reshape(n_rows, n_cols)

    # -- scalar arithmetic on values ----------------------------------------
    def __mul__(self, scalar):
        return self.with_value(self.value * scalar)

    __rmul__ = __mul__

    def __truediv__(self, scalar):
        return self.with_value(self.value / scalar)

    def __neg__(self):
        return self.with_value(-self.value)


# ---------------------------------------------------------------------------
# Module-level constructors (tfs.diags / tfs.eye / tfs.concat / tfs.shape)
# ---------------------------------------------------------------------------

def diags(diagonal) -> SparseMatrix:
    """Diagonal SparseMatrix from a vector (tfs.diags, gcn.py:83)."""
    diagonal = jnp.asarray(diagonal)
    n = diagonal.shape[0]
    idx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None, :], (2, 1))
    return SparseMatrix(idx, diagonal, (n, n))


def eye(n: int, dtype=jnp.float32) -> SparseMatrix:
    """Identity SparseMatrix (tfs.eye, demo_sparse_node_features.py:22)."""
    return diags(jnp.ones((n,), dtype=dtype))


def concat(matrices: Sequence[SparseMatrix], axis: int = 0) -> SparseMatrix:
    """Block-concatenate sparse matrices along rows (axis=0) or cols (axis=1).

    Used by BatchGraph sparse-feature stacking (reference data/graph.py:515).
    """
    if axis not in (0, 1):
        raise ValueError("concat supports axis 0 or 1")
    total = sum(m.shape[axis] for m in matrices)
    other_size = max((m.shape[1 - axis] for m in matrices), default=0)
    parts_idx, parts_val = [], []
    offset = 0
    for m in matrices:
        ax_ids = m.index[axis]
        ot_ids = m.index[1 - axis]
        # padded (out-of-range) entries must stay out of range in the RESULT
        # — a plain shift would move them into the next block's valid rows
        # (and a part narrower than the result would validate its other-axis
        # sentinels), breaking the module's padding invariant
        valid = ((ax_ids >= 0) & (ax_ids < m.shape[axis])
                 & (ot_ids >= 0) & (ot_ids < m.shape[1 - axis]))
        new_ax = jnp.where(valid, ax_ids + offset, total)
        new_ot = jnp.where(valid, ot_ids, other_size)
        idx = (jnp.stack([new_ax, new_ot]) if axis == 0
               else jnp.stack([new_ot, new_ax]))
        parts_idx.append(idx.astype(m.index.dtype))
        parts_val.append(m.value)
        offset += m.shape[axis]
    shape = (total, other_size) if axis == 0 else (other_size, total)
    return SparseMatrix(jnp.concatenate(parts_idx, axis=1),
                        jnp.concatenate(parts_val, axis=0), shape)


def sparse_shape(x):
    """Shape of dense array or SparseMatrix (tfs.shape, gat.py:40)."""
    if isinstance(x, SparseMatrix):
        return x.shape
    return tuple(x.shape)
