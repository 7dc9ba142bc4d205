"""Sparse-feature slicing helpers (reference: utils/tf_sparse_utils.py:8-90).

``sparse_gather_sub`` selects and relabels rows of a SparseMatrix (sampling
sparse node features); ``compute_num_or_size_splits`` builds the feature-dim
split plan for chunked SpMM (the reference's large-graph lever,
nn/conv/gcn.py:274-280).
"""
from __future__ import annotations

import numpy as np

from ..sparse.matrix import SparseMatrix
from .union_utils import convert_union_to_numpy

__all__ = ["sparse_gather_sub", "sparse_tensor_gather_sub",
           "compute_num_or_size_splits"]


def sparse_gather_sub(x: SparseMatrix, sub_index, axis: int = 0) -> SparseMatrix:
    """Row-subset (axis=0) or column-subset (axis=1) + reindex. Host-side
    (dynamic output nnz)."""
    index = convert_union_to_numpy(x.index, np.int64)
    value = convert_union_to_numpy(x.value)
    sub_index = convert_union_to_numpy(sub_index, np.int64)
    gather_axis = 0 if axis in (0, -2) else 1
    other_axis = 1 - gather_axis

    size = x.shape[gather_axis]
    mask = np.zeros(size, bool)
    mask[sub_index] = True
    keep = mask[index[gather_axis]]

    reverse = np.full(size, -1, np.int64)
    reverse[sub_index] = np.arange(len(sub_index))

    new_index = np.empty((2, int(keep.sum())), np.int64)
    new_index[gather_axis] = reverse[index[gather_axis][keep]]
    new_index[other_axis] = index[other_axis][keep]
    new_shape = [0, 0]
    new_shape[gather_axis] = len(sub_index)
    new_shape[other_axis] = x.shape[other_axis]
    return SparseMatrix(new_index.astype(np.int32), value[keep], tuple(new_shape))


def sparse_tensor_gather_sub(x: SparseMatrix, sub_index, axis: int = 0) -> SparseMatrix:
    """Reference's tf.sparse.SparseTensor variant (utils/tf_sparse_utils.py:8-53).
    There is no separate SparseTensor type here — SparseMatrix is the one
    sparse container — so this is the same row/column-subset + reindex."""
    return sparse_gather_sub(x, sub_index, axis=axis)


def compute_num_or_size_splits(num_h_features: int, num_splits):
    """Split plan over the feature dim (tf_sparse_utils.py:71-90)."""
    if num_splits is None or num_splits == 1:
        return None
    if num_h_features % num_splits == 0:
        return num_splits
    split_size = int(np.ceil(num_h_features / num_splits))
    num_pre = num_h_features // split_size
    last = num_h_features % split_size
    plan = [split_size] * num_pre + ([last] if last > 0 else [])
    if len(plan) != num_splits:
        raise ValueError(
            f"cannot split H of shape [None, {num_h_features}] into "
            f"{num_splits} matrices, please provide a valid num_splits")
    return plan
