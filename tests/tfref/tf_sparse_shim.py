"""Pure-TF shim for the external ``tf_sparse`` package the reference depends on.

The reference library (``/root/reference``, CrawlScript/tf_geometric) declares
``tf_sparse`` as a pip dependency (reference ``setup.py:27``) which is not
vendored and not installed here.  This module re-implements the API surface the
reference actually calls — enumerated in SURVEY.md §2.9 from every call site
(e.g. reference ``nn/conv/gcn.py:72-128``, ``nn/conv/gat.py:83-89``,
``nn/pool/cluster_pool.py:32-42``, ``utils/tf_sparse_utils.py:56-66``,
``data/graph.py:210,515``) — so the on-disk reference can be imported and
EXECUTED under TF for true (non-circular) parity testing against the TPU
re-implementation.

Only behaviour observable through those call sites is implemented.  Everything
runs on plain TF ops (gather / unsorted_segment_*) so it works eagerly and
inside tf.function.
"""
import tensorflow as tf

_EPS = 1e-8


def _as_shape_tensor(shape):
    if shape is None:
        return None
    if tf.is_tensor(shape):
        return tf.cast(shape, tf.int32)
    return tf.stack([tf.cast(s, tf.int32) for s in shape])


class SparseMatrix(object):
    """COO sparse matrix: ``index`` [2, nnz] int32, ``value`` [nnz] float32.

    Duplicate coordinates are allowed and behave additively (degree sums,
    SpMM, to_dense all accumulate), matching how the reference uses
    ``add_diag`` on adjacencies that may already contain self-loops.
    """

    def __init__(self, index, value=None, shape=None, merge=False, is_diag=False):
        index = tf.convert_to_tensor(index)
        if index.dtype not in (tf.int32, tf.int64):
            index = tf.cast(index, tf.int32)
        self.index = index
        num_entries = tf.shape(index)[1]
        if value is None:
            value = tf.ones([num_entries], dtype=tf.float32)
        else:
            value = tf.convert_to_tensor(value)
            if value.dtype != tf.float32:
                value = tf.cast(value, tf.float32)
        self.value = value
        if shape is None:
            max_id = tf.reduce_max(index, axis=1) + 1
            self._shape = tf.cast(max_id, tf.int32)
        else:
            self._shape = _as_shape_tensor(shape)
        self.is_diag = is_diag
        if merge:
            merged = self.merge_duplicated_index()
            self.index, self.value = merged.index, merged.value

    # -- basic info ----------------------------------------------------------
    @property
    def shape(self):
        """Static Python shape when available (so ``shape[0] != shape[1]``
        works as a plain bool eagerly), else the dynamic tensor."""
        try:
            return [int(v) for v in self._shape.numpy()]
        except Exception:
            return self._shape

    @property
    def row(self):
        return self.index[0]

    @property
    def col(self):
        return self.index[1]

    def merge_duplicated_index(self):
        linear = tf.cast(self.row, tf.int64) * tf.cast(self._shape[1], tf.int64) \
            + tf.cast(self.col, tf.int64)
        uniq, idx = tf.unique(linear)
        value = tf.math.unsorted_segment_sum(self.value, idx, tf.shape(uniq)[0])
        new_row = tf.cast(uniq // tf.cast(self._shape[1], tf.int64), self.index.dtype)
        new_col = tf.cast(uniq % tf.cast(self._shape[1], tf.int64), self.index.dtype)
        return SparseMatrix(tf.stack([new_row, new_col], axis=0), value, self._shape)

    # -- reductions ----------------------------------------------------------
    def segment_sum(self, axis=-1):
        if axis in (-1, 1):
            return tf.math.unsorted_segment_sum(self.value, self.row, self._shape[0])
        elif axis == 0:
            return tf.math.unsorted_segment_sum(self.value, self.col, self._shape[1])
        raise ValueError("segment_sum axis must be 0 or -1")

    def segment_softmax(self, axis=-1):
        if axis not in (-1, 1):
            raise ValueError("segment_softmax only supports the row axis")
        seg = self.row
        num_seg = self._shape[0]
        seg_max = tf.math.unsorted_segment_max(self.value, seg, num_seg)
        shifted = self.value - tf.gather(seg_max, seg)
        exp = tf.exp(shifted)
        denom = tf.math.unsorted_segment_sum(exp, seg, num_seg) + _EPS
        return SparseMatrix(self.index, exp / tf.gather(denom, seg), self._shape)

    # -- structural ops ------------------------------------------------------
    def add_diag(self, diag_value):
        n = self._shape[0]
        diag_idx = tf.range(n, dtype=self.index.dtype)
        diag_value = tf.convert_to_tensor(diag_value, dtype=tf.float32)
        if diag_value.shape.ndims == 0:
            diag_value = tf.fill([n], diag_value)
        index = tf.concat([self.index, tf.stack([diag_idx, diag_idx], axis=0)], axis=1)
        value = tf.concat([self.value, diag_value], axis=0)
        return SparseMatrix(index, value, self._shape)

    def transpose(self):
        return SparseMatrix(tf.stack([self.col, self.row], axis=0), self.value,
                            tf.stack([self._shape[1], self._shape[0]]),
                            is_diag=self.is_diag)

    def dropout(self, drop_rate, training=False):
        if not training or drop_rate is None:
            return self
        if isinstance(drop_rate, float) and drop_rate <= 0.0:
            return self
        return SparseMatrix(self.index, tf.nn.dropout(self.value, drop_rate),
                            self._shape)

    # -- products ------------------------------------------------------------
    def matmul(self, h, num_or_size_splits=None):
        """Sparse @ dense via gather + unsorted_segment_sum (duplicate-safe)."""
        h = tf.convert_to_tensor(h) if not tf.is_tensor(h) else h
        if num_or_size_splits is None:
            return self._spmm(h)
        parts = tf.split(h, num_or_size_splits, axis=-1)
        return tf.concat([self._spmm(p) for p in parts], axis=-1)

    def _spmm(self, h):
        msgs = tf.gather(h, self.col) * tf.expand_dims(self.value, -1)
        return tf.math.unsorted_segment_sum(msgs, self.row, self._shape[0])

    def __matmul__(self, other):
        if isinstance(other, SparseMatrix):
            if self.is_diag:
                # diag @ sparse: scale rows of `other` by diag entries
                scale = tf.gather(self._diag_vector(), other.row)
                return SparseMatrix(other.index, other.value * scale, other._shape)
            if other.is_diag:
                # sparse @ diag: scale columns
                scale = tf.gather(other._diag_vector(), self.col)
                return SparseMatrix(self.index, self.value * scale, self._shape)
            return self._sparse_sparse_matmul(other)
        return self.matmul(other)

    def __rmatmul__(self, dense):
        # dense @ sparse  ==  (sparseᵀ @ denseᵀ)ᵀ
        return tf.transpose(self.transpose().matmul(tf.transpose(dense)))

    def _diag_vector(self):
        """Dense [n] diagonal for a matrix built by diags()/eye()."""
        return tf.math.unsorted_segment_sum(self.value, self.row, self._shape[0])

    def _sparse_sparse_matmul(self, other):
        a = tf.sparse.reorder(self.to_sparse_tensor())
        b = tf.sparse.reorder(other.to_sparse_tensor())
        dense = tf.sparse.sparse_dense_matmul(a, tf.sparse.to_dense(b))
        idx = tf.where(tf.not_equal(dense, 0.0))
        return SparseMatrix(tf.transpose(tf.cast(idx, tf.int32)),
                            tf.gather_nd(dense, idx),
                            tf.stack([self._shape[0], other._shape[1]]))

    # -- conversions ---------------------------------------------------------
    def to_dense(self):
        return tf.scatter_nd(tf.transpose(tf.cast(self.index, tf.int64)),
                             self.value, tf.cast(self._shape, tf.int64))

    def to_sparse_tensor(self):
        st = tf.SparseTensor(indices=tf.transpose(tf.cast(self.index, tf.int64)),
                             values=self.value,
                             dense_shape=tf.cast(self._shape, tf.int64))
        return tf.sparse.reorder(st)

    @classmethod
    def from_sparse_tensor(cls, sparse_tensor):
        return cls(tf.cast(tf.transpose(sparse_tensor.indices), tf.int32),
                   sparse_tensor.values,
                   tf.cast(sparse_tensor.dense_shape, tf.int32))

    def __repr__(self):
        return "SparseMatrix(shape={}, nnz={})".format(
            self.shape, int(tf.shape(self.value)[0]))


# -- module-level helpers (tfs.*) -------------------------------------------

def diags(diagonal):
    diagonal = tf.convert_to_tensor(diagonal, dtype=tf.float32)
    n = tf.shape(diagonal)[0]
    idx = tf.range(n, dtype=tf.int32)
    return SparseMatrix(tf.stack([idx, idx], axis=0), diagonal,
                        tf.stack([n, n]), is_diag=True)


def eye(num_rows):
    return diags(tf.ones([num_rows], dtype=tf.float32))


def concat(sparse_matrices, axis=0):
    """Vertical (axis=0) concat of SparseMatrix blocks — reference call site
    data/graph.py:515 (BatchGraph.from_graphs with SparseMatrix features)."""
    if axis != 0:
        raise NotImplementedError("tf_sparse shim: concat only supports axis=0")
    index_parts, value_parts = [], []
    row_offset = tf.constant(0, tf.int32)
    num_cols = sparse_matrices[0]._shape[1]
    for sm in sparse_matrices:
        idx = tf.cast(sm.index, tf.int32)
        index_parts.append(tf.stack([idx[0] + row_offset, idx[1]], axis=0))
        value_parts.append(sm.value)
        row_offset = row_offset + sm._shape[0]
    return SparseMatrix(tf.concat(index_parts, axis=1),
                        tf.concat(value_parts, axis=0),
                        tf.stack([row_offset, num_cols]))


def shape(data):
    """Shape helper working on dense tensors, tf.SparseTensor and SparseMatrix
    (reference calls ``tfs.shape(x)[0]`` for num_nodes, e.g. nn/conv/gat.py:40)."""
    if isinstance(data, SparseMatrix):
        return data._shape
    if isinstance(data, tf.SparseTensor):
        return tf.cast(data.dense_shape, tf.int32)
    return tf.shape(data)
