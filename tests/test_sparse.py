"""SparseMatrix vs dense oracles: SpMM, SDDMM, structural ops, custom VJP."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_geometric_tpu.sparse import SparseMatrix, concat, diags, eye
from tf_geometric_tpu.ops.spmm import sddmm, spmm
from tests.conftest import dense_adj, random_graph


@pytest.fixture
def sp_and_dense(rng):
    _, edge_index, edge_weight = random_graph(rng, 18, 50, 1)
    sp = SparseMatrix(edge_index, edge_weight, (18, 18))
    return sp, dense_adj(edge_index, edge_weight, 18)


def test_spmm_matches_dense(rng, sp_and_dense):
    sp, dense = sp_and_dense
    h = rng.normal(size=(18, 7)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(sp @ jnp.asarray(h)), dense @ h,
                               rtol=1e-4, atol=1e-4)


def test_spmm_feature_splits(rng, sp_and_dense):
    sp, dense = sp_and_dense
    h = rng.normal(size=(18, 10)).astype(np.float32)
    out = sp.matmul(jnp.asarray(h), num_or_size_splits=3)
    np.testing.assert_allclose(np.asarray(out), dense @ h, rtol=1e-4, atol=1e-4)
    out2 = sp.matmul(jnp.asarray(h), num_or_size_splits=[4, 4, 2])
    np.testing.assert_allclose(np.asarray(out2), dense @ h, rtol=1e-4, atol=1e-4)


def test_sddmm_matches_dense(rng):
    _, edge_index, _ = random_graph(rng, 14, 40, 1)
    a = rng.normal(size=(14, 6)).astype(np.float32)
    b = rng.normal(size=(14, 6)).astype(np.float32)
    out = np.asarray(sddmm(jnp.asarray(edge_index), jnp.asarray(a), jnp.asarray(b)))
    expected = np.sum(a[edge_index[0]] * b[edge_index[1]], axis=-1)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_transpose_add_diag_to_dense(sp_and_dense):
    sp, dense = sp_and_dense
    np.testing.assert_allclose(np.asarray(sp.T.to_dense()), dense.T, rtol=1e-5, atol=1e-5)
    with_diag = sp.add_diag(2.5)
    np.testing.assert_allclose(np.asarray(with_diag.to_dense()),
                               dense + 2.5 * np.eye(18), rtol=1e-5, atol=1e-5)


def test_segment_reductions(sp_and_dense):
    sp, dense = sp_and_dense
    np.testing.assert_allclose(np.asarray(sp.segment_sum(axis=-1)), dense.sum(axis=1),
                               rtol=1e-4, atol=1e-4)
    # axis=0 sums per column — oracle on raw COO (duplicates sum before max,
    # so compare only the column-sum here)
    np.testing.assert_allclose(np.asarray(sp.segment_sum(axis=0)), dense.sum(axis=0),
                               rtol=1e-4, atol=1e-4)


def test_segment_softmax_rows(rng):
    _, edge_index, edge_weight = random_graph(rng, 10, 30, 1)
    sp = SparseMatrix(edge_index, edge_weight, (10, 10)).segment_softmax(axis=-1)
    sums = np.zeros(10, np.float32)
    np.add.at(sums, edge_index[0], np.asarray(sp.value))
    for r in np.unique(edge_index[0]):
        np.testing.assert_allclose(sums[r], 1.0, atol=1e-4)


def test_diags_eye_concat():
    d = diags(jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(d.to_dense()), np.diag([1, 2, 3.0]))
    np.testing.assert_allclose(np.asarray(eye(4).to_dense()), np.eye(4))
    a = eye(2)
    b = diags(jnp.array([5.0, 6.0]))
    stacked = concat([a, b], axis=0)
    assert stacked.shape == (4, 2)
    expected = np.concatenate([np.eye(2), np.diag([5, 6.0])], axis=0)
    np.testing.assert_allclose(np.asarray(stacked.to_dense()), expected)


def test_dropout_zero_rate_and_scaling(rng, sp_and_dense):
    sp, _ = sp_and_dense
    assert sp.dropout(0.0, key=jax.random.PRNGKey(0)) is sp
    assert sp.dropout(0.5, key=None, training=False) is sp
    dropped = sp.dropout(0.5, key=jax.random.PRNGKey(0), training=True)
    v = np.asarray(dropped.value)
    orig = np.asarray(sp.value)
    nonzero = v != 0
    np.testing.assert_allclose(v[nonzero], orig[nonzero] * 2.0, rtol=1e-5)


def test_pytree_roundtrip_through_jit(sp_and_dense):
    sp, dense = sp_and_dense

    @jax.jit
    def f(mat: SparseMatrix, h):
        return mat.matmul(h)

    h = jnp.ones((18, 4))
    np.testing.assert_allclose(np.asarray(f(sp, h)), dense @ np.ones((18, 4)),
                               rtol=1e-4, atol=1e-4)


def test_spmm_grad_matches_dense_grad(rng):
    _, edge_index, edge_weight = random_graph(rng, 12, 35, 1)
    h = rng.normal(size=(12, 5)).astype(np.float32)
    dense = dense_adj(edge_index, edge_weight, 12)

    def sparse_loss(v, hh):
        return jnp.sum(spmm(jnp.asarray(edge_index), v, hh, 12) ** 2)

    gv, gh = jax.grad(sparse_loss, argnums=(0, 1))(jnp.asarray(edge_weight), jnp.asarray(h))

    def dense_loss(a, hh):
        return jnp.sum((a @ hh) ** 2)

    ga, gh_dense = jax.grad(dense_loss, argnums=(0, 1))(jnp.asarray(dense), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_dense), rtol=1e-3, atol=1e-3)
    # per-edge value grads sum duplicate coordinates of the dense grad
    ga = np.asarray(ga)
    np.testing.assert_allclose(np.asarray(gv), ga[edge_index[0], edge_index[1]],
                               rtol=1e-3, atol=1e-3)


def test_concat_keeps_padded_entries_out_of_range():
    """Padded (out-of-range) entries must not shift into the next block's
    valid rows, and a narrow part's other-axis sentinels must stay invalid."""
    from tf_geometric_tpu.sparse import SparseMatrix, concat
    # A: 3x3 with one real entry and one padded entry at row==3 (value 5 to
    # make any leak visible), B: 3x3 real
    A = SparseMatrix(np.array([[0, 3], [1, 0]], np.int32),
                     np.array([1.0, 5.0], np.float32), (3, 3))
    B = SparseMatrix(np.array([[0], [2]], np.int32),
                     np.array([2.0], np.float32), (3, 3))
    C = concat([A, B], axis=0)
    assert C.shape == (6, 3)
    dense = np.asarray(C.to_dense())
    expected = np.zeros((6, 3), np.float32)
    expected[0, 1] = 1.0
    expected[3, 2] = 2.0
    np.testing.assert_allclose(dense, expected)  # no phantom 5.0 at row 3
    # segment ops must not count the phantom entry either: row 3's mean is
    # its single real entry, not diluted by a phantom zero
    means = np.asarray(C.segment_mean(axis=-1))
    np.testing.assert_allclose(means[3], 2.0, rtol=1e-6)


def test_sparse_matrix_validates_inputs():
    from tf_geometric_tpu.sparse import SparseMatrix
    with pytest.raises(ValueError, match=r"\[2, nnz\]"):
        SparseMatrix(np.zeros((3, 4), np.int32), None, (4, 4))
    with pytest.raises(ValueError, match="does not match nnz"):
        SparseMatrix(np.zeros((2, 4), np.int32), np.ones(3, np.float32), (4, 4))


def test_dropout_requires_key_when_training():
    from tf_geometric_tpu.sparse import SparseMatrix
    m = SparseMatrix(np.array([[0], [1]], np.int32), None, (2, 2))
    with pytest.raises(ValueError, match="PRNG key"):
        m.dropout(0.5, training=True)
    assert m.dropout(0.5, training=False) is m
