"""Unit tests: segment kernels vs dense numpy oracles (SURVEY §4 test pyramid)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_geometric_tpu.nn.kernel import (
    aggregate_neighbors, gcn_mapper, identity_mapper, max_reducer, mean_reducer,
    min_reducer, segment_count, segment_max, segment_mean, segment_min,
    segment_softmax, segment_sum, sum_reducer, sum_updater,
)


def make_segments(rng, n=50, num_segments=12, f=4):
    data = rng.normal(size=(n, f)).astype(np.float32)
    ids = rng.integers(0, num_segments, size=n).astype(np.int32)
    return data, ids


def test_segment_sum_matches_oracle(rng):
    data, ids = make_segments(rng)
    out = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), 12))
    expected = np.zeros((12, 4), np.float32)
    np.add.at(expected, ids, data)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_segment_mean_empty_segments_zero(rng):
    data, ids = make_segments(rng, num_segments=5)
    out = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), 8))
    for s in range(8):
        mask = ids == s
        if mask.any():
            np.testing.assert_allclose(out[s], data[mask].mean(axis=0), rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_array_equal(out[s], 0.0)


@pytest.mark.parametrize("op,npop", [(segment_max, np.max), (segment_min, np.min)])
def test_segment_minmax(rng, op, npop):
    data, ids = make_segments(rng, num_segments=6)
    out = np.asarray(op(jnp.asarray(data), jnp.asarray(ids), 9))
    for s in range(9):
        mask = ids == s
        expected = npop(data[mask], axis=0) if mask.any() else 0.0
        np.testing.assert_allclose(out[s], expected, rtol=1e-5, atol=1e-5)


def test_segment_softmax_sums_to_one(rng):
    data = rng.normal(size=40).astype(np.float32) * 10
    ids = rng.integers(0, 7, size=40).astype(np.int32)
    out = np.asarray(segment_softmax(jnp.asarray(data), jnp.asarray(ids), 7))
    assert np.isfinite(out).all()
    for s in np.unique(ids):
        np.testing.assert_allclose(out[ids == s].sum(), 1.0, atol=1e-5)
        # matches a numpy softmax oracle
        seg = data[ids == s]
        expected = np.exp(seg - seg.max())
        expected = expected / (expected.sum() + 1e-8)
        np.testing.assert_allclose(out[ids == s], expected, rtol=1e-4, atol=1e-5)


def test_segment_count(rng):
    ids = rng.integers(0, 5, size=33).astype(np.int32)
    out = np.asarray(segment_count(jnp.asarray(ids), 5))
    np.testing.assert_array_equal(out, np.bincount(ids, minlength=5).astype(np.float32))


def test_out_of_range_ids_dropped(rng):
    data = np.ones((10, 3), np.float32)
    ids = np.array([0, 1, 2, 3, 4, 5, 5, 6, 6, 6], np.int32)
    padded_ids = ids.copy()
    padded_ids[7:] = 7  # pretend last 3 are padding with id == num_segments
    out = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(padded_ids), 7))
    expected = np.zeros((7, 3), np.float32)
    np.add.at(expected, padded_ids[:7], data[:7])
    np.testing.assert_array_equal(out, expected)


def test_aggregate_neighbors_sum_oracle(rng):
    from tests.conftest import dense_adj, random_graph
    x, edge_index, edge_weight = random_graph(rng, 15, 45, 6)
    out = np.asarray(aggregate_neighbors(
        jnp.asarray(x), jnp.asarray(edge_index), jnp.asarray(edge_weight),
        mapper=gcn_mapper, reducer=sum_reducer))
    adj = dense_adj(edge_index, edge_weight, 15)
    np.testing.assert_allclose(out, adj @ x, rtol=1e-4, atol=1e-4)


def test_aggregate_neighbors_mean_and_update(rng):
    from tests.conftest import random_graph
    x, edge_index, _ = random_graph(rng, 12, 30, 4)
    out = np.asarray(aggregate_neighbors(
        jnp.asarray(x), jnp.asarray(edge_index), None,
        mapper=identity_mapper, reducer=mean_reducer, updater=sum_updater))
    expected = x.copy()
    for n in range(12):
        mask = edge_index[0] == n
        if mask.any():
            expected[n] += x[edge_index[1][mask]].mean(axis=0)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_aggregate_jit_and_grad(rng):
    from tests.conftest import random_graph
    x, edge_index, edge_weight = random_graph(rng, 10, 25, 3)

    @jax.jit
    def loss(xx):
        return jnp.sum(aggregate_neighbors(
            xx, jnp.asarray(edge_index), jnp.asarray(edge_weight),
            mapper=gcn_mapper, reducer=sum_reducer) ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_segment_op_with_pad_zero_fills(rng):
    from tf_geometric_tpu.nn.kernel.segment import segment_op_with_pad
    data, ids = make_segments(rng, n=30, num_segments=10)
    ids[ids == 7] = 3  # make segment 7 empty
    out = segment_op_with_pad(jax.ops.segment_max, jnp.asarray(data),
                              jnp.asarray(ids), num_segments=10)
    expected = np.zeros((10, data.shape[1]), np.float32)
    for s in range(10):
        if (ids == s).any():
            expected[s] = data[ids == s].max(axis=0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
