"""Tiled one-hot MXU SpMM (ops/tiled_spmm.py) vs dense oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from tf_geometric_tpu.ops.tiled_spmm import build_tiled_spmm, tiled_spmm


@pytest.mark.parametrize("shape,tile", [((300, 260), 64), ((130, 130), 128),
                                        ((64, 64), 64)])
def test_tiled_spmm_matches_dense(shape, tile):
    rng = np.random.default_rng(0)
    N, M = shape
    E, F = 6 * N, 24
    rows = rng.integers(0, N, size=E)
    cols = rng.integers(0, M, size=E)
    vals = rng.normal(size=E).astype(np.float32)
    h = rng.normal(size=(M, F)).astype(np.float32)
    dense = sp.csr_matrix((vals, (rows, cols)), shape=(N, M)).toarray()

    ts = build_tiled_spmm(np.stack([rows, cols]), vals, (N, M), tile=tile)
    assert 0 < ts.occupancy <= 1.0
    out = tiled_spmm(ts, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), dense @ h,
                               rtol=1e-4, atol=1e-4)

    cot = dense @ h

    def f(hh):
        return (tiled_spmm(ts, hh) * jnp.asarray(cot)).sum()

    g = jax.grad(f)(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(g), dense.T @ cot,
                               rtol=1e-3, atol=1e-3)


def test_tiled_spmm_drops_padded_edges():
    """Out-of-range (padding-convention) edges must vanish."""
    rng = np.random.default_rng(1)
    N, F = 96, 8
    rows = np.array([0, 5, N, 7], np.int64)   # third edge is padding
    cols = np.array([1, 2, 0, N], np.int64)   # fourth edge is padding
    vals = np.ones(4, np.float32)
    h = rng.normal(size=(N, F)).astype(np.float32)
    ts = build_tiled_spmm(np.stack([rows, cols]), vals, (N, N), tile=32)
    assert ts.num_edges == 2
    out = np.asarray(tiled_spmm(ts, jnp.asarray(h)))
    expect = np.zeros((N, F), np.float32)
    expect[0] = h[1]
    expect[5] = h[2]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_tiled_spmm_bf16_tiles():
    rng = np.random.default_rng(2)
    N, E, F = 200, 900, 16
    rows = rng.integers(0, N, size=E)
    cols = rng.integers(0, N, size=E)
    vals = rng.normal(size=E).astype(np.float32)
    h = rng.normal(size=(N, F)).astype(np.float32)
    dense = sp.csr_matrix((vals, (rows, cols)), shape=(N, N)).toarray()
    ts = build_tiled_spmm(np.stack([rows, cols]), vals, (N, N), tile=64,
                          dtype=jnp.bfloat16)
    out = np.asarray(tiled_spmm(ts, jnp.asarray(h)))
    # bf16 tiles: ~2-3 significant digits
    np.testing.assert_allclose(out, dense @ h, rtol=0.05, atol=0.05)
