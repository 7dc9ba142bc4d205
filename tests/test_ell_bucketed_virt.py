"""Row-splitting (virtual rows) for hub rows beyond the widest slot cap."""
import numpy as np
import jax
import jax.numpy as jnp

from tf_geometric_tpu.ops.ell_bucketed import BucketedEllAdj, bucketed_spmm


def _hub_graph(rng, n=60, hub_deg=700):
    """One destination with degree >> caps[-1]=256 → must row-split."""
    rows = np.concatenate([np.full(hub_deg, 3, np.int64),
                           rng.integers(0, n, 2 * n)])
    cols = rng.integers(0, n, rows.shape[0])
    ei = np.stack([rows, cols]).astype(np.int32)
    ew = rng.normal(size=ei.shape[1]).astype(np.float32)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (ei[0], ei[1]), ew)
    x = rng.normal(size=(n, 5)).astype(np.float32)
    return n, ei, ew, dense, x


def test_hub_rows_split_into_virtual_rows(rng):
    n, ei, ew, dense, x = _hub_graph(rng)
    adj = BucketedEllAdj.from_coo(ei, ew, (n, n), layout="bucketed")
    assert adj.fwd.virt is not None          # the hub forced a split
    assert adj.fwd.tail_row.shape[0] == 0    # and no sorted-COO tail remains
    out = bucketed_spmm(adj, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), dense @ x, rtol=2e-3, atol=2e-3)
    # gradient runs the transpose side (hub becomes a source there)
    ct = np.asarray(rng.normal(size=out.shape), np.float32)
    g = jax.grad(lambda h: jnp.sum(bucketed_spmm(adj, h) * jnp.asarray(ct)))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), dense.T @ ct, rtol=2e-3, atol=2e-3)


def test_virtual_rows_reskin_with_edge_values(rng):
    n, ei, ew, dense, x = _hub_graph(rng, hub_deg=400)
    adj = BucketedEllAdj.from_coo(ei, ew, (n, n), layout="bucketed")
    assert adj.fwd.virt is not None
    new_vals = rng.normal(size=ei.shape[1]).astype(np.float32)
    dense2 = np.zeros((n, n), np.float32)
    np.add.at(dense2, (ei[0], ei[1]), new_vals)
    out = bucketed_spmm(adj.with_edge_values(jnp.asarray(new_vals)),
                        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), dense2 @ x, rtol=2e-3, atol=2e-3)


def test_exact_cap_multiple_degree(rng):
    """deg == k·caps[-1] exactly: row lives ONLY in virtual rows (its
    remainder bucket is empty) and must still be correct."""
    n = 20
    hub_deg = 512                             # 2 × cap_max, remainder 0
    rows = np.concatenate([np.full(hub_deg, 0, np.int64),
                           rng.integers(1, n, 30)])
    cols = rng.integers(0, n, rows.shape[0])
    ei = np.stack([rows, cols]).astype(np.int32)
    ew = np.ones(ei.shape[1], np.float32)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (ei[0], ei[1]), ew)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    adj = BucketedEllAdj.from_coo(ei, ew, (n, n), layout="bucketed")
    out = bucketed_spmm(adj, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), dense @ x, rtol=2e-3, atol=2e-3)
