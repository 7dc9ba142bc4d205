"""Native C++ host ops (tf_geometric_tpu/native) vs their numpy fallbacks."""
import numpy as np
import pytest

from tf_geometric_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built (no g++?)")


def test_sort_by_row_matches_stable_argsort(rng):
    rows = rng.integers(0, 50, 400).astype(np.int32)
    order = native.sort_by_row(rows, 50)
    expected = np.argsort(rows, kind="stable")
    np.testing.assert_array_equal(order, expected)


def test_build_row_ptr(rng):
    rows = rng.integers(0, 30, 200).astype(np.int32)
    rp = native.build_row_ptr(rows, 30)
    counts = np.bincount(rows, minlength=30)
    np.testing.assert_array_equal(rp, np.concatenate([[0], np.cumsum(counts)]))
    assert rp.dtype == np.int64


def test_ell_pack_matches_numpy_path(rng, monkeypatch):
    """build_ell_arrays native vs forced-numpy must be bit-identical (the
    counting sort is stable, so packing order matches argsort(stable))."""
    from tf_geometric_tpu.ops import ell as ell_mod
    rows = rng.integers(0, 40, 500)
    cols = rng.integers(0, 40, 500)
    vals = rng.normal(size=500).astype(np.float32)
    got = ell_mod.build_ell_arrays(rows, cols, vals, 40, 40, 4)

    monkeypatch.setattr(native, "available", lambda: False)
    expected = ell_mod.build_ell_arrays(rows, cols, vals, 40, 40, 4)
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(g, e)


def test_sample_fixed_k_draws_real_neighbors(rng):
    rows = rng.integers(0, 25, 300).astype(np.int32)
    cols = rng.integers(0, 25, 300).astype(np.int32)
    order = native.sort_by_row(rows, 25)
    row_ptr = native.build_row_ptr(rows, 25)
    sorted_col = cols[order]
    w = np.ones(300, np.float32)
    sources = np.arange(25, dtype=np.int64)
    out_col, out_w = native.sample_fixed_k(row_ptr, sorted_col, w, sources,
                                           k=7, seed=123)
    assert out_col.shape == (25, 7)
    adj = {int(s): set(sorted_col[row_ptr[s]:row_ptr[s + 1]].tolist())
           for s in sources}
    for s in sources:
        if adj[int(s)]:
            assert set(out_col[s].tolist()) <= adj[int(s)]
            assert (out_w[s] == 1.0).all()
        else:  # isolated: self-pad with zero weight
            assert (out_col[s] == s).all() and (out_w[s] == 0.0).all()
    # deterministic in seed
    again, _ = native.sample_fixed_k(row_ptr, sorted_col, w, sources, 7, 123)
    np.testing.assert_array_equal(out_col, again)
    other, _ = native.sample_fixed_k(row_ptr, sorted_col, w, sources, 7, 124)
    assert not np.array_equal(out_col, other)


def test_random_neighbor_sampler_uses_native(rng):
    from tf_geometric_tpu.utils.graph_utils import RandomNeighborSampler
    ei = np.stack([rng.integers(0, 30, 200), rng.integers(0, 30, 200)])
    sampler = RandomNeighborSampler(ei, rng=0)
    (row, col), w = sampler.sample(k=5, padding=True)
    assert row.shape == (30 * 5,)
    # every drawn edge is real (or a zero-weight self-pad)
    adj = {s: set(ei[1][ei[0] == s].tolist()) for s in range(30)}
    for r, c, ww in zip(row.tolist(), col.tolist(), w.tolist()):
        assert (c in adj[r]) or (ww == 0.0 and c == r)


def test_lpa_labels_two_blocks():
    """Two disconnected cliques must end with two distinct uniform labels."""
    import itertools
    edges = []
    for block in (range(0, 6), range(6, 12)):
        for a, b in itertools.permutations(block, 2):
            edges.append((a, b))
    ei = np.array(edges).T
    order = native.sort_by_row(ei[0].astype(np.int32), 12)
    row_ptr = native.build_row_ptr(ei[0].astype(np.int32), 12)
    col = ei[1][order].astype(np.int32)
    labels = native.lpa_labels(row_ptr, col, 12, num_iters=10)
    assert len(set(labels[:6].tolist())) == 1
    assert len(set(labels[6:].tolist())) == 1
    assert labels[0] != labels[6]


def test_community_order_native_path(rng):
    from tf_geometric_tpu.parallel.partition import community_order
    # SBM-ish: two blocks with dense intra edges
    r1 = rng.integers(0, 20, 300)
    c1 = rng.integers(0, 20, 300)
    r2 = rng.integers(20, 40, 300)
    c2 = rng.integers(20, 40, 300)
    ei = np.stack([np.concatenate([r1, r2]), np.concatenate([c1, c2])])
    perm = community_order(ei, 40)
    assert sorted(perm.tolist()) == list(range(40))
    # block members should be mapped to contiguous ranges
    new1 = np.sort(perm[:20])
    new2 = np.sort(perm[20:])
    assert new1.max() - new1.min() == 19 or new2.max() - new2.min() == 19


def test_partition_refine_native_invariants(rng, monkeypatch):
    """Native partition_order: valid permutation, exact block fills, and a
    cut no worse than the numpy fallback path's starting point."""
    from tf_geometric_tpu.parallel import partition
    N, Pn = 1500, 4
    # homophilous blocks so refinement has signal
    y = rng.integers(0, 12, N)
    src = rng.integers(0, N, 6000)
    dst = np.where(rng.random(6000) < 0.8,
                   np.array([rng.choice(np.nonzero(y == y[s])[0]) for s in src]),
                   rng.integers(0, N, 6000))
    ei = np.stack([src, dst]).astype(np.int64)

    perm_native = partition.partition_order(ei, N, Pn)
    assert sorted(perm_native.tolist()) == list(range(N))
    npp = partition.nodes_per_part(N, Pn)
    caps = np.array([max(0, min(npp, N - p * npp)) for p in range(Pn)])
    fills = np.bincount(np.minimum(perm_native // npp, Pn - 1), minlength=Pn)
    np.testing.assert_array_equal(fills, caps)

    def cross(perm):
        pe = perm[ei]
        return (np.minimum(pe[0] // npp, Pn - 1)
                != np.minimum(pe[1] // npp, Pn - 1)).mean()

    monkeypatch.setattr(native, "available", lambda: False)
    perm_numpy = partition.partition_order(ei, N, Pn)
    fills = np.bincount(np.minimum(perm_numpy // npp, Pn - 1), minlength=Pn)
    np.testing.assert_array_equal(fills, caps)
    # both refined partitions beat the raw-id baseline
    assert cross(perm_native) < cross(np.arange(N)) - 0.05
    assert cross(perm_numpy) < cross(np.arange(N)) - 0.05
