"""ELL-packed SpMM vs COO/dense oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from tf_geometric_tpu.ops.ell import EllAdj, ell_spmm
from tf_geometric_tpu.sparse import SparseMatrix
from tests.conftest import dense_adj, random_graph


def test_ell_matches_dense(rng):
    x, ei, ew = random_graph(rng, 50, 300, 16)
    ell = EllAdj.from_coo(ei, ew, (50, 50))
    dense = dense_adj(ei, ew, 50)
    out = ell.matmul(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), dense @ x, rtol=1e-3, atol=1e-3)
    # via @ and feature splits
    np.testing.assert_allclose(np.asarray(ell @ jnp.asarray(x)), dense @ x,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ell.matmul(jnp.asarray(x), num_or_size_splits=2)),
        dense @ x, rtol=1e-3, atol=1e-3)


def test_ell_drops_padded_edges(rng):
    x, ei, ew = random_graph(rng, 30, 100, 8)
    ei_pad = np.concatenate([ei, np.full((2, 7), 30, np.int32)], axis=1)
    ew_pad = np.concatenate([ew, np.zeros(7, np.float32)])
    ell = EllAdj.from_coo(ei_pad, ew_pad, (30, 30))
    dense = dense_adj(ei, ew, 30)
    np.testing.assert_allclose(np.asarray(ell @ jnp.asarray(x)), dense @ x,
                               rtol=1e-3, atol=1e-3)


def test_ell_grads_match_dense(rng):
    x, ei, ew = random_graph(rng, 25, 120, 6)
    ell = EllAdj.from_coo(ei, ew, (25, 25))
    dense = jnp.asarray(dense_adj(ei, ew, 25))

    def loss_ell(h):
        return jnp.sum(ell_spmm(ell, h) ** 2)

    def loss_dense(h):
        return jnp.sum((dense @ h) ** 2)

    gh = jax.grad(loss_ell)(jnp.asarray(x))
    gh_dense = jax.grad(loss_dense)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_dense),
                               rtol=1e-3, atol=1e-3)


def test_ell_value_grads(rng):
    """d(value) per slot: matches the dense dL/dA entries."""
    x, ei, ew = random_graph(rng, 15, 60, 4)
    # dedupe edges so per-entry comparison is well-defined
    key = ei[0].astype(np.int64) * 15 + ei[1]
    _, first = np.unique(key, return_index=True)
    ei, ew = ei[:, first], ew[first]
    ell = EllAdj.from_coo(ei, ew, (15, 15))
    xs = jnp.asarray(x)

    def loss(slots_val, tail_val):
        kw = {n: getattr(ell, n) for n in EllAdj._LEAVES}
        kw.update(slots_val=slots_val, tail_val=tail_val, shape=ell.shape)
        return jnp.sum(ell_spmm(EllAdj(**kw), xs, diff_values=True) ** 2)

    g_slots, g_tail = jax.grad(loss, argnums=(0, 1))(ell.slots_val, ell.tail_val)

    class G:  # minimal namespace matching the assertions below
        slots_val = g_slots

    g = G()
    dense = jnp.asarray(dense_adj(ei, ew, 15))
    ga = jax.grad(lambda a: jnp.sum((a @ xs) ** 2))(dense)
    ga = np.asarray(ga)

    # reassemble per-edge grads from the ELL slot/tail layout
    slots_col = np.asarray(ell.slots_col)
    slots_val = np.asarray(ell.slots_val)
    d_slots = np.asarray(g.slots_val)
    for n in range(15):
        for k in range(slots_col.shape[1]):
            if slots_val[n, k] != 0:
                np.testing.assert_allclose(d_slots[n, k], ga[n, slots_col[n, k]],
                                           rtol=1e-3, atol=1e-3)


def test_gcn_uses_ell_when_cached(rng):
    from tf_geometric_tpu.nn.conv.gcn import compute_cache_key, gcn
    x, ei, ew = random_graph(rng, 20, 80, 8)
    adj = SparseMatrix(ei, ew, (20, 20))
    w = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    out_plain = gcn(jnp.asarray(x), adj, w)
    cache = {}
    out_cached = gcn(jnp.asarray(x), adj, w, cache=cache)
    assert any(key.endswith(":ell") for key in cache)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_cached),
                               rtol=1e-3, atol=1e-3)
    # training with edge dropout falls back to the COO path (no error)
    out_drop = gcn(jnp.asarray(x), adj, w, cache=cache, training=True,
                   edge_drop_rate=0.5, dropout_key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out_drop)).all()


def test_multihead_ell_matches_dense(rng):
    from tf_geometric_tpu.ops.ell import ell_spmm_multihead
    n, e, H, d = 20, 70, 4, 8
    _, ei, _ = random_graph(rng, n, e, 1)
    att = rng.normal(size=(e, H)).astype(np.float32)
    v = rng.normal(size=(n, H * d)).astype(np.float32)
    ell = EllAdj.from_coo(ei, np.ones(e, np.float32), (n, n))

    out = ell_spmm_multihead(ell, jnp.asarray(att), jnp.asarray(v), d)

    expected = np.zeros((n, H * d), np.float32)
    for idx in range(e):
        r, c = ei[0, idx], ei[1, idx]
        for h_ in range(H):
            expected[r, h_ * d:(h_ + 1) * d] += att[idx, h_] * v[c, h_ * d:(h_ + 1) * d]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-3)

    # gradients: d att and d v vs autodiff through a dense formulation
    def loss_ell(a, vv):
        return jnp.sum(ell_spmm_multihead(ell, a, vv, d) ** 2)

    ga, gv = jax.grad(loss_ell, argnums=(0, 1))(jnp.asarray(att), jnp.asarray(v))

    def loss_dense(a, vv):
        out = jnp.zeros((n, H * d))
        for h_ in range(H):
            block = vv[:, h_ * d:(h_ + 1) * d]
            from tf_geometric_tpu.ops.spmm import spmm_xla
            agg = spmm_xla(jnp.asarray(ei), a[:, h_], block, n)
            out = out.at[:, h_ * d:(h_ + 1) * d].set(agg)
        return jnp.sum(out ** 2)

    ga2, gv2 = jax.grad(loss_dense, argnums=(0, 1))(jnp.asarray(att), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga2), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv2), rtol=1e-3, atol=1e-3)


def test_with_edge_values_roundtrip(rng):
    n, e = 15, 50
    _, ei, ew = random_graph(rng, n, e, 1)
    ell = EllAdj.from_coo(ei, ew, (n, n))
    new_vals = rng.normal(size=e).astype(np.float32)
    reskinned = ell.with_edge_values(jnp.asarray(new_vals))
    x = rng.normal(size=(n, 6)).astype(np.float32)
    out = reskinned @ jnp.asarray(x)
    expected = dense_adj(ei, new_vals, n) @ x
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-3)
    # gradient flows back to the edge values through the re-skin
    def loss(vals):
        return jnp.sum(ell_spmm(ell.with_edge_values(vals), jnp.asarray(x),
                                diff_values=True) ** 2)
    g = jax.grad(loss)(jnp.asarray(new_vals))
    assert np.abs(np.asarray(g)).sum() > 0


def test_pallas_sorted_segment_sum_interpret(rng):
    from tf_geometric_tpu.ops.pallas_segment import sorted_segment_sum_mxu
    n, e, f = 40, 1200, 16
    rows = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msg = rng.normal(size=(e, f)).astype(np.float32)
    out = sorted_segment_sum_mxu(jnp.asarray(msg), rows, n, interpret=True)
    expected = np.zeros((n, f), np.float32)
    np.add.at(expected, rows, msg)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_pallas_sorted_segment_sum_chunk_spanning_row(rng):
    """A single row spanning multiple chunks must accumulate correctly."""
    from tf_geometric_tpu.ops.pallas_segment import sorted_segment_sum_mxu, CHUNK
    n, f = 5, 8
    e = CHUNK * 2 + 100
    rows = np.concatenate([np.zeros(CHUNK + 50, np.int32),
                           np.full(e - CHUNK - 50, 3, np.int32)])
    msg = rng.normal(size=(e, f)).astype(np.float32)
    out = sorted_segment_sum_mxu(jnp.asarray(msg), rows, n, interpret=True)
    expected = np.zeros((n, f), np.float32)
    np.add.at(expected, rows, msg)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_ell_split_diag_matches_dense(rng):
    # graph with guaranteed self-loops on every node (GCN-normalized shape)
    x, ei, ew = random_graph(rng, 40, 200, 8)
    loops = np.arange(40, dtype=np.int32)
    ei = np.concatenate([ei, np.stack([loops, loops])], axis=1)
    ew = np.concatenate([ew, rng.uniform(0.5, 1.5, 40).astype(np.float32)])
    ell = EllAdj.from_coo(ei, ew, (40, 40), split_diag=True)
    assert ell.diag_val.shape[0] == 40
    # exactly one self-loop per row moved out of the packed part
    num_rows_with_loop = len(np.unique(ei[0][ei[0] == ei[1]]))
    packed = int((np.asarray(ell.slot_eid) < ei.shape[1]).sum()
                 + (np.asarray(ell.tail_eid) < ei.shape[1]).sum())
    assert packed == ei.shape[1] - num_rows_with_loop
    dense = dense_adj(ei, ew, 40)
    np.testing.assert_allclose(np.asarray(ell @ jnp.asarray(x)), dense @ x,
                               rtol=1e-3, atol=1e-3)


def test_ell_split_diag_grads(rng):
    x, ei, ew = random_graph(rng, 20, 80, 5)
    loops = np.arange(20, dtype=np.int32)
    ei = np.concatenate([ei, np.stack([loops, loops])], axis=1)
    ew = np.concatenate([ew, np.full(20, 0.7, np.float32)])
    ell = EllAdj.from_coo(ei, ew, (20, 20), split_diag=True)
    dense = jnp.asarray(dense_adj(ei, ew, 20))

    g_ell = jax.grad(lambda h: (ell_spmm(ell, h) ** 2).sum())(jnp.asarray(x))
    g_dense = jax.grad(lambda h: ((dense @ h) ** 2).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_dense),
                               rtol=1e-3, atol=1e-3)

    # diff_values: gradients w.r.t. the diagonal itself
    def loss_vals(diag_val):
        e2 = EllAdj(**{n: getattr(ell, n) for n in ell._LEAVES},
                    shape=ell.shape, num_edges=ell.num_edges)
        e2.diag_val = diag_val
        return (ell_spmm(e2, jnp.asarray(x), diff_values=True) ** 2).sum()

    g_diag = jax.grad(loss_vals)(ell.diag_val)
    out = np.asarray(dense) @ x
    expected = 2.0 * (out * x).sum(-1)  # d/d(diag_i) of sum((A@x)^2)
    np.testing.assert_allclose(np.asarray(g_diag), expected, rtol=1e-3,
                               atol=1e-3)


def test_ell_split_diag_with_edge_values(rng):
    x, ei, ew = random_graph(rng, 15, 60, 4)
    loops = np.arange(15, dtype=np.int32)
    ei = np.concatenate([ei, np.stack([loops, loops])], axis=1)
    ew = np.concatenate([ew, np.ones(15, np.float32)])
    ell = EllAdj.from_coo(ei, ew, (15, 15), split_diag=True)
    new_vals = rng.normal(size=ei.shape[1]).astype(np.float32)
    reskinned = ell.with_edge_values(jnp.asarray(new_vals))
    dense = dense_adj(ei, new_vals, 15)
    np.testing.assert_allclose(np.asarray(reskinned @ jnp.asarray(x)),
                               dense @ x, rtol=1e-3, atol=1e-3)


def test_ell_zero_valued_edge_keeps_gradient(rng):
    # a real edge whose current value is 0 must still receive a value
    # cotangent (eid-mask, not value!=0): zero-initialized learned edge
    # weights could otherwise never leave 0
    x, ei, ew = random_graph(rng, 12, 40, 3)
    loops = np.arange(12, dtype=np.int32)
    ei = np.concatenate([ei, np.stack([loops, loops])], axis=1)
    ew = np.concatenate([ew, np.ones(12, np.float32)])
    ell = EllAdj.from_coo(ei, ew, (12, 12), split_diag=True)

    def loss(vals):
        return (ell_spmm(ell.with_edge_values(vals), jnp.asarray(x),
                         diff_values=True) ** 2).sum()

    # values with the DIAGONAL entries exactly 0: the old value!=0 mask
    # silently zeroed their grads; the eid mask must keep them
    vals = np.full(ei.shape[1], 0.5, np.float32)
    vals[40:] = 0.0  # the 12 appended self-loops
    g = np.asarray(jax.grad(loss)(jnp.asarray(vals)))
    dense = dense_adj(ei, vals, 12)
    out = dense @ x
    # dL/dA_ii = 2 * (out_i . x_i) — generally nonzero despite A_ii == 0
    for i in range(12):
        expected = 2.0 * float(out[i] @ x[i])
        np.testing.assert_allclose(g[40 + i], expected, rtol=1e-3, atol=1e-3)
