"""Degree-bucketed ELL SpMM (ops/ell_bucketed.py) vs dense oracles, plus its
integration as the default cache-compiled layout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_geometric_tpu.ops.ell_bucketed import BucketedEllAdj, bucketed_spmm
from tf_geometric_tpu.sparse import SparseMatrix


def _skewed(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 150))
    e = int(rng.integers(2, 8 * n))
    hub = int(rng.integers(0, n))
    rows = np.where(rng.random(e) < 0.4, hub, rng.integers(0, n, e))
    cols = rng.integers(0, n, e)
    ei = np.stack([rows, cols]).astype(np.int32)
    ew = rng.normal(size=e).astype(np.float32)
    # padding edges must vanish
    ei = np.concatenate([ei, np.full((2, 5), n, np.int32)], axis=1)
    ew = np.concatenate([ew, np.zeros(5, np.float32)])
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), ew[:e])
    x = rng.normal(size=(n, 7)).astype(np.float32)
    return n, ei, ew, dense, x, rng


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("layout", ["auto", "bucketed", "classic"])
def test_bucketed_matches_dense_fwd_and_grad(seed, layout):
    n, ei, ew, dense, x, rng = _skewed(seed)
    for split_diag in (False, True):
        adj = BucketedEllAdj.from_coo(ei, ew, (n, n), split_diag=split_diag,
                                      layout=layout)
        out = bucketed_spmm(adj, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), dense @ x,
                                   rtol=2e-3, atol=2e-3)
        ct = rng.normal(size=out.shape).astype(np.float32)
        g = jax.grad(lambda h: jnp.sum(bucketed_spmm(adj, h) * ct))(
            jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g), dense.T @ ct,
                                   rtol=2e-3, atol=2e-3)


def test_bucketed_with_edge_values_reskins_both_directions():
    n, ei, ew, dense, x, rng = _skewed(42)
    adj = BucketedEllAdj.from_coo(ei, ew, (n, n), split_diag=True,
                                  layout="bucketed")
    new_vals = rng.normal(size=ei.shape[1]).astype(np.float32)
    e_real = ei.shape[1] - 5
    dense2 = np.zeros((n, n), np.float32)
    np.add.at(dense2, (ei[0, :e_real], ei[1, :e_real]), new_vals[:e_real])
    reskinned = adj.with_edge_values(jnp.asarray(new_vals))
    out = bucketed_spmm(reskinned, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), dense2 @ x, rtol=2e-3, atol=2e-3)
    # transpose direction too (via grad)
    ct = rng.normal(size=out.shape).astype(np.float32)
    g = jax.grad(lambda h: jnp.sum(bucketed_spmm(reskinned, h) * ct))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), dense2.T @ ct, rtol=2e-3, atol=2e-3)


def test_bucketed_works_as_jit_argument():
    """The layout is a registered pytree: usable as a jit argument (the
    multi-chip plan-as-arguments pattern), not just a closure constant."""
    n, ei, ew, dense, x, _ = _skewed(7)
    adj = BucketedEllAdj.from_coo(ei, ew, (n, n), layout="bucketed")

    @jax.jit
    def f(a, h):
        return bucketed_spmm(a, h)

    out = f(adj, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), dense @ x, rtol=2e-3, atol=2e-3)

    g = jax.jit(lambda a, h: jax.grad(
        lambda hh: bucketed_spmm(a, hh).sum())(h))(adj, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), dense.T.sum(1, keepdims=True)
                               .repeat(x.shape[1], 1), rtol=2e-3, atol=2e-3)


def test_cache_compiles_bucketed_by_default_and_uniform_opt_out(rng):
    from tf_geometric_tpu.nn.conv.gcn import (compute_cache_key, gcn_norm_adj,
                                              maybe_compile_ell)
    from tf_geometric_tpu.ops import config as kconf
    from tf_geometric_tpu.ops.ell import EllAdj

    n = 30
    ei = rng.integers(0, n, size=(2, 90)).astype(np.int32)
    key = compute_cache_key("both", True, True, True, False)

    cache = {}
    normed = gcn_norm_adj(SparseMatrix(ei, None, (n, n)), cache=cache)
    adj = maybe_compile_ell(normed, cache, key)
    assert isinstance(adj, BucketedEllAdj)

    assert kconf.ell_layout == "auto"
    try:
        kconf.set_ell_layout("uniform")
        cache2 = {}
        normed2 = gcn_norm_adj(SparseMatrix(ei, None, (n, n)), cache=cache2)
        adj2 = maybe_compile_ell(normed2, cache2, key)
        assert isinstance(adj2, EllAdj)
    finally:
        kconf.set_ell_layout("auto")
    with pytest.raises(ValueError):
        kconf.set_ell_layout("bogus")


def test_gcn_training_with_edge_dropout_uses_bucketed_reskin(rng):
    """The cached-layout dropout path must route through
    BucketedEllAdj.with_edge_values and stay differentiable."""
    import tf_geometric_tpu.nn as tnn
    from tf_geometric_tpu.nn.conv.gcn import gcn_build_cache_by_adj

    n, f = 25, 6
    ei = rng.integers(0, n, size=(2, 80)).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(f, 4)).astype(np.float32))
    adj = SparseMatrix(ei, None, (n, n))
    cache = gcn_build_cache_by_adj(adj)
    # the :ell layout is compiled lazily by the first forward
    _ = tnn.gcn(x, adj, w, cache=cache)
    assert any(k.endswith(":ell") and isinstance(v, BucketedEllAdj)
               for k, v in cache.items())

    def loss(w_):
        out = tnn.gcn(x, adj, w_, edge_drop_rate=0.4, training=True,
                      dropout_key=jax.random.PRNGKey(3), cache=cache)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0
