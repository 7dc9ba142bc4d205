"""Degree-bucketed fused GAT attention (ops/ell_attention_bucketed.py) vs
dense oracles, plus its integration as the default GAT cache layout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_geometric_tpu.ops.ell_attention_bucketed import (
    BucketedGatLayout, build_gat_layout_bucketed, gat_attention_bucketed)
from tests.test_ell_attention import _oracle_attention


def _skewed_graph(rng, n, H, d, hub_deg=40):
    """One hub destination (overflows any uniform K), empty rows, self-loops
    on a prefix of nodes — the shape mix the bucketed layout must cover."""
    rows = np.concatenate([
        np.full(hub_deg, 2, np.int64),
        rng.integers(3, n - 2, 60),                    # n-2, n-1 empty
        np.arange(min(5, n)),                          # a few self-loops
    ])
    cols = np.concatenate([
        rng.integers(0, n, hub_deg + 60),
        np.arange(min(5, n)),
    ])
    order = np.argsort(rows, kind="stable")
    ei = np.stack([rows, cols])[:, order].astype(np.int32)
    Q = rng.normal(size=(n, H * d)).astype(np.float32)
    K = rng.normal(size=(n, H * d)).astype(np.float32)
    V = rng.normal(size=(n, H * d)).astype(np.float32)
    return ei, Q, K, V


@pytest.mark.parametrize("layout_mode", ["auto", "bucketed", "classic"])
def test_bucketed_attention_matches_oracle(rng, layout_mode):
    n, H, d = 25, 4, 8
    ei, Q, K, V = _skewed_graph(rng, n, H, d)
    layout = build_gat_layout_bucketed(ei, n, layout=layout_mode)
    out = gat_attention_bucketed(layout, jnp.asarray(Q), jnp.asarray(K),
                                 jnp.asarray(V), H)
    expected = _oracle_attention(ei, Q, K, V, H, d)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)
    # empty rows aggregate to exactly zero
    assert np.abs(np.asarray(out)[-2:]).max() == 0.0


@pytest.mark.parametrize("layout_mode", ["bucketed", "classic"])
def test_bucketed_attention_grads_match_segment_autodiff(rng, layout_mode):
    n, H, d = 18, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d, hub_deg=25)
    layout = build_gat_layout_bucketed(ei, n, layout=layout_mode)
    dy = rng.normal(size=(n, H * d)).astype(np.float32)

    def loss_fused(q, k, v):
        return jnp.sum(gat_attention_bucketed(layout, q, k, v, H) * dy)

    gq, gk, gv = jax.grad(loss_fused, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))

    # oracle: same math via segment ops + plain autodiff
    from tf_geometric_tpu.nn.kernel.segment import segment_softmax

    row, col = jnp.asarray(ei[0]), jnp.asarray(ei[1])

    def loss_seg(q, k, v):
        qh = q.reshape(n, H, d)
        kh = k.reshape(n, H, d)
        s = jnp.sum(jnp.take(qh, row, 0) * jnp.take(kh, col, 0), -1) \
            / np.sqrt(d)
        a = segment_softmax(s, row, n)
        msg = jnp.take(v.reshape(n, H, d), col, 0) * a[:, :, None]
        out = jax.ops.segment_sum(msg.reshape(-1, H * d), row, num_segments=n)
        return jnp.sum(out * dy)

    eq, ek, ev = jax.grad(loss_seg, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))
    np.testing.assert_allclose(np.asarray(gq), np.asarray(eq),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(ek),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev),
                               rtol=2e-3, atol=2e-3)


def test_bucketed_attention_padding_edges_vanish(rng):
    """Edges with row == num_nodes (the padding convention) must not
    contribute, and the layout must accept them."""
    n, H, d = 15, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d, hub_deg=10)
    ei_pad = np.concatenate([ei, np.full((2, 7), n, np.int32)], axis=1)
    layout = build_gat_layout_bucketed(ei_pad, n, layout="bucketed")
    out = gat_attention_bucketed(layout, jnp.asarray(Q), jnp.asarray(K),
                                 jnp.asarray(V), H)
    expected = _oracle_attention(ei, Q, K, V, H, d)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_bucketed_attention_dropout_differentiable(rng):
    n, H, d = 20, 2, 8
    ei, Q, K, V = _skewed_graph(rng, n, H, d)
    layout = build_gat_layout_bucketed(ei, n, layout="bucketed")

    def loss(q):
        out = gat_attention_bucketed(layout, q, jnp.asarray(K),
                                     jnp.asarray(V), H, edge_drop_rate=0.4,
                                     training=True,
                                     dropout_key=jax.random.PRNGKey(0))
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(jnp.asarray(Q))
    assert np.isfinite(np.asarray(g)).all()
    with pytest.raises(ValueError):
        gat_attention_bucketed(layout, jnp.asarray(Q), jnp.asarray(K),
                               jnp.asarray(V), H, edge_drop_rate=0.4,
                               training=True)


def test_bucketed_layout_is_jit_argument_pytree(rng):
    """Static sizes live in aux data: the layout works as a jit ARGUMENT
    (the multi-chip plan-as-arguments pattern), not only as a constant."""
    n, H, d = 16, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d, hub_deg=12)
    layout = build_gat_layout_bucketed(ei, n, layout="bucketed")

    @jax.jit
    def f(lay, q, k, v):
        return gat_attention_bucketed(lay, q, k, v, H)

    out = f(layout, jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))
    expected = _oracle_attention(ei, Q, K, V, H, d)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_gat_cache_builds_bucketed_by_default(rng):
    """nn.gat with a cache compiles the bucketed layout (unless config says
    uniform) and matches the plain segment path."""
    import tf_geometric_tpu.nn as tnn
    from tf_geometric_tpu.ops import config as kconf

    n, f, H, units = 22, 6, 2, 8
    ei = rng.integers(0, n, size=(2, 70)).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    wq = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    wv = jnp.asarray(rng.normal(size=(f, units)).astype(np.float32))
    bq = jnp.zeros(units)

    def run(cache):
        return tnn.gat(x, jnp.asarray(ei), wq, bq, None, wk, bq, None, wv,
                       num_heads=H, cache=cache)

    cache = {}
    out_cached = run(cache)
    assert any(isinstance(v, tuple) and isinstance(v[2], BucketedGatLayout)
               for v in cache.values())
    out_plain = run(None)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_plain),
                               rtol=2e-4, atol=2e-4)

    kconf.set_ell_layout("uniform")
    try:
        from tf_geometric_tpu.ops.ell_attention import GatEllLayout
        cache_u = {}
        out_uniform = run(cache_u)
        assert any(isinstance(v, tuple) and isinstance(v[2], GatEllLayout)
                   for v in cache_u.values())
        np.testing.assert_allclose(np.asarray(out_uniform),
                                   np.asarray(out_plain),
                                   rtol=2e-4, atol=2e-4)
    finally:
        kconf.set_ell_layout("auto")


def test_gat_unequal_head_widths_with_bucketed_cache(rng):
    """d_q != d_v routes to the merged-head EllAdj fallback, built lazily
    from the cached sorted edge list."""
    import tf_geometric_tpu.nn as tnn

    n, f, H = 17, 5, 2
    ei = rng.integers(0, n, size=(2, 50)).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    wq = jnp.asarray(rng.normal(size=(f, 2 * H)).astype(np.float32))   # d_q=2
    wk = jnp.asarray(rng.normal(size=(f, 2 * H)).astype(np.float32))
    wv = jnp.asarray(rng.normal(size=(f, 8 * H)).astype(np.float32))   # d_v=8
    bq = jnp.zeros(2 * H)

    def run(cache):
        return tnn.gat(x, jnp.asarray(ei), wq, bq, None, wk, bq, None, wv,
                       num_heads=H, cache=cache)

    cache = {}
    out_cached = run(cache)
    assert any(k.endswith(":mh_ell") for k in cache)
    out_plain = run(None)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_plain),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("compute_dtype", [None, "bfloat16"])
def test_transpose_recompute_matches_flat_weight_path(rng, compute_dtype):
    """The recompute transpose (stats riding the dy gather, bit-cast when the
    compute dtype is 16-bit) must reproduce the flat-weight-gather transpose
    bit-for-tolerance on all three grads, tail lanes included."""
    from tf_geometric_tpu.ops import config as kconf

    n, H, d = 21, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d, hub_deg=30)
    # small explicit caps so the hub overflows into the tail lanes
    layout = build_gat_layout_bucketed(ei, n, caps=[2, 8], layout="bucketed")
    assert layout.fwd.tail_prow.shape[0] > 0  # the hub must overflow caps
    dy = rng.normal(size=(n, H * d)).astype(np.float32)
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    def grads():
        def loss(q, k, v):
            return jnp.sum(gat_attention_bucketed(layout, q, k, v, H,
                                                  compute_dtype=cd) * dy)
        return jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))

    kconf.set_ell_attention_recompute_transpose(True)
    try:
        g_rec = grads()
    finally:
        kconf.set_ell_attention_recompute_transpose(False)
    g_flat = grads()
    # identical math modulo exp/log roundoff in the recomputed softmax
    tol = 2e-2 if compute_dtype == "bfloat16" else 1e-5
    for got, want in zip(g_rec, g_flat):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=tol, atol=tol)


def test_transpose_recompute_skipped_under_edge_dropout(rng):
    """Per-edge dropout masks can't be recomputed — the kernel must fall back
    to the flat-weight path and still differentiate finitely."""
    n, H, d = 16, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d, hub_deg=12)
    layout = build_gat_layout_bucketed(ei, n, layout="bucketed")

    def loss(q):
        out = gat_attention_bucketed(layout, q, jnp.asarray(K),
                                     jnp.asarray(V), H, edge_drop_rate=0.3,
                                     training=True,
                                     dropout_key=jax.random.PRNGKey(1))
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(jnp.asarray(Q))
    assert np.isfinite(np.asarray(g)).all()


def test_save_lanes_matches_regather_path(rng):
    """With ell_attention_save_lanes the backward reads the forward's saved
    K/V slot lanes instead of re-gathering; grads must be BIT-IDENTICAL to
    the default re-gather path (the saved lanes are exactly the rows the
    re-gather would fetch, padding lanes included). Measured-and-rejected
    as the default on v5e (ops/config.py) — kept as a tested capability."""
    from tf_geometric_tpu.ops import config as kconf

    n, H, d = 21, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d, hub_deg=30)
    layout = build_gat_layout_bucketed(ei, n, caps=[2, 8], layout="bucketed")
    assert layout.fwd.tail_prow.shape[0] > 0
    dy = rng.normal(size=(n, H * d)).astype(np.float32)

    def grads():
        def loss(q, k, v):
            return jnp.sum(gat_attention_bucketed(layout, q, k, v, H) * dy)
        return jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))

    assert not kconf.ell_attention_save_lanes  # default OFF (measured slower)
    g_regather = grads()
    kconf.set_ell_attention_save_lanes(True)
    try:
        g_saved = grads()
    finally:
        kconf.set_ell_attention_save_lanes(False)
    for got, want in zip(g_saved, g_regather):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_transpose_scatter_matches_gather_path(rng):
    """With ell_attention_transpose_scatter the ã‖ds weights reach the
    transpose pass via one unique-index scatter (layout.w_scatter_pos)
    instead of a per-lane narrow gather; grads must be BIT-IDENTICAL (the
    scatter is a pure permutation of the same values). Measured-and-rejected
    as the default on v5e — 7.19M vs 18.11M e/s, random scatters cost ~2.5x
    the gather (benchmarks/README.md) — kept as a tested capability."""
    from tf_geometric_tpu.ops import config as kconf

    n, H, d = 21, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d, hub_deg=30)
    layout = build_gat_layout_bucketed(ei, n, caps=[2, 8], layout="bucketed")
    assert layout.fwd.tail_prow.shape[0] > 0
    assert layout.w_scatter_pos is not None
    dy = rng.normal(size=(n, H * d)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    def grads(drop):
        def loss(q, k, v):
            out = gat_attention_bucketed(layout, q, k, v, H,
                                         edge_drop_rate=drop, training=drop > 0,
                                         dropout_key=key if drop > 0 else None)
            return jnp.sum(out * dy)
        return jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))

    assert not kconf.ell_attention_transpose_scatter  # default OFF (slower)
    for drop in (0.0, 0.3):  # scalar-keep and per-edge-mask regimes
        g_gather = grads(drop)
        kconf.set_ell_attention_transpose_scatter(True)
        try:
            g_scatter = grads(drop)
        finally:
            kconf.set_ell_attention_transpose_scatter(False)
        for got, want in zip(g_scatter, g_gather):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
