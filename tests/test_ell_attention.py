"""Fused scatter-free ELL attention (ops/ell_attention.py) vs dense oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from tf_geometric_tpu.ops.ell import EllAdj
from tf_geometric_tpu.ops.ell_attention import build_gat_layout, gat_attention_ell
from tests.conftest import random_graph


def _oracle_attention(ei, Q, K, V, H, d):
    """Edge-list softmax-attention aggregation, pure numpy."""
    N = Q.shape[0]
    E = ei.shape[1]
    s = np.zeros((E, H), np.float64)
    for h in range(H):
        q = Q[:, h * d:(h + 1) * d].astype(np.float64)
        k = K[:, h * d:(h + 1) * d].astype(np.float64)
        s[:, h] = np.sum(q[ei[0]] * k[ei[1]], -1) / np.sqrt(d)
    a = np.zeros_like(s)
    for n in range(N):
        mask = ei[0] == n
        if not mask.any():
            continue
        sn = s[mask]
        e = np.exp(sn - sn.max(0))
        a[mask] = e / e.sum(0)
    out = np.zeros((N, H * d), np.float64)
    for idx in range(E):
        r, c = ei[0, idx], ei[1, idx]
        for h in range(H):
            out[r, h * d:(h + 1) * d] += a[idx, h] * V[c, h * d:(h + 1) * d]
    return out.astype(np.float32)


def _skewed_graph(rng, n, H, d):
    """Graph with one hub (degree >> mean) so the ELL tail is non-empty,
    plus isolated rows (no in-edges)."""
    rows = np.concatenate([
        np.full(40, 2, np.int64),                      # hub: overflows K
        rng.integers(3, n - 2, 60),                    # nodes n-2, n-1 empty
    ])
    cols = rng.integers(0, n, rows.shape[0])
    ei = np.stack([rows, cols]).astype(np.int32)
    Q = rng.normal(size=(n, H * d)).astype(np.float32)
    K = rng.normal(size=(n, H * d)).astype(np.float32)
    V = rng.normal(size=(n, H * d)).astype(np.float32)
    return ei, Q, K, V


def test_fused_attention_matches_oracle(rng):
    n, H, d = 25, 4, 8
    ei, Q, K, V = _skewed_graph(rng, n, H, d)
    ell = EllAdj.from_coo(ei, np.ones(ei.shape[1], np.float32), (n, n))
    assert ell.tail_row.shape[0] > 0  # the hub must exercise the tail path
    layout = build_gat_layout(ell)
    out = gat_attention_ell(layout, jnp.asarray(Q), jnp.asarray(K),
                            jnp.asarray(V), H)
    expected = _oracle_attention(ei, Q, K, V, H, d)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)
    # empty rows aggregate to exactly zero
    assert np.abs(np.asarray(out)[-2:]).max() == 0.0


def test_fused_attention_grads_match_autodiff_oracle(rng):
    n, H, d = 18, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d)
    ell = EllAdj.from_coo(ei, np.ones(ei.shape[1], np.float32), (n, n))
    layout = build_gat_layout(ell)
    dy = rng.normal(size=(n, H * d)).astype(np.float32)

    def loss_fused(q, k, v):
        return jnp.sum(gat_attention_ell(layout, q, k, v, H) * dy)

    gq, gk, gv = jax.grad(loss_fused, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))

    # oracle: same math with jnp segment ops, plain autodiff
    row = jnp.asarray(ei[0])
    col = jnp.asarray(ei[1])

    def loss_oracle(q, k, v):
        s = jnp.sum((q[row].reshape(-1, H, d) * k[col].reshape(-1, H, d)),
                    -1) / np.sqrt(d)
        smax = jax.ops.segment_max(s, row, num_segments=n)
        smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
        p = jnp.exp(s - smax[row])
        denom = jax.ops.segment_sum(p, row, num_segments=n)
        a = p / (denom[row] + 1e-16)
        msg = v[col].reshape(-1, H, d) * a[:, :, None]
        out = jax.ops.segment_sum(msg.reshape(-1, H * d), row, num_segments=n)
        return jnp.sum(out * dy)

    gq2, gk2, gv2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq2), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk2), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv2), rtol=1e-3,
                               atol=1e-4)


def test_fused_attention_dropout(rng):
    n, H, d = 20, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d)
    ell = EllAdj.from_coo(ei, np.ones(ei.shape[1], np.float32), (n, n))
    layout = build_gat_layout(ell)
    out = gat_attention_ell(layout, jnp.asarray(Q), jnp.asarray(K),
                            jnp.asarray(V), H, edge_drop_rate=0.5,
                            training=True, dropout_key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    # rate=0 / eval mode reduce to the deterministic path
    out_eval = gat_attention_ell(layout, jnp.asarray(Q), jnp.asarray(K),
                                 jnp.asarray(V), H, edge_drop_rate=0.5,
                                 training=False)
    expected = _oracle_attention(ei, Q, K, V, H, d)
    np.testing.assert_allclose(np.asarray(out_eval), expected, rtol=1e-4,
                               atol=1e-4)


def test_gat_op_uses_fused_path(rng):
    """nn.conv.gat with a cache must produce the same output as without."""
    from tf_geometric_tpu.nn.conv.gat import gat
    from tf_geometric_tpu.ops.ell_attention import GatEllLayout
    n, f, H, units = 30, 12, 4, 16
    x, ei, _ = random_graph(rng, n, 90, f)
    wq = rng.normal(scale=0.3, size=(f, units)).astype(np.float32)
    wk = rng.normal(scale=0.3, size=(f, units)).astype(np.float32)
    wv = rng.normal(scale=0.3, size=(f, units)).astype(np.float32)
    bq = np.zeros(units, np.float32)
    args = (jnp.asarray(wq), jnp.asarray(bq), jax.nn.relu,
            jnp.asarray(wk), jnp.asarray(bq), jax.nn.relu, jnp.asarray(wv))
    out_plain = gat(jnp.asarray(x), jnp.asarray(ei), *args, num_heads=H)
    cache = {}
    out_cached = gat(jnp.asarray(x), jnp.asarray(ei), *args, num_heads=H,
                     cache=cache)
    (_, _, layout), = [v for k, v in cache.items() if k.startswith("gat_edges")]
    from tf_geometric_tpu.ops.ell_attention_bucketed import BucketedGatLayout
    assert isinstance(layout, BucketedGatLayout)  # the default cache layout
    # config opt-out restores the uniform-K fused layout
    from tf_geometric_tpu.ops import config as kconf
    kconf.set_ell_layout("uniform")
    try:
        cache_u = {}
        out_uniform = gat(jnp.asarray(x), jnp.asarray(ei), *args, num_heads=H,
                          cache=cache_u)
        (_, _, lay_u), = [v for k, v in cache_u.items()
                          if k.startswith("gat_edges")]
        assert isinstance(lay_u, GatEllLayout)
        np.testing.assert_allclose(np.asarray(out_uniform),
                                   np.asarray(out_cached), rtol=1e-4, atol=1e-4)
    finally:
        kconf.set_ell_layout("auto")
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_cached),
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_split_diag_matches_oracle(rng):
    """The dense diag lane (split self-loops) must match the packed layout
    exactly — forward and grads — including a hub row with a tail."""
    n, H, d = 22, 2, 4
    ei, Q, K, V = _skewed_graph(rng, n, H, d)
    loops = np.arange(n, dtype=np.int32)
    ei = np.concatenate([ei, np.stack([loops, loops])], axis=1)
    order = np.argsort(ei[0], kind="stable")
    ei = ei[:, order]
    ones = np.ones(ei.shape[1], np.float32)

    packed = build_gat_layout(EllAdj.from_coo(ei, ones, (n, n)))
    split = build_gat_layout(EllAdj.from_coo(ei, ones, (n, n),
                                             split_diag=True))
    assert split.ell.diag_eid.shape[0] == n
    args = (jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))
    out_packed = gat_attention_ell(packed, *args, H)
    out_split = gat_attention_ell(split, *args, H)
    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_packed),
                               rtol=1e-4, atol=1e-4)
    expected = _oracle_attention(ei, Q, K, V, H, d)
    np.testing.assert_allclose(np.asarray(out_split), expected,
                               rtol=1e-4, atol=1e-4)

    dy = rng.normal(size=(n, H * d)).astype(np.float32)

    def loss(layout, q, k, v):
        return jnp.sum(gat_attention_ell(layout, q, k, v, H) * dy)

    g_split = jax.grad(lambda q, k, v: loss(split, q, k, v),
                       argnums=(0, 1, 2))(*args)
    g_packed = jax.grad(lambda q, k, v: loss(packed, q, k, v),
                        argnums=(0, 1, 2))(*args)
    for gs, gp in zip(g_split, g_packed):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gp),
                                   rtol=1e-4, atol=1e-4)


def test_multihead_ell_split_diag_matches_packed(rng):
    from tf_geometric_tpu.ops.ell import ell_spmm_multihead
    n, H, d = 15, 3, 4
    _, ei, _ = random_graph(rng, n, 60, 1)
    loops = np.arange(n, dtype=np.int32)
    ei = np.concatenate([ei, np.stack([loops, loops])], axis=1)
    E = ei.shape[1]
    att = rng.normal(size=(E, H)).astype(np.float32)
    v = rng.normal(size=(n, H * d)).astype(np.float32)
    ones = np.ones(E, np.float32)
    packed = EllAdj.from_coo(ei, ones, (n, n))
    split = EllAdj.from_coo(ei, ones, (n, n), split_diag=True)

    out_p = ell_spmm_multihead(packed, jnp.asarray(att), jnp.asarray(v), d)
    out_s = ell_spmm_multihead(split, jnp.asarray(att), jnp.asarray(v), d)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                               rtol=1e-4, atol=1e-4)

    def loss(ell, a, vv):
        return jnp.sum(ell_spmm_multihead(ell, a, vv, d) ** 2)

    ga_s, gv_s = jax.grad(lambda a, vv: loss(split, a, vv), argnums=(0, 1))(
        jnp.asarray(att), jnp.asarray(v))
    ga_p, gv_p = jax.grad(lambda a, vv: loss(packed, a, vv), argnums=(0, 1))(
        jnp.asarray(att), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(ga_s), np.asarray(ga_p),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv_s), np.asarray(gv_p),
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_isolated_node_empty_row(rng):
    """split_diag layout with an isolated node (no self-loop): its diag slot
    is the sentinel, and the row must aggregate to exactly 0 (not V[row])."""
    from tf_geometric_tpu.ops.ell import EllAdj
    from tf_geometric_tpu.ops.ell_attention import (build_gat_layout,
                                                    gat_attention_ell)
    N, H, d = 6, 2, 4
    # edges among nodes 0..3 with self-loops; nodes 4 and 5 fully isolated
    ei = np.array([[0, 1, 2, 3, 0, 1], [0, 1, 2, 3, 1, 2]], np.int32)
    ell = EllAdj.from_coo(ei, np.ones(ei.shape[1], np.float32), (N, N),
                          split_diag=True)
    layout = build_gat_layout(ell)
    Q = jnp.asarray(rng.normal(size=(N, H * d)), jnp.float32)
    K = jnp.asarray(rng.normal(size=(N, H * d)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(N, H * d)), jnp.float32)
    out = gat_attention_ell(layout, Q, K, V, H)
    np.testing.assert_allclose(np.asarray(out[4:]), 0.0, atol=1e-7)
    assert np.abs(np.asarray(out[:4])).sum() > 0

    # gradients must not leak through the empty rows either
    def loss(v):
        return (gat_attention_ell(layout, Q, K, v, H) ** 2).sum()

    dV = np.asarray(jax.grad(loss)(V))
    np.testing.assert_allclose(dV[4:], 0.0, atol=1e-7)
