"""Property sweep: the packed kernels must match dense oracles across many
random graph shapes — degree skews, duplicates, self-loop-heavy graphs,
padding, empty rows, tiny/zero edge counts — for forward AND gradients.

The per-kernel tests (test_ell*.py) pin one configuration each; this sweep
guards the configuration space between them.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_geometric_tpu.ops.ell import EllAdj, ell_spmm
from tf_geometric_tpu.ops.ell_attention import build_gat_layout, gat_attention_ell
from tests.conftest import dense_adj
from tests.test_ell_attention import _oracle_attention


def _random_config(seed):
    """One random graph configuration; seeds tile the shape space."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 120))
    style = seed % 5
    if style == 0:                      # uniform random (duplicates likely)
        e = int(rng.integers(1, 6 * n))
        rows = rng.integers(0, n, e)
        cols = rng.integers(0, n, e)
    elif style == 1:                    # star: one hub destination → big tail
        e = int(rng.integers(n, 4 * n))
        rows = np.full(e, int(rng.integers(0, n)))
        cols = rng.integers(0, n, e)
    elif style == 2:                    # self-loop heavy (diag split path)
        loops = np.arange(n)
        extra = rng.integers(0, n, max(1, n // 2))
        rows = np.concatenate([loops, extra])
        cols = np.concatenate([loops, rng.integers(0, n, extra.shape[0])])
    elif style == 3:                    # near-empty: 1-2 edges
        e = int(rng.integers(1, 3))
        rows = rng.integers(0, n, e)
        cols = rng.integers(0, n, e)
    else:                               # power-lawish degree skew
        e = int(rng.integers(2, 8 * n))
        rows = (rng.pareto(1.0, e) % n).astype(np.int64)
        cols = rng.integers(0, n, e)
    ei = np.stack([rows, cols]).astype(np.int32)
    ew = rng.normal(size=ei.shape[1]).astype(np.float32)
    if seed % 3 == 0:                   # append padding edges (must vanish)
        pad = max(1, ei.shape[1] // 7)
        ei = np.concatenate([ei, np.full((2, pad), n, np.int32)], axis=1)
        ew = np.concatenate([ew, np.zeros(pad, np.float32)])
    f = int(rng.integers(1, 24))
    x = rng.normal(size=(n, f)).astype(np.float32)
    return n, ei, ew, x, rng


@pytest.mark.parametrize("seed", range(12))
def test_ell_spmm_fuzz_forward_and_grads(seed):
    n, ei, ew, x, rng = _random_config(seed)
    dense = dense_adj(ei[:, ei[0] < n], ew[ei[0] < n], n)
    for split_diag in (False, True):
        ell = EllAdj.from_coo(ei, ew, (n, n), split_diag=split_diag)
        out = ell_spmm(ell, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), dense @ x,
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"fwd seed={seed} split={split_diag}")

        ct = rng.normal(size=out.shape).astype(np.float32)

        def loss(h):
            return jnp.sum(ell_spmm(ell, h) * ct)

        gh = jax.grad(loss)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(gh), dense.T @ ct,
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad seed={seed} split={split_diag}")


@pytest.mark.parametrize("kernel", ["uniform", "bucketed"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_attention_fuzz(seed, kernel):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(4, 60))
    H, d = int(rng.integers(1, 5)), int(2 ** rng.integers(1, 4))
    e = int(rng.integers(2, 5 * n))
    style = seed % 2
    if style == 0:
        rows = rng.integers(0, n, e)
    else:                               # hub destination exercises the tail
        rows = np.where(rng.random(e) < 0.5, int(rng.integers(0, n)),
                        rng.integers(0, n, e))
    ei = np.stack([rows, rng.integers(0, n, e)]).astype(np.int32)
    # dedupe (row, col) pairs: duplicate edges are separate softmax entries
    # in edge-list attention (kernel and reference alike) but the dense-
    # matrix gradient oracle cannot represent them
    _, first = np.unique(ei[0].astype(np.int64) * n + ei[1], return_index=True)
    ei = ei[:, first]
    e = ei.shape[1]
    Q = rng.normal(size=(n, H * d)).astype(np.float32)
    K = rng.normal(size=(n, H * d)).astype(np.float32)
    V = rng.normal(size=(n, H * d)).astype(np.float32)

    if kernel == "uniform":
        ell = EllAdj.from_coo(ei, np.ones(e, np.float32), (n, n))
        layout = build_gat_layout(ell)
        attention = gat_attention_ell
    else:
        from tf_geometric_tpu.ops.ell_attention_bucketed import (
            build_gat_layout_bucketed, gat_attention_bucketed)
        layout = build_gat_layout_bucketed(ei, n, layout="bucketed")
        attention = gat_attention_bucketed
    out = attention(layout, jnp.asarray(Q), jnp.asarray(K),
                    jnp.asarray(V), H)
    expected = _oracle_attention(ei, Q, K, V, H, d)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-3,
                               err_msg=f"fused fwd seed={seed}")

    # grads vs an autodiff dense-softmax oracle
    ct = rng.normal(size=out.shape).astype(np.float32)

    def fused_loss(q, k, v):
        return jnp.sum(attention(layout, q, k, v, H) * ct)

    def oracle_loss(q, k, v):
        neg = jnp.float32(-1e30)
        s = jnp.full((H, n, n), neg)
        qv = q.reshape(n, H, d)
        kv = k.reshape(n, H, d)
        scores = jnp.einsum("ehd,ehd->eh", qv[ei[0]], kv[ei[1]]) / (d ** 0.5)
        s = s.at[:, ei[0], ei[1]].set(scores.T)
        a = jax.nn.softmax(s, axis=-1)
        a = jnp.where((s > neg / 2).any(-1, keepdims=True), a, 0.0)
        h = jnp.einsum("hnm,mhd->nhd", a, v.reshape(n, H, d)).reshape(n, H * d)
        return jnp.sum(h * ct)

    args = (jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))
    got = jax.grad(fused_loss, argnums=(0, 1, 2))(*args)
    want = jax.grad(oracle_loss, argnums=(0, 1, 2))(*args)
    for g, w, name in zip(got, want, "QKV"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} seed={seed}")
