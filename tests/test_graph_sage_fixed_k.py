"""Fixed-k dense GraphSAGE path: slot-major sampler output + scatter-free op.

Parity targets: `mean_graph_sage_fixed_k` over `sample_dense` output must
match `mean_graph_sage` over the SAME draw flattened to an edge list (the
reference fixed-k semantics: segment_mean over exactly-k rows divides by k,
so weight-0 pad slots count as zeros in both forms).
"""
import numpy as np
import jax
import jax.numpy as jnp

from tf_geometric_tpu.nn import (mean_graph_sage, sum_graph_sage,
                                 mean_graph_sage_fixed_k,
                                 sum_graph_sage_fixed_k)
from tf_geometric_tpu.utils.graph_utils import RandomNeighborSampler


def _setup(rng, n=40, e=300, f_in=12, f_out=5):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    ew = rng.uniform(0.5, 1.5, e).astype(np.float32)
    x = rng.normal(size=(n, f_in)).astype(np.float32)
    sk = rng.normal(size=(f_in, f_out)).astype(np.float32)
    nk = rng.normal(size=(f_in, f_out)).astype(np.float32)
    return ei, ew, x, sk, nk


def _flatten(nb_idx, nb_w):
    """[k, S] slot-major draw → flattened fixed-k edge list [2, S*k]."""
    k, s = nb_idx.shape
    row = np.repeat(np.arange(s, dtype=np.int32), k)
    col = nb_idx.T.reshape(-1)
    w = nb_w.T.reshape(-1)
    return np.stack([row, col]).astype(np.int32), w


def test_sample_dense_matches_flattened_semantics(rng):
    ei, ew, x, sk, nk = _setup(rng)
    sampler = RandomNeighborSampler(ei, ew, rng=7)
    nb_idx, nb_w = sampler.sample_dense(k=6)
    assert nb_idx.shape == (6, 40) and nb_w.shape == (6, 40)
    fei, few = _flatten(nb_idx, nb_w)
    ref = mean_graph_sage(jnp.asarray(x), jnp.asarray(fei), jnp.asarray(few),
                          jnp.asarray(sk), jnp.asarray(nk))
    out = mean_graph_sage_fixed_k(jnp.asarray(x), jnp.asarray(nb_idx),
                                  jnp.asarray(nb_w), jnp.asarray(sk),
                                  jnp.asarray(nk))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fixed_k_sum_and_grad(rng):
    ei, ew, x, sk, nk = _setup(rng)
    sampler = RandomNeighborSampler(ei, ew, rng=3)
    nb_idx, nb_w = sampler.sample_dense(k=4)
    fei, few = _flatten(nb_idx, nb_w)

    def loss_fixed(params):
        out = sum_graph_sage_fixed_k(jnp.asarray(x), jnp.asarray(nb_idx),
                                     jnp.asarray(nb_w), params["s"],
                                     params["n"])
        return jnp.sum(out ** 2)

    def loss_flat(params):
        out = sum_graph_sage(jnp.asarray(x), jnp.asarray(fei),
                             jnp.asarray(few), params["s"], params["n"])
        return jnp.sum(out ** 2)

    params = {"s": jnp.asarray(sk), "n": jnp.asarray(nk)}
    gf = jax.grad(loss_fixed)(params)
    gr = jax.grad(loss_flat)(params)
    np.testing.assert_allclose(np.asarray(gf["s"]), np.asarray(gr["s"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gf["n"]), np.asarray(gr["n"]),
                               rtol=2e-3, atol=2e-3)


def test_matmul_first_matches_gather_first(rng):
    """The linear-aggregator reorder (project then gather) is exact math;
    check the wide-input branch against the explicit gather-first compute."""
    ei, ew, x, sk, nk = _setup(rng, f_in=20, f_out=4)  # narrowing → reorders
    sampler = RandomNeighborSampler(ei, ew, rng=5)
    nb_idx, nb_w = sampler.sample_dense(k=5)
    out = mean_graph_sage_fixed_k(jnp.asarray(x), jnp.asarray(nb_idx),
                                  jnp.asarray(nb_w), jnp.asarray(sk),
                                  jnp.asarray(nk))
    g = x[np.clip(nb_idx, 0, x.shape[0] - 1)] * nb_w[..., None]  # [k, S, F]
    ref_nb = (g.mean(axis=0) @ nk)
    ref = np.concatenate([x @ sk, ref_nb], axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_sample_dense_virtual_subset(rng):
    """Restricted sampling: out-of-set neighbors become weight-0 self-slots."""
    ei, ew, x, sk, nk = _setup(rng)
    sampler = RandomNeighborSampler(ei, ew, rng=11)
    subset = np.array([0, 3, 7, 12, 21], np.int64)
    nb_idx, nb_w = sampler.sample_dense(k=8, sampled_node_index=subset)
    assert nb_idx.shape == (8, 5)
    assert nb_idx.max() < 5                      # reindexed into subset space
    dropped = nb_w == 0.0
    # weight-0 slots self-point (safe gather index), nonzero slots in-range
    np.testing.assert_array_equal(
        nb_idx[dropped], np.broadcast_to(np.arange(5), nb_idx.shape)[dropped])
    out = mean_graph_sage_fixed_k(jnp.asarray(x[subset]), jnp.asarray(nb_idx),
                                  jnp.asarray(nb_w), jnp.asarray(sk),
                                  jnp.asarray(nk))
    assert out.shape == (5, 10)
    assert np.isfinite(np.asarray(out)).all()
    # subset-mode semantics are ZERO-COUNTED (mean divides by k; dropped
    # out-of-set slots count as zeros) — NOT the flattened path's drop
    # semantics (which divides by the surviving count). Pin it to an oracle.
    g = x[subset][np.clip(nb_idx, 0, 4)] * nb_w[..., None]
    ref_nb = g.mean(axis=0) @ nk
    np.testing.assert_allclose(np.asarray(out[:, 5:]), ref_nb,
                               rtol=2e-4, atol=2e-4)


def test_isolated_nodes_zero_neighbor_term(rng):
    """Zero-degree sources: dense draw self-points with weight 0 → the
    neighbor half of the concat output must be exactly zero."""
    n = 10
    ei = np.array([[1, 2], [2, 1]], np.int32)    # nodes 0,3..9 isolated
    x = rng.normal(size=(n, 6)).astype(np.float32)
    sk = rng.normal(size=(6, 3)).astype(np.float32)
    nk = rng.normal(size=(6, 3)).astype(np.float32)
    sampler = RandomNeighborSampler(ei, rng=0)
    # sampler only knows nodes up to max id in ei → sample over subset
    nb_idx, nb_w = sampler.sample_dense(k=3)
    s = nb_idx.shape[1]
    out = mean_graph_sage_fixed_k(jnp.asarray(x[:s]), jnp.asarray(nb_idx),
                                  jnp.asarray(nb_w), jnp.asarray(sk),
                                  jnp.asarray(nk))
    np.testing.assert_allclose(np.asarray(out[0, 3:]), 0.0, atol=1e-6)
