"""Device-resident fixed-k neighbor sampling (nn/sampling/device_sampler.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from tf_geometric_tpu.nn import (DeviceNeighborSampler,
                                 mean_graph_sage_fixed_k)


def _graph(rng, n=30, e=200):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    ew = rng.uniform(0.5, 1.5, e).astype(np.float32)
    return ei, ew


def test_draws_are_real_neighbors(rng):
    ei, ew = _graph(rng)
    sampler = DeviceNeighborSampler(ei, ew)
    idx, w = sampler.sample(jax.random.PRNGKey(0), k=7)
    idx, w = np.asarray(idx), np.asarray(w)
    assert idx.shape == (7, 30) and w.shape == (7, 30)
    nbr = {i: set(ei[1][ei[0] == i]) for i in range(30)}
    ew_of = {}
    for r, c, wt in zip(ei[0], ei[1], ew):
        ew_of.setdefault((r, c), set()).add(np.float32(wt))
    for node in range(30):
        for slot in range(7):
            if nbr[node]:
                assert idx[slot, node] in nbr[node]
                assert any(np.isclose(w[slot, node], cand)
                           for cand in ew_of[(node, idx[slot, node])])
            else:  # isolated: self-slot, weight 0
                assert idx[slot, node] == node and w[slot, node] == 0.0


def test_unweighted_skips_weight_table(rng):
    ei, _ = _graph(rng)
    sampler = DeviceNeighborSampler(ei)  # ones → table elided
    assert sampler.sorted_weight is None
    idx, w = sampler.sample(jax.random.PRNGKey(1), k=3)
    deg = np.bincount(ei[0], minlength=30)
    np.testing.assert_array_equal(np.asarray(w),
                                  np.broadcast_to((deg > 0).astype(np.float32),
                                                  (3, 30)))


def test_deterministic_in_key_and_jittable(rng):
    ei, ew = _graph(rng)
    sampler = DeviceNeighborSampler(ei, ew)

    @jax.jit
    def draw(key, csr):
        return sampler.sample(key, k=5, csr=csr)

    csr = sampler.csr_pytree()
    i1, w1 = draw(jax.random.PRNGKey(42), csr)
    i2, w2 = draw(jax.random.PRNGKey(42), csr)
    i3, _ = draw(jax.random.PRNGKey(43), csr)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert (np.asarray(i1) != np.asarray(i3)).any()


def test_fused_sample_plus_sage_step(rng):
    """The whole point: sampling + aggregation + grad in ONE jit."""
    ei, ew = _graph(rng, n=24, e=120)
    x = rng.normal(size=(24, 9)).astype(np.float32)
    sk = rng.normal(size=(9, 4)).astype(np.float32)
    nk = rng.normal(size=(9, 4)).astype(np.float32)
    sampler = DeviceNeighborSampler(ei, ew)

    @jax.jit
    def step(key, params, xs, csr):
        def loss(p):
            idx, w = sampler.sample(key, k=6, csr=csr)
            h = mean_graph_sage_fixed_k(xs, idx, w, p["s"], p["n"])
            return jnp.sum(h ** 2)
        return jax.value_and_grad(loss)(params)

    params = {"s": jnp.asarray(sk), "n": jnp.asarray(nk)}
    val, grads = step(jax.random.PRNGKey(0), params, jnp.asarray(x),
                      sampler.csr_pytree())
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads.values())


def test_uniformity_over_neighbors(rng):
    """Each neighbor of a node should be drawn ~uniformly (with replacement)."""
    ei = np.array([[0] * 4, [1, 2, 3, 4]], np.int32)
    sampler = DeviceNeighborSampler(ei, num_nodes=5)
    counts = np.zeros(5)
    for seed in range(200):
        idx, _ = sampler.sample(jax.random.PRNGKey(seed), k=4)
        for v in np.asarray(idx)[:, 0]:
            counts[v] += 1
    freq = counts[1:5] / counts.sum()
    assert (np.abs(freq - 0.25) < 0.05).all()
