"""Sharded neighbor-sampled GraphSAGE (parallel/sampled_sage.py) on the
8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from tf_geometric_tpu.parallel import (build_csr_shards, build_mesh,
                                       make_sampled_sage_step)

N, P_DEV = 64, 8


def _ring_graph(n):
    """Every node has EXACTLY one neighbor (i → i+1): any with-replacement
    draw returns it, so the sampled mean equals the exact mean and the
    sharded step can be checked against a dense numpy oracle."""
    rows = np.arange(n, dtype=np.int64)
    cols = (rows + 1) % n
    return np.stack([rows, cols]).astype(np.int32)


def test_build_csr_shards_layout(rng):
    ei = np.stack([rng.integers(0, N, 300), rng.integers(0, N, 300)]).astype(np.int32)
    shards = build_csr_shards(ei, N, P_DEV)
    n_local = N // P_DEV
    deg = np.bincount(ei[0], minlength=N)
    got_deg = np.asarray(shards["degree"]).reshape(-1)
    np.testing.assert_array_equal(got_deg, deg)
    # row_start offsets are local to the device's column shard
    for p in range(P_DEV):
        rs = np.asarray(shards["row_start"][p])
        dg = np.asarray(shards["degree"][p])
        np.testing.assert_array_equal(rs, np.concatenate([[0], np.cumsum(dg)[:-1]]))
        cols_p = np.asarray(shards["sorted_col"][p])
        for i in range(n_local):
            g = p * n_local + i
            expect = np.sort(ei[1][ei[0] == g])
            np.testing.assert_array_equal(np.sort(cols_p[rs[i]:rs[i] + dg[i]]),
                                          expect)


def test_sampled_sage_step_matches_dense_oracle_on_ring():
    ei = _ring_graph(N)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, 12)).astype(np.float32)
    y = rng.integers(0, 5, N).astype(np.int32)
    mask = np.ones(N, np.float32)

    mesh = build_mesh({"graph": P_DEV})
    shards = build_csr_shards(ei, N, P_DEV)
    step, init_params, _ = make_sampled_sage_step(
        mesh, shards, num_features=12, num_classes=5, k=(3, 2), hidden=8)
    params = init_params(np.random.default_rng(1))
    import optax
    opt_state = optax.adam(1e-2).init(params)

    new_p, new_s, loss = step(params, opt_state, jax.random.PRNGKey(0),
                              jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(mask))

    # dense numpy oracle: neighbor term is exactly x[(i+1) % N]
    def layer(h, p):
        nb = np.roll(h, -1, axis=0)
        out = np.concatenate([h @ np.asarray(p["self"]),
                              nb @ np.asarray(p["nb"])], axis=1) \
            + np.asarray(p["bias"])
        return np.maximum(out, 0.0)

    h = layer(layer(x, params[0]), params[1])
    logits = h @ np.asarray(params[-1]["w"]) + np.asarray(params[-1]["b"])
    z = logits - logits.max(axis=1, keepdims=True)
    ce = -z[np.arange(N), y] + np.log(np.exp(z).sum(axis=1))
    np.testing.assert_allclose(float(loss), ce.mean(), rtol=1e-4, atol=1e-4)
    # params updated and replicated-consistent
    assert not np.allclose(np.asarray(new_p[0]["self"]),
                           np.asarray(params[0]["self"]))
    assert np.isfinite(np.asarray(new_p[0]["self"])).all()


def test_sampled_sage_trains_on_random_graph(rng):
    ei = np.stack([rng.integers(0, N, 500), rng.integers(0, N, 500)]).astype(np.int32)
    ew = rng.uniform(0.5, 1.5, 500).astype(np.float32)
    x = rng.normal(size=(N, 10)).astype(np.float32)
    y = rng.integers(0, 4, N).astype(np.int32)
    mask = (rng.random(N) < 0.7).astype(np.float32)

    mesh = build_mesh({"graph": P_DEV})
    shards = build_csr_shards(ei, N, P_DEV, edge_weight=ew)
    assert "sorted_weight" in shards
    step, init_params, optimizer = make_sampled_sage_step(
        mesh, shards, num_features=10, num_classes=4, k=(4, 3), hidden=8)
    params = init_params(np.random.default_rng(2))
    opt_state = optimizer.init(params)

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i), jnp.asarray(x),
                                       jnp.asarray(y), jnp.asarray(mask))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])  # it learns


def test_indivisible_nodes_raise():
    ei = _ring_graph(10)
    try:
        build_csr_shards(ei, 10, 8)
    except ValueError as e:
        assert "divisible" in str(e) or "pad" in str(e)
    else:
        raise AssertionError("expected ValueError")
