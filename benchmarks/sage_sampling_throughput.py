"""GraphSAGE + fixed-k neighbor sampling throughput at Reddit scale
(BASELINE.json config 3), in three sampling modes (SAGE_BENCH_MODE):

- ``device`` (default): DeviceNeighborSampler — the CSR lives on-device and
  the draw jits INTO the training step. Zero per-step host work or transfer.
- ``dense``: host ``sample_dense`` (slot-major [k, S]) + the same
  scatter-free ``mean_graph_sage_fixed_k`` step; pays sampling + ~65 MB
  tunnel transfer per step.
- ``flat``: host flattened COO edge list + generic segment-op
  ``mean_graph_sage`` — the naive-port baseline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NUM_SAMPLED = [25, 10]
HIDDEN = 256


def main(num_nodes=232_965, num_edges=11_606_919, num_features=602,
         num_classes=41, steps=6):
    import jax
    import jax.numpy as jnp
    import optax
    from tf_geometric_tpu.nn import (DeviceNeighborSampler, mean_graph_sage,
                                     mean_graph_sage_fixed_k)
    from tf_geometric_tpu.utils.graph_utils import RandomNeighborSampler

    mode = os.environ.get("SAGE_BENCH_MODE", "device")
    if os.environ.get("SAGE_BENCH_FLAT") == "1":  # back-compat
        mode = "flat"

    # reddit-shaped synthetic graph (dense features, heavy edges)
    rng = np.random.default_rng(0)
    print(f"mode={mode}  building graph + sampler...", flush=True)
    edge_index = np.stack([
        rng.integers(0, num_nodes, num_edges),
        rng.integers(0, num_nodes, num_edges)]).astype(np.int32)
    x = rng.normal(size=(num_nodes, num_features)).astype(np.float32)
    y = rng.integers(0, num_classes, num_nodes).astype(np.int32)
    t0 = time.time()
    if mode == "device":
        sampler = DeviceNeighborSampler(edge_index, num_nodes=num_nodes)
        csr = sampler.csr_pytree()
    else:
        sampler = RandomNeighborSampler(edge_index, rng=0)
    print(f"sampler built in {time.time() - t0:.1f}s", flush=True)

    xs = jnp.asarray(x)
    ys = jnp.asarray(y)
    params = {
        "s0": jnp.asarray(rng.normal(scale=0.05, size=(num_features, HIDDEN // 2)), jnp.float32),
        "n0": jnp.asarray(rng.normal(scale=0.05, size=(num_features, HIDDEN // 2)), jnp.float32),
        "s1": jnp.asarray(rng.normal(scale=0.05, size=(HIDDEN, HIDDEN // 2)), jnp.float32),
        "n1": jnp.asarray(rng.normal(scale=0.05, size=(HIDDEN, HIDDEN // 2)), jnp.float32),
        "wd": jnp.asarray(rng.normal(scale=0.05, size=(HIDDEN, num_classes)), jnp.float32),
    }
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    # xs/ys (and the CSR in device mode) ride as jit ARGUMENTS: at Reddit
    # scale the [233k, 602] feature matrix inlined as a literal exceeds the
    # remote-compile payload limit (HTTP 413) -- docs/performance.md.
    sage = mean_graph_sage if mode == "flat" else mean_graph_sage_fixed_k

    if mode == "device":
        def loss_fn(p, key, xs_, ys_, csr_):
            k0, k1 = jax.random.split(key)
            e0, w0 = sampler.sample(k0, NUM_SAMPLED[0], csr=csr_)
            e1, w1 = sampler.sample(k1, NUM_SAMPLED[1], csr=csr_)
            h = sage(xs_, e0, w0, p["s0"], p["n0"], activation=jax.nn.relu)
            h = sage(h, e1, w1, p["s1"], p["n1"], activation=jax.nn.relu)
            return optax.softmax_cross_entropy_with_integer_labels(
                h @ p["wd"], ys_).mean()

        @jax.jit
        def step_impl(p, s, key, xs_, ys_, csr_):
            loss, grads = jax.value_and_grad(loss_fn)(p, key, xs_, ys_, csr_)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        keys = jax.random.split(jax.random.PRNGKey(0), steps + 3)

        def run_step(i, p, s):
            return step_impl(p, s, keys[i], xs, ys, csr), 0.0
    else:
        def loss_fn(p, xs_, ys_, e0, w0, e1, w1):
            h = sage(xs_, e0, w0, p["s0"], p["n0"], activation=jax.nn.relu)
            h = sage(h, e1, w1, p["s1"], p["n1"], activation=jax.nn.relu)
            return optax.softmax_cross_entropy_with_integer_labels(
                h @ p["wd"], ys_).mean()

        @jax.jit
        def step_impl(p, s, xs_, ys_, e0, w0, e1, w1):
            loss, grads = jax.value_and_grad(loss_fn)(p, xs_, ys_, e0, w0, e1, w1)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        def sample():
            if mode == "flat":
                e0, w0 = sampler.sample(k=NUM_SAMPLED[0], padding=True)
                e1, w1 = sampler.sample(k=NUM_SAMPLED[1], padding=True)
            else:
                e0, w0 = sampler.sample_dense(k=NUM_SAMPLED[0])
                e1, w1 = sampler.sample_dense(k=NUM_SAMPLED[1])
            return (jnp.asarray(e0), jnp.asarray(w0),
                    jnp.asarray(e1), jnp.asarray(w1))

        def run_step(i, p, s):
            t0 = time.time()
            args = sample()
            dt = time.time() - t0
            return step_impl(p, s, xs, ys, *args), dt

    (params, opt_state, loss), _ = run_step(0, params, opt_state)
    _ = np.asarray(loss)

    t = time.time()
    sample_time = 0.0
    for i in range(steps):
        (params, opt_state, loss), dt = run_step(i + 1, params, opt_state)
        sample_time += dt
    _ = np.asarray(loss)
    elapsed = (time.time() - t) / steps
    edges_per_step = sum(num_nodes * k for k in NUM_SAMPLED)
    print(f"step {elapsed*1000:.1f} ms (host sampling {sample_time/steps*1000:.1f} ms)  "
          f"{num_nodes/elapsed/1e6:.2f} M nodes/s  "
          f"{edges_per_step/elapsed/1e6:.1f} M sampled-edges/s")


if __name__ == "__main__":
    # default size is Reddit; shrink with env for CI/CPU smoke
    scale = float(os.environ.get("SAGE_BENCH_SCALE", "1.0"))
    main(num_nodes=int(232_965 * scale), num_edges=int(11_606_919 * scale),
         num_features=602 if scale >= 1 else 64)
