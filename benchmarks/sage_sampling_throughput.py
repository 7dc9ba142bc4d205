"""GraphSAGE + fixed-k neighbor sampling throughput at Reddit scale
(BASELINE.json config 3). Host-side sampling (RandomNeighborSampler,
padding=True → static shapes, single jit compile) + device training step;
reports nodes/s and edges/s including the sampling cost."""
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
    from tf_geometric_tpu.nn import mean_graph_sage
    from tf_geometric_tpu.utils.graph_utils import RandomNeighborSampler

    # reddit-shaped synthetic graph (dense features, heavy edges)
    rng = np.random.default_rng(0)
    print("building graph + sampler...", flush=True)
    edge_index = np.stack([
        rng.integers(0, num_nodes, num_edges),
        rng.integers(0, num_nodes, num_edges)]).astype(np.int32)
    x = rng.normal(size=(num_nodes, num_features)).astype(np.float32)
    y = rng.integers(0, num_classes, num_nodes).astype(np.int32)
    t0 = time.time()
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

    def loss_fn(p, e0, w0, e1, w1):
        h = mean_graph_sage(xs, e0, w0, p["s0"], p["n0"], activation=jax.nn.relu)
        h = mean_graph_sage(h, e1, w1, p["s1"], p["n1"], activation=jax.nn.relu)
        return optax.softmax_cross_entropy_with_integer_labels(
            h @ p["wd"], ys).mean()

    @jax.jit
    def step(p, s, e0, w0, e1, w1):
        loss, grads = jax.value_and_grad(loss_fn)(p, e0, w0, e1, w1)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def sample():
        e0, w0 = sampler.sample(k=NUM_SAMPLED[0], padding=True)
        e1, w1 = sampler.sample(k=NUM_SAMPLED[1], padding=True)
        return (jnp.asarray(e0), jnp.asarray(w0),
                jnp.asarray(e1), jnp.asarray(w1))

    args = sample()
    params, opt_state, loss = step(params, opt_state, *args)
    _ = np.asarray(loss)

    t = time.time()
    sample_time = 0.0
    for _ in range(steps):
        t0 = time.time()
        args = sample()
        sample_time += time.time() - t0
        params, opt_state, loss = step(params, opt_state, *args)
    _ = np.asarray(loss)
    elapsed = (time.time() - t) / steps
    edges_per_step = sum(num_nodes * k for k in NUM_SAMPLED)
    print(f"step {elapsed*1000:.1f} ms (sampling {sample_time/steps*1000:.1f} ms)  "
          f"{num_nodes/elapsed/1e6:.2f} M nodes/s  "
          f"{edges_per_step/elapsed/1e6:.1f} M sampled-edges/s")


if __name__ == "__main__":
    # default size is Reddit; shrink with env for CI/CPU smoke
    scale = float(os.environ.get("SAGE_BENCH_SCALE", "1.0"))
    main(num_nodes=int(232_965 * scale), num_edges=int(11_606_919 * scale),
         num_features=602 if scale >= 1 else 64)
