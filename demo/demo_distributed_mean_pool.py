"""Distributed graph classification (reference: demo/demo_distributed_mean_pool.py,
which shards the batch of graphs per replica via MirroredStrategy).

TPU-native version: data-parallel shard_map over the ``data`` mesh axis —
each device gets a slice of the padded batch (its own disjoint graphs),
computes local logits/loss, and gradients are psum-replicated.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from demo_utils import (demo_steps, load_graph_classification_data,
                        padded_batch_generator)
from tf_geometric_tpu.parallel.sharded import build_mesh

HIDDEN = 32


def main(num_steps=150):
    from sklearn.model_selection import train_test_split
    num_devices = len(jax.devices())
    per_device_graphs = 8
    batch_size = per_device_graphs * num_devices

    graphs, num_classes = load_graph_classification_data("NCI1")
    train_graphs, test_graphs = train_test_split(graphs, test_size=0.1,
                                                 random_state=0)
    mesh = build_mesh({"data": num_devices})

    # ONE padding spec over train ∪ test: eval reuses the training step's
    # per-device node capacity, so test batches must pad identically
    from demo_utils import batch_padding_spec
    shared_spec = batch_padding_spec(graphs, batch_size)
    gen = padded_batch_generator(train_graphs, batch_size, spec=shared_spec)
    batch, _ = next(gen)
    f = batch.x.shape[1]
    node_cap = batch.x.shape[0]
    nodes_per_dev = node_cap // num_devices

    rng = np.random.default_rng(0)
    params = {
        "w0": jnp.asarray(rng.normal(scale=0.1, size=(f, HIDDEN)), jnp.float32),
        "b0": jnp.zeros(HIDDEN),
        "wd": jnp.asarray(rng.normal(scale=0.1, size=(HIDDEN, num_classes)),
                          jnp.float32),
        "bd": jnp.zeros(num_classes),
    }
    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(params)

    def local_forward(p, x, rows, cols, vals, ngi):
        """One GCN-style mean aggregation + dense head, all device-local:
        the batch was re-blocked so each device's graphs are self-contained."""
        deg = jax.ops.segment_sum(vals, rows, num_segments=nodes_per_dev) + 1e-6
        msg = jnp.take(x, jnp.clip(cols, 0, nodes_per_dev - 1), axis=0) \
            * vals[:, None]
        agg = jax.ops.segment_sum(msg, rows, num_segments=nodes_per_dev)
        h = jax.nn.relu((agg / deg[:, None]) @ p["w0"] + p["b0"])
        cnt = jax.ops.segment_sum(jnp.ones((ngi.shape[0],), jnp.float32), ngi,
                                  num_segments=per_device_graphs)
        pooled = jax.ops.segment_sum(h, ngi, num_segments=per_device_graphs)
        pooled = pooled / jnp.maximum(cnt, 1.0)[:, None]
        return pooled @ p["wd"] + p["bd"]

    def local_step(p, s, x, rows, cols, vals, ngi, y, mask):
        def loss_fn(pp):
            logits = local_forward(pp, x, rows, cols, vals, ngi)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(y, 0, None))
            total = jax.lax.psum(jnp.sum(ce * mask), "data")
            count = jax.lax.psum(jnp.sum(mask), "data")
            return total / jnp.maximum(count, 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P("data"), P("data")),
        out_specs=(P(), P(), P())))

    def shard_batch(batch, real):
        """Re-block the padded batch so device d owns graphs
        [d·per_device, (d+1)·per_device) with LOCAL node/graph ids."""
        x = np.asarray(batch.x)
        ei = np.asarray(batch.edge_index)
        ew = np.asarray(batch.edge_weight)
        ngi = np.asarray(batch.node_graph_index)
        y_flat = np.asarray(batch.y).flatten()
        xs, rs, cs, vs, ngis, ys, ms = [], [], [], [], [], [], []
        edge_cap = ei.shape[1] // num_devices + 1
        edge_cap = -(-edge_cap // 64) * 64
        for d in range(num_devices):
            g_lo, g_hi = d * per_device_graphs, (d + 1) * per_device_graphs
            nmask = (ngi >= g_lo) & (ngi < g_hi)
            node_ids = np.nonzero(nmask)[0]
            lookup = np.full(len(ngi) + 1, -1, np.int64)
            lookup[node_ids] = np.arange(len(node_ids))
            xd = np.zeros((nodes_per_dev, x.shape[1]), np.float32)
            xd[:len(node_ids)] = x[node_ids]
            ngid = np.full(nodes_per_dev, per_device_graphs, np.int32)
            ngid[:len(node_ids)] = ngi[node_ids] - g_lo
            emask = nmask[np.clip(ei[0], 0, len(ngi) - 1)] \
                & (ei[0] < len(ngi)) & nmask[np.clip(ei[1], 0, len(ngi) - 1)]
            er = lookup[ei[0][emask]]
            ec = lookup[ei[1][emask]]
            ev = ew[emask]
            rd = np.full(edge_cap, nodes_per_dev, np.int32)
            cd = np.zeros(edge_cap, np.int32)
            vd = np.zeros(edge_cap, np.float32)
            k = min(len(er), edge_cap)
            rd[:k], cd[:k], vd[:k] = er[:k], ec[:k], ev[:k]
            yd = np.zeros(per_device_graphs, np.int32)
            md = np.zeros(per_device_graphs, np.float32)
            n_real = min(max(real - g_lo, 0), per_device_graphs)
            yd[:n_real] = y_flat[g_lo:g_lo + n_real]
            md[:n_real] = 1.0
            xs.append(xd); rs.append(rd); cs.append(cd); vs.append(vd)
            ngis.append(ngid); ys.append(yd); ms.append(md)
        return (jnp.asarray(np.concatenate(xs)), jnp.asarray(np.concatenate(rs)),
                jnp.asarray(np.concatenate(cs)), jnp.asarray(np.concatenate(vs)),
                jnp.asarray(np.concatenate(ngis)), jnp.asarray(np.concatenate(ys)),
                jnp.asarray(np.concatenate(ms)))

    with mesh:
        for s in range(demo_steps(num_steps)):
            batch, real = next(gen)
            args = shard_batch(batch, real)
            params, opt_state, loss = step(params, opt_state, *args)
            if s % 30 == 0:
                print(f"step {s}: loss={float(loss):.4f}")

        correct = total = 0

        # eval forward compiled ONCE (defining it inside the loop would
        # recompile per batch)
        @jax.jit
        @lambda f_: shard_map(f_, mesh=mesh,
                              in_specs=(P(), P("data"), P("data"), P("data"),
                                        P("data"), P("data")),
                              out_specs=P("data"))
        def fwd(p, x, rows, cols, vals, ngi):
            return local_forward(p, x, rows, cols, vals, ngi)

        for batch, real in padded_batch_generator(test_graphs, batch_size,
                                                  shuffle=False, infinite=False,
                                                  spec=shared_spec):
            args = shard_batch(batch, real)
            logits = fwd(params, args[0], args[1], args[2], args[3], args[4])
            preds = np.asarray(jnp.argmax(logits, -1))
            mask = np.asarray(args[6]) > 0
            labels = np.asarray(args[5])
            correct += (preds[mask] == labels[mask]).sum()
            total += mask.sum()
    acc = correct / max(total, 1)
    print(f"test accuracy ({num_devices}-way data-parallel): {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
