"""Heterogeneous-graph node classification (R-GCN-style) over a HeteroGraph.

The reference ships hetero containers + datasets (HGB, NARS ACM) but no
hetero layers; this demo shows the TPU-native building blocks compose into a
relational GCN: per edge-type message passing (one SpMM per relation) with
per-type projections, summed into the destination type's representation.
Uses NARS ACM when available, else a synthetic academic-shaped HeteroGraph.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from demo_utils import demo_steps
from tf_geometric_tpu.data.graph import HeteroGraph
from tf_geometric_tpu.nn.kernel.segment import segment_mean


def load_data():
    try:
        from tf_geometric_tpu.datasets import NARSACMDataset
        return NARSACMDataset().load_data()
    except Exception:
        print("NARS ACM unavailable — synthesizing academic HeteroGraph")
        rng = np.random.default_rng(0)
        n_paper, n_author, n_field = 600, 300, 30
        y = rng.integers(0, 3, n_paper)
        # papers cite within their class-cluster of fields
        pf_f = (y * 10 + rng.integers(0, 10, n_paper)).astype(np.int64)
        pf = np.stack([np.arange(n_paper), pf_f])
        pa = np.stack([rng.integers(0, n_paper, 1200),
                       rng.integers(0, n_author, 1200)]).astype(np.int64)
        x_paper = np.eye(3)[y] + rng.normal(scale=1.0, size=(n_paper, 3))
        hg = HeteroGraph(
            x_dict={"paper": x_paper.astype(np.float32),
                    "author": np.zeros((n_author, 1), np.float32),
                    "field": np.zeros((n_field, 1), np.float32)},
            edge_index_dict={("paper", "pa", "author"): pa,
                             ("paper", "pf", "field"): pf},
            y_dict={"paper": y.astype(np.int64)},
        )
        n = n_paper
        idx = rng.permutation(n)
        return hg, "paper", (idx[:n // 5], idx[n // 5:n // 3], idx[n // 3:])


def hetero_gcn_layer(params, h_dict, edge_index_dict, num_nodes_dict, prefix):
    """One relational layer: mean-aggregate along each relation (and its
    reverse), project per relation, sum into the destination type."""
    out = {t: h_dict[t] @ params[f"{prefix}_self_{t}"] for t in h_dict}
    for (src, rel, dst), ei in edge_index_dict.items():
        # edges src→dst: messages flow into dst (rows = dst side = ei[1])
        msg = segment_mean(
            jnp.take(h_dict[src], jnp.clip(ei[0], 0, num_nodes_dict[src] - 1),
                     axis=0),
            jnp.asarray(ei[1]), num_nodes_dict[dst])
        out[dst] = out[dst] + msg @ params[f"{prefix}_rel_{rel}"]
        # reverse direction src←dst
        rmsg = segment_mean(
            jnp.take(h_dict[dst], jnp.clip(ei[1], 0, num_nodes_dict[dst] - 1),
                     axis=0),
            jnp.asarray(ei[0]), num_nodes_dict[src])
        out[src] = out[src] + rmsg @ params[f"{prefix}_rev_{rel}"]
    return {t: jax.nn.relu(v) for t, v in out.items()}


def main(num_steps=200):
    hg, target, (train_index, valid_index, test_index) = load_data()
    num_nodes = {t: hg.num_nodes_of(t) for t in hg.node_types}
    num_classes = int(np.max(hg.y_dict[target])) + 1
    HID = 32

    rng = np.random.default_rng(0)
    params = {}
    dims = {t: hg.x_dict[t].shape[1] for t in hg.node_types}
    for t in hg.node_types:
        params[f"l0_self_{t}"] = jnp.asarray(
            rng.normal(scale=0.2, size=(dims[t], HID)), jnp.float32)
        params[f"l1_self_{t}"] = jnp.asarray(
            rng.normal(scale=0.2, size=(HID, HID)), jnp.float32)
    for (src, rel, dst) in hg.edge_types:
        params[f"l0_rel_{rel}"] = jnp.asarray(
            rng.normal(scale=0.2, size=(dims[src], HID)), jnp.float32)
        params[f"l0_rev_{rel}"] = jnp.asarray(
            rng.normal(scale=0.2, size=(dims[dst], HID)), jnp.float32)
        params[f"l1_rel_{rel}"] = jnp.asarray(
            rng.normal(scale=0.2, size=(HID, HID)), jnp.float32)
        params[f"l1_rev_{rel}"] = jnp.asarray(
            rng.normal(scale=0.2, size=(HID, HID)), jnp.float32)
    params["head"] = jnp.asarray(
        rng.normal(scale=0.2, size=(HID, num_classes)), jnp.float32)

    x_dict = {t: jnp.asarray(np.asarray(hg.x_dict[t], np.float32))
              for t in hg.node_types}
    ei_dict = {t: np.asarray(v, np.int64) for t, v in hg.edge_index_dict.items()}
    y = jnp.asarray(hg.y_dict[target].astype(np.int32))
    tr = jnp.asarray(np.asarray(train_index, np.int32))
    te = jnp.asarray(np.asarray(test_index, np.int32))

    def forward(p):
        h = hetero_gcn_layer(p, x_dict, ei_dict, num_nodes, "l0")
        h = hetero_gcn_layer(p, h, ei_dict, num_nodes, "l1")
        return h[target] @ p["head"]

    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            logits = forward(pp)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[tr], y[tr]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    num_steps = demo_steps(num_steps)
    for i in range(num_steps):
        params, opt_state, loss = step(params, opt_state)
        if i % 50 == 0:
            print(f"step {i}: loss={float(loss):.4f}")

    preds = jnp.argmax(forward(params), -1)
    acc = float(jnp.mean((preds[te] == y[te]).astype(jnp.float32)))
    print(f"test accuracy ({target}): {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
