"""Shared scaffolding for the demo scripts: Cora loading (real files or
synthetic fallback), the masked-CE + L2 objective, and a generic Adam
training loop mirroring the reference demos' structure (demo_gcn.py:50-97).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tf_geometric_tpu.layers.base import l2_loss


def demo_steps(n: int) -> int:
    """Loop-length cap for CI smoke runs: with ``TFG_DEMO_SMOKE_STEPS=k`` set,
    every demo training loop runs at most k steps (tests/test_demo_smoke.py);
    unset, the demos train to convergence as the reference demos do."""
    cap = int(os.environ.get("TFG_DEMO_SMOKE_STEPS", "0"))
    return min(n, cap) if cap > 0 else n


def load_planetoid(name: str = "cora"):
    """Load a Planetoid dataset (cora/citeseer/pubmed), real files or the
    synthetic same-shape fallback. Honors the benchmark scripts'
    ``BENCH_DATASET`` selection (reference run_multi_times.sh passes the
    dataset per run)."""
    from tf_geometric_tpu.datasets import planetoid
    from tf_geometric_tpu.datasets.synthetic_citation import (
        FakePlanetoidDataset, HardCitationDataset)
    if os.environ.get("TFG_HARD_PROTOCOL") == "1":
        # hard-mode benchmark protocol (head_to_head_hard.py): tuned so the
        # executed reference GCN lands ~0.75-0.85 — NON-saturated accuracy
        seed = int(os.environ.get("TFG_HARD_SEED", "0"))
        data = HardCitationDataset(name, seed=seed).load_data()
        graph, splits = data
        graph.convert_data_to_tensor()
        return graph, tuple(jnp.asarray(np.asarray(s, np.int32))
                            for s in splits)
    cls = {"cora": planetoid.CoraDataset,
           "citeseer": planetoid.CiteseerDataset,
           "pubmed": planetoid.PubmedDataset}[name]
    try:
        data = cls().load_data()
    except Exception:
        print(f"real {name} unavailable — using synthetic {name}-shaped graph")
        data = FakePlanetoidDataset(name).load_data()
    graph, splits = data
    graph.convert_data_to_tensor()
    return graph, tuple(jnp.asarray(np.asarray(s, np.int32)) for s in splits)


def load_cora():
    return load_planetoid(os.environ.get("BENCH_DATASET", "cora"))


def masked_softmax_loss(params, logits, y, mask_index, l2_coef=5e-4):
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits[mask_index], y[mask_index]).mean()
    return ce + l2_loss(params, l2_coef)


def train_node_classifier(forward, params, y, splits, num_steps=200,
                          learning_rate=1e-2, l2_coef=5e-4, log_every=20,
                          patience=None, seed=0, eval_every=1):
    """Generic loop: ``forward(params, training, key) -> logits``.

    With ``patience`` set, runs the reference's exact early-stop rule
    (bench_node_cls_early_stop_gcn.py:121-156): the patience counter resets
    when val accuracy improves OR val loss drops; the test accuracy is
    recorded only at steps where val accuracy improves AND val loss drops.
    Matching the rule matters on non-saturated (hard-mode) benchmarks where
    the stopping point visibly moves the reported number.

    ``seed`` drives the per-step dropout key stream. Multi-seed sweeps MUST
    pass their training seed here: the reference reseeds TF's global RNG per
    run, so its dropout noise is independent across seeds — a fixed stream
    makes "20 seeds" 20 runs conditioned on ONE noise draw, which both
    understates the variance and can sit a full sequence-level sigma off the
    marginal mean (this biased ssgc_pubmed hard-mode by ~-0.03).
    """
    num_steps = demo_steps(num_steps)
    train_index, valid_index, test_index = splits
    # TFG_ADAM_EPS: the reference trains with tf.keras Adam (eps 1e-7);
    # optax defaults to 1e-8. The knob exists to TEST whether that
    # epsilon gap explains the small negative drift clustered on the
    # k-power-series models (sgc/ssgc citeseer/pubmed hard cells, each
    # ~-0.03) — see benchmarks/node_classification/README.md
    optimizer = optax.adam(learning_rate,
                           eps=float(os.environ.get("TFG_ADAM_EPS", "1e-8")))
    opt_state = optimizer.init(params)
    # fold_in decorrelates the dropout stream from the init key (bench
    # scripts init params from PRNGKey(seed) too)
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)

    @jax.jit
    def train_step(params, opt_state, step_key):
        def loss_fn(p):
            logits = forward(p, True, step_key)
            return masked_softmax_loss(p, logits, y, train_index, l2_coef)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params):
        logits = forward(params, False, None)
        preds = jnp.argmax(logits, axis=-1)
        accs = tuple(jnp.mean((preds[idx] == y[idx]).astype(jnp.float32))
                     for idx in (train_index, valid_index, test_index))
        valid_loss = optax.softmax_cross_entropy_with_integer_labels(
            logits[valid_index], y[valid_index]).mean()
        return accs + (valid_loss,)

    # the reference's dual-criterion early stop (gcn.py:121-156): reset
    # patience on acc-OR-loss improvement, record test on acc-AND-loss
    best_valid, min_val_loss = 0.0, 1000.0
    best_test, bad_steps = 0.0, 0
    for step in range(num_steps):
        key, subkey = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, subkey)
        # eval_every > 1: the arxiv-scale shared protocol's thinned eval
        # cadence (identical on the reference side — head_to_head.py)
        do_eval = (patience is not None
                   and (step + 1) % eval_every == 0) or \
            (patience is not None and step == num_steps - 1)
        if do_eval or step % log_every == 0:
            train_acc, valid_acc, test_acc, valid_loss = (
                float(a) for a in accuracy(params))
            if step % log_every == 0:
                print(f"step {step}: loss={float(loss):.4f} "
                      f"train={train_acc:.4f} valid={valid_acc:.4f} "
                      f"test={test_acc:.4f}")
            # best-val tracking only on the shared eval cadence (a
            # log-print eval must not add tracking points the reference
            # side doesn't see)
            if patience is not None and do_eval:
                if valid_acc > best_valid or valid_loss < min_val_loss:
                    bad_steps = 0
                else:
                    bad_steps += 1
                    if bad_steps > patience:
                        print(f"early stop at step {step}")
                        break
                if valid_acc > best_valid and valid_loss < min_val_loss:
                    best_test = test_acc
                    best_valid, min_val_loss = valid_acc, valid_loss
    if patience is not None:
        print(f"best valid={best_valid:.4f} test@best={best_test:.4f}")
        return best_test
    return float(accuracy(params)[2])


# ---------------------------------------------------------------------------
# Graph-classification scaffolding (TU datasets with synthetic fallback)
# ---------------------------------------------------------------------------

def load_graph_classification_data(name="NCI1", num_fallback_graphs=600, seed=0):
    """TU graphs as (graphs: List[Graph], num_classes). Falls back to a
    synthetic set of degree-distinguishable random graphs offline. With
    ``TFG_HARD_GRAPH_CLS=1`` returns the hard-mode structural set instead
    (benchmarks/graph_classification/head_to_head_graph.py)."""
    from tf_geometric_tpu.data.graph import Graph
    if os.environ.get("TFG_HARD_GRAPH_CLS") == "1":
        from tf_geometric_tpu.datasets.synthetic_citation import \
            synthetic_graph_classification_hard
        return synthetic_graph_classification_hard(
            num_graphs=num_fallback_graphs,
            seed=int(os.environ.get("TFG_HARD_SEED", "0")))
    try:
        from tf_geometric_tpu.datasets import TUDataset
        graph_dicts = TUDataset(name).load_data()
        num_node_labels = int(max(np.max(g["node_labels"]) for g in graph_dicts)) + 1
        graphs = []
        for gd in graph_dicts:
            x = np.zeros([gd["num_nodes"], num_node_labels], np.float32)
            x[range(gd["num_nodes"]), gd["node_labels"]] = 1.0
            graphs.append(Graph(x=x, edge_index=gd["edge_index"],
                                y=gd["graph_label"]))
        num_classes = int(max(int(g.y[0]) for g in graphs)) + 1
        return graphs, num_classes
    except Exception:
        print(f"TU dataset {name} unavailable — using synthetic graphs")
        rng = np.random.default_rng(seed)
        graphs = []
        for _ in range(num_fallback_graphs):
            label = int(rng.integers(0, 2))
            n = int(rng.integers(10, 20))
            # class 0: sparse ring-ish; class 1: dense random
            num_edges = n * (2 if label == 0 else 5)
            ei = rng.integers(0, n, size=(2, num_edges)).astype(np.int32)
            x = np.eye(4, dtype=np.float32)[rng.integers(0, 4, n)]
            graphs.append(Graph(x=x, edge_index=ei, y=[label]))
        return graphs, 2


def batch_padding_spec(graphs, batch_size, node_multiple=128, edge_multiple=128):
    """Fixed batch capacities covering any ``batch_size`` graphs from
    ``graphs``. Compute ONE spec over train ∪ test so every consumer of the
    padded batches (e.g. per-device sharding) sees identical shapes."""
    from tf_geometric_tpu.data.padding import PaddingSpec, bucket_size
    max_nodes = max(g.num_nodes for g in graphs)
    max_edges = max(g.num_edges for g in graphs)
    return PaddingSpec(bucket_size(max_nodes * batch_size, node_multiple),
                       bucket_size(max_edges * batch_size, edge_multiple),
                       batch_size)


def padded_batch_generator(graphs, batch_size, shuffle=True, infinite=True,
                           seed=0, node_multiple=128, edge_multiple=128,
                           spec=None):
    """Yield BatchGraphs padded to fixed capacities so jit compiles once."""
    from tf_geometric_tpu.data.graph import BatchGraph
    from tf_geometric_tpu.data.padding import pad_batch_graph
    rng = np.random.default_rng(seed)
    if infinite and len(graphs) < batch_size:
        raise ValueError(
            f"padded_batch_generator: {len(graphs)} graphs < batch_size "
            f"{batch_size} — every chunk would be dropped (infinite hang)")
    if spec is None:
        spec = batch_padding_spec(graphs, batch_size, node_multiple,
                                  edge_multiple)
    while True:
        order = rng.permutation(len(graphs)) if shuffle else np.arange(len(graphs))
        for start in range(0, len(order), batch_size):
            chunk = [graphs[i] for i in order[start:start + batch_size]]
            if len(chunk) < batch_size and infinite:
                continue
            batch = BatchGraph.from_graphs(chunk)
            yield pad_batch_graph(batch, spec), len(chunk)
        if not infinite:
            break


def run_graph_classification(make_model, batch_size=32, num_steps=300,
                             learning_rate=5e-3, dataset="NCI1", seed=0,
                             extra_loss_from_state=None, split=None):
    """Generic padded-batch graph-classification loop.

    ``make_model(num_classes, num_graphs) -> flax module`` whose __call__ is
    ``(x, edge_index, edge_weight, node_graph_index, training=...) -> logits``.
    ``extra_loss_from_state(state) -> scalar`` pulls auxiliary losses sown
    into the "losses" collection (MinCutPool). ``split`` = pre-defined
    ``(train_graphs, test_graphs)`` (official dataset splits — e.g.
    ModelNet — must NOT be re-split randomly); default: random 90/10.
    """
    num_steps = demo_steps(num_steps)
    graphs, num_classes = load_graph_classification_data(dataset, seed=seed)
    if split is not None:
        train_graphs, test_graphs = split
    else:
        from sklearn.model_selection import train_test_split
        train_graphs, test_graphs = train_test_split(graphs, test_size=0.1,
                                                     random_state=0)
    model = make_model(num_classes, batch_size)
    gen = padded_batch_generator(train_graphs, batch_size, seed=seed)
    batch, _ = next(gen)
    key = jax.random.PRNGKey(seed)

    def to_args(batch):
        return (jnp.asarray(batch.x), jnp.asarray(batch.edge_index),
                jnp.asarray(batch.edge_weight),
                jnp.asarray(batch.node_graph_index))

    mutable = ["losses"] if extra_loss_from_state else False
    variables = model.init({"params": key, "dropout": key}, *to_args(batch))
    params = variables["params"]
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, args, y, valid_mask, step_key):
        def loss_fn(p):
            if mutable:
                logits, state = model.apply({"params": p}, *args, training=True,
                                            rngs={"dropout": step_key},
                                            mutable=mutable)
            else:
                logits = model.apply({"params": p}, *args, training=True,
                                     rngs={"dropout": step_key})
                state = None
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(y, 0, None))
            loss = jnp.sum(ce * valid_mask) / jnp.maximum(valid_mask.sum(), 1.0)
            if state is not None:
                loss = loss + extra_loss_from_state(state)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, args):
        out = model.apply({"params": params}, *args,
                          mutable=mutable) if mutable else \
            model.apply({"params": params}, *args)
        logits = out[0] if mutable else out
        return jnp.argmax(logits, axis=-1)

    def batch_labels(batch, real):
        y = np.zeros(batch_size, np.int32)
        y[:real] = np.asarray(batch.y).flatten()[:real]
        mask = np.zeros(batch_size, np.float32)
        mask[:real] = 1.0
        return jnp.asarray(y), jnp.asarray(mask)

    for step in range(num_steps):
        batch, real = next(gen)
        y, mask = batch_labels(batch, real)
        key, subkey = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, to_args(batch),
                                             y, mask, subkey)
        if step % 50 == 0:
            print(f"step {step}: loss={float(loss):.4f}")

    correct = total = 0
    for batch, real in padded_batch_generator(test_graphs, batch_size,
                                              shuffle=False, infinite=False):
        preds = np.asarray(predict(params, to_args(batch)))[:real]
        labels = np.asarray(batch.y).flatten()[:real]
        correct += (preds == labels).sum()
        total += real
    acc = correct / max(total, 1)
    print(f"test accuracy: {acc:.4f}")
    return acc
