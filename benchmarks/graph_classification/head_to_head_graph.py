"""Graph-classification head-to-head: executed reference vs repo (hard mode).

Extends the parity evidence beyond node classification (VERDICT r3 #6): the
reference's MeanPool and GIN pipelines (demo/demo_mean_pool.py,
demo/demo_gin.py) are EXECUTED under TF via the tf_sparse shim on the same
hard-mode structural graph set the repo trains on
(datasets/synthetic_citation.synthetic_graph_classification_hard — label
carried by topology only, tuned non-saturated), and the repo's mirror models
(demo/demo_mean_pool.py, demo/demo_gin.py here) train under the identical
shared protocol.

Shared protocol (both sides):
  * mean_pool: GCN(64, relu) → drop 0.4 → GCN(32, relu) → mean_pool →
    drop 0.4 → Dense(C); Adam 5e-3  (reference demo_mean_pool.py:62-90)
  * gin: 3 × GIN(Dense(32)+relu+Dense(32), train_eps) with relu between,
    sum_pool, drop 0.4, Dense(C); Adam 3e-3 (reference demo_gin.py:64-113;
    the repo mirror omits the reference MLP's BatchNorm — both sides here
    use the identical BN-free MLP so the comparison is apples-to-apples)
  * batch 32, 300 steps, fixed 90/10 split (train_test_split random_state 0),
    final test accuracy.

Output: head_to_head_graph.json; gated by tests/test_head_to_head_hard.py.

Usage: python head_to_head_graph.py [num_seeds] [model ...]
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "demo"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BATCH, STEPS = 32, 300


def _shared_graphs():
    from tf_geometric_tpu.datasets.synthetic_citation import (
        flip_graph_labels, synthetic_graph_classification_hard)
    from sklearn.model_selection import train_test_split
    graphs, num_classes = synthetic_graph_classification_hard(seed=0)
    train, test = train_test_split(graphs, test_size=0.1, random_state=0)
    flip_graph_labels(train)  # 10% train-label noise, clean test
    return train, test, num_classes


def run_reference(model_name, seed):
    """One seeded reference run (shim-executed Keras models, shared
    protocol)."""
    import tfref
    tfg = tfref.load_reference()
    assert tfg is not None, tfref.load_failure()
    import tensorflow as tf

    train_graphs, test_graphs, num_classes = _shared_graphs()
    tf.random.set_seed(seed)
    np.random.seed(seed)
    rng = np.random.default_rng(seed)

    def to_ref(g):
        return tfg.Graph(x=np.asarray(g.x), edge_index=np.asarray(g.edge_index),
                         y=np.asarray(g.y))

    train_ref = [to_ref(g) for g in train_graphs]
    test_ref = [to_ref(g) for g in test_graphs]

    if model_name == "mean_pool":
        gcn0 = tfg.layers.GCN(64, activation=tf.nn.relu)
        gcn1 = tfg.layers.GCN(32, activation=tf.nn.relu)
        dense = tf.keras.layers.Dense(num_classes)
        lr = 5e-3

        def forward(bg, training):
            h = gcn0([bg.x, bg.edge_index])
            h = tf.nn.dropout(h, 0.4) if training else h
            h = gcn1([h, bg.edge_index])
            h = tfg.nn.mean_pool(h, bg.node_graph_index)
            h = tf.nn.dropout(h, 0.4) if training else h
            return dense(h)
    elif model_name == "gin":
        def mlp():
            return tf.keras.Sequential([
                tf.keras.layers.Dense(32, activation=tf.nn.relu),
                tf.keras.layers.Dense(32)])
        gins = [tfg.layers.GIN(mlp(), train_eps=True) for _ in range(3)]
        dense = tf.keras.layers.Dense(num_classes)
        lr = 3e-3

        def forward(bg, training):
            h = bg.x
            for gin in gins:
                h = gin([h, bg.edge_index], training=training)
                h = tf.nn.relu(h)
            h = tfg.nn.sum_pool(h, bg.node_graph_index)
            h = tf.nn.dropout(h, 0.4) if training else h
            return dense(h)
    elif model_name == "sag_pool":
        # shared protocol = repo demo/demo_sag_pool_h.py (2 levels of
        # GCN(32,relu) → SAGPool(score GCN(1), k=8, tanh), mean readout per
        # level; reference hierarchy from demo/demo_sag_pool_h.py:70-110)
        gcns = [tfg.layers.GCN(32, activation=tf.nn.relu) for _ in range(2)]
        sags = [tfg.layers.SAGPool(score_gnn=tfg.layers.GCN(1), k=8,
                                   score_activation=tf.nn.tanh)
                for _ in range(2)]
        dense = tf.keras.layers.Dense(num_classes)
        lr = 5e-3

        def forward(bg, training):
            h, ei, ew, ngi = (bg.x, bg.edge_index, bg.edge_weight,
                              bg.node_graph_index)
            readouts = []
            for gcn, sag in zip(gcns, sags):
                h = gcn([h, ei, ew])
                h, ei, ew, ngi = sag([h, ei, ew, ngi], training=training)
                readouts.append(tfg.nn.mean_pool(h, ngi))
            h = tf.concat(readouts, axis=-1)
            h = tf.nn.dropout(h, 0.4) if training else h
            return dense(h)
    elif model_name == "sort_pool":
        # shared protocol = repo demo/demo_sort_pool.py (2×GCN(32,tanh) →
        # SortPool k=8 → [G, k·F] dense readout; reference demo_sort_pool.py
        # uses its SortPool layer the same way)
        K = 8
        gcns = [tfg.layers.GCN(32, activation=tf.nn.tanh) for _ in range(2)]
        sortp = tfg.layers.SortPool(k=K)
        d64 = tf.keras.layers.Dense(64)
        dense = tf.keras.layers.Dense(num_classes)
        lr = 5e-3

        def forward(bg, training):
            from tf_geometric.utils.graph_utils import convert_x_to_3d
            h = gcns[0]([bg.x, bg.edge_index, bg.edge_weight])
            h = gcns[1]([h, bg.edge_index, bg.edge_weight])
            px, _, _, pngi = sortp(
                [h, bg.edge_index, bg.edge_weight, bg.node_graph_index],
                training=training)
            h3 = convert_x_to_3d(px, pngi, k=K)   # [G, K, F] zero-padded
            h = tf.reshape(h3, [tf.shape(h3)[0], K * 32])
            h = tf.nn.relu(d64(h))
            h = tf.nn.dropout(h, 0.4) if training else h
            return dense(h)
    elif model_name == "diff_pool":
        # shared protocol = repo demo/demo_diff_pool.py (levels [8, 4]
        # clusters, feature GCN(32,relu) / assign GCN(C), units 32, max
        # readout per level; reference demo_diff_pool.py:86-120)
        diffs = [tfg.layers.DiffPool(
            feature_gnn=tfg.layers.GCN(32, activation=tf.nn.relu),
            assign_gnn=tfg.layers.GCN(clusters), units=32,
            num_clusters=clusters) for clusters in (8, 4)]
        d64 = tf.keras.layers.Dense(64)
        dense = tf.keras.layers.Dense(num_classes)
        lr = 5e-3

        def forward(bg, training):
            h, ei, ew, ngi = (bg.x, bg.edge_index, bg.edge_weight,
                              bg.node_graph_index)
            readouts = []
            for dp in diffs:
                h, ei, ew, ngi = dp([h, ei, ew, ngi], training=training)
                readouts.append(tfg.nn.max_pool(h, ngi))
            h = tf.concat(readouts, axis=-1)
            h = tf.nn.relu(d64(h))
            h = tf.nn.dropout(h, 0.4) if training else h
            return dense(h)
    elif model_name == "min_cut_pool":
        # shared protocol = repo demo/demo_min_cut_pool.py (GCN(32,relu) →
        # MinCutPool(feature GCN(32,relu), assign GCN(8), 8 clusters) →
        # mean readout + auxiliary cut/orth losses; reference
        # demo_min_cut_pool.py:66-123 + layers/pool/min_cut_pool.py:63-69)
        pre = tfg.layers.GCN(32, activation=tf.nn.relu)
        mcp = tfg.layers.MinCutPool(
            feature_gnn=tfg.layers.GCN(32, activation=tf.nn.relu),
            assign_gnn=tfg.layers.GCN(8), units=32, num_clusters=8)
        dense = tf.keras.layers.Dense(num_classes)
        lr = 5e-3

        aux_losses = []  # cut+orth of the last forward, read by the loop

        def forward(bg, training):
            h = pre([bg.x, bg.edge_index, bg.edge_weight])
            (h, _, _, ngi), losses = mcp(
                [h, bg.edge_index, bg.edge_weight, bg.node_graph_index],
                training=training, return_losses=True)
            aux_losses[:] = losses
            h = tfg.nn.mean_pool(h, ngi)
            h = tf.nn.dropout(h, 0.4) if training else h
            return dense(h)
    else:
        raise ValueError(model_name)
    aux = aux_losses if model_name == "min_cut_pool" else None

    optimizer = tf.keras.optimizers.Adam(learning_rate=lr)

    def batches(graphs, shuffle):
        order = rng.permutation(len(graphs)) if shuffle \
            else np.arange(len(graphs))
        for s in range(0, len(order), BATCH):
            yield tfg.BatchGraph.from_graphs(
                [graphs[i] for i in order[s:s + BATCH]])

    step = 0
    while step < STEPS:
        for bg in batches(train_ref, shuffle=True):
            with tf.GradientTape() as tape:
                logits = forward(bg, True)
                loss = tf.reduce_mean(tf.nn.softmax_cross_entropy_with_logits(
                    logits=logits,
                    labels=tf.one_hot(np.asarray(bg.y).flatten(),
                                      depth=num_classes)))
                if aux:
                    # MinCutPool's cut+orth auxiliary losses, same weighting
                    # as the repo side (demo_min_cut_pool._aux_loss)
                    loss = loss + tf.add_n([tf.convert_to_tensor(a)
                                            for a in aux])
            variables = tape.watched_variables()
            optimizer.apply_gradients(
                zip(tape.gradient(loss, variables), variables))
            step += 1
            if step >= STEPS:
                break

    correct = total = 0
    for bg in batches(test_ref, shuffle=False):
        preds = tf.argmax(forward(bg, False), axis=-1, output_type=tf.int32)
        labels = np.asarray(bg.y).flatten()
        correct += int((preds.numpy() == labels).sum())
        total += len(labels)
    return correct / max(total, 1)


def run_repo(model_name, seed):
    """One seeded repo run via the demo models + the shared loop, in a
    subprocess so the hard-data env var can't leak into other tests."""
    code = f"""
import os, sys
os.environ["TFG_HARD_GRAPH_CLS"] = "1"
sys.path.insert(0, {repr(os.path.join(HERE, '..', '..'))})
sys.path.insert(0, {repr(os.path.join(HERE, '..', '..', 'demo'))})
import jax
jax.config.update("jax_platforms", "cpu")
from demo_utils import run_graph_classification
from sklearn.model_selection import train_test_split
from tf_geometric_tpu.datasets.synthetic_citation import \\
    flip_graph_labels, synthetic_graph_classification_hard
graphs, _ = synthetic_graph_classification_hard(seed=0)
split = train_test_split(graphs, test_size=0.1, random_state=0)
flip_graph_labels(split[0])
model = {repr(model_name)}
kw = dict(batch_size={BATCH}, num_steps={STEPS}, learning_rate=5e-3,
          seed={seed}, split=(split[0], split[1]))
if model == "mean_pool":
    from demo_mean_pool import MeanPoolNetwork
    acc = run_graph_classification(
        lambda c, g: MeanPoolNetwork(num_classes=c, num_graphs=g), **kw)
elif model == "gin":
    from demo_gin import GINModel
    kw["learning_rate"] = 3e-3
    acc = run_graph_classification(
        lambda c, g: GINModel(num_classes=c, num_graphs=g), **kw)
elif model == "sag_pool":
    from demo_sag_pool_h import SAGPoolHModel
    acc = run_graph_classification(
        lambda c, g: SAGPoolHModel(num_classes=c, num_graphs=g), **kw)
elif model == "sort_pool":
    from demo_sort_pool import SortPoolModel
    acc = run_graph_classification(
        lambda c, g: SortPoolModel(num_classes=c, num_graphs=g), **kw)
elif model == "diff_pool":
    from demo_diff_pool import DiffPoolModel
    acc = run_graph_classification(
        lambda c, g: DiffPoolModel(num_classes=c, num_graphs=g), **kw)
elif model == "min_cut_pool":
    from demo_min_cut_pool import MinCutPoolModel, _aux_loss
    acc = run_graph_classification(
        lambda c, g: MinCutPoolModel(num_classes=c, num_graphs=g),
        extra_loss_from_state=_aux_loss, **kw)
print("REPO_ACC", acc)
"""
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True)
    for line in proc.stdout.splitlines():
        if line.startswith("REPO_ACC"):
            return float(line.split()[1])
    raise RuntimeError(f"repo run failed for {model_name}:\n"
                       f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main(num_seeds=5, models=None):
    out_path = os.path.join(HERE, "head_to_head_graph.json")
    out = {}
    if os.path.exists(out_path):
        with open(out_path, encoding="utf-8") as f:
            out = json.load(f)
    for model in (models or ("mean_pool", "gin", "sag_pool", "sort_pool",
                             "diff_pool", "min_cut_pool")):
        if model in out and len(out[model]["reference"]) >= num_seeds:
            continue
        # seed extension: both sides are deterministic per seed — keep the
        # committed prefix, run only the missing tail
        prev_repo = list(out[model]["repo"][:num_seeds]) if model in out else []
        repo_accs = prev_repo + [run_repo(model, s)
                                 for s in range(len(prev_repo), num_seeds)]
        print(f"{model}: repo mean {np.mean(repo_accs):.4f} "
              f"± {np.std(repo_accs):.4f}", flush=True)
        ref_accs = list(out[model]["reference"][:num_seeds]) \
            if model in out else []
        for seed in range(len(ref_accs), num_seeds):
            acc = run_reference(model, seed)
            ref_accs.append(acc)
            print(f"{model} ref seed {seed}: {acc:.4f}", flush=True)
        out[model] = {
            "reference": ref_accs, "repo": repo_accs,
            "reference_mean": float(np.mean(ref_accs)),
            "reference_std": float(np.std(ref_accs)),
            "repo_mean": float(np.mean(repo_accs)),
            "repo_std": float(np.std(repo_accs)),
            "delta": float(np.mean(repo_accs) - np.mean(ref_accs)),
        }
        print("{}: ref {:.4f}±{:.4f}  repo {:.4f}±{:.4f}  delta {:+.4f}"
              .format(model, out[model]["reference_mean"],
                      out[model]["reference_std"], out[model]["repo_mean"],
                      out[model]["repo_std"], out[model]["delta"]), flush=True)
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(out, f, indent=2)
    print("wrote head_to_head_graph.json")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    main(n, models=sys.argv[2:] or None)
