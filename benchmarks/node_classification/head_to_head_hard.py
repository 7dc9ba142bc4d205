"""HARD-MODE head-to-head: executed reference vs repo, non-saturated regime.

The easy synthetic protocol saturates every model at 0.99+ accuracy, where a
parity gate cannot distinguish a correct implementation from one with a
multi-point systematic error. This harness reruns the five-model comparison
on the HardCitationDataset protocol (datasets/synthetic_citation.py), tuned
so the *executed reference* GCN lands in the ~0.70-0.85 band its published
real-data numbers live in (cora 81.5 / citeseer 70.3 / pubmed 79.0 —
reference benchmarks/node_classification/bench_node_cls_early_stop_gcn.py).

Per (model, shape): a FIXED hard graph (generator seed 0, the reference's
fixed-real-graph convention) is trained with N training seeds on BOTH sides:

* reference side: the reference's own Keras models executed under TF via the
  tf_sparse shim (head_to_head.run_reference), per-dataset protocols
  (head_to_head.DATASET_OVERRIDES);
* repo side: the repo's bench scripts run in a subprocess with
  ``TFG_HARD_PROTOCOL=1 BENCH_DATASET=<shape>`` — the same scripts the
  20-seed easy sweeps use, now pointed at the hard data (they share the
  reference's early-stop rule via demo_utils.train_node_classifier).

Output: head_to_head_hard.json — per "<model>_<shape>": both accuracy lists,
means/stds, delta. tests/test_head_to_head.py gates the committed deltas.

Usage:  python head_to_head_hard.py [num_seeds] [model_shape ...]
        python head_to_head_hard.py 20
        python head_to_head_hard.py 20 gcn_cora gat_citeseer
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from head_to_head import run_reference

HERE = os.path.dirname(os.path.abspath(__file__))
MODELS = ("gcn", "gat", "appnp", "sgc", "ssgc")
SHAPES = ("cora", "citeseer", "pubmed")


def shared_from_hard(shape, graph_seed=0, model=None):
    """(x, ei, ew, y, splits) numpy tuple of the fixed hard graph.

    ``model`` selects the per-(model, shape) difficulty override
    (HardCitationDataset._MODEL_DIFFICULTY) — cells whose model family
    collapses to chance on the GCN-tuned data get easier graphs; both
    sides of such a cell are built with the same key."""
    from tf_geometric_tpu.datasets.synthetic_citation import HardCitationDataset
    graph, splits = HardCitationDataset(shape, seed=graph_seed,
                                        model=model).load_data()
    return (np.asarray(graph.x, np.float32),
            np.asarray(graph.edge_index, np.int32),
            np.asarray(graph.edge_weight, np.float32),
            np.asarray(graph.y, np.int32),
            tuple(np.asarray(s, np.int32) for s in splits))


def run_repo_side(model, shape, num_seeds):
    """All seeds of one repo bench script in ONE subprocess (compiles once),
    on the hard data. Returns the accuracy list and commits it to
    results_<model>_<shape>_hard.txt."""
    results_path = os.path.join(HERE, f"results_{model}_{shape}_hard.txt")
    done = 0
    if os.path.exists(results_path):
        with open(results_path, encoding="utf-8") as f:
            accs = [float(v) for v in f.read().split()]
        if len(accs) >= num_seeds:
            return accs[:num_seeds]
        done = len(accs)  # partial file: run only the missing seeds (append)
    env = dict(os.environ,
               TFG_HARD_PROTOCOL="1", TFG_HARD_SEED="0",
               TFG_HARD_MODEL=model,
               BENCH_DATASET=shape, BENCH_PLATFORM="cpu",
               TFG_RESULTS_PATH=results_path)
    script = os.path.join(HERE, f"bench_node_cls_early_stop_{model}.py")
    cmd = [sys.executable, script] + [str(s) for s in range(done, num_seeds)]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"repo run failed for {model}/{shape}:\n{proc.stdout[-2000:]}"
            f"\n{proc.stderr[-2000:]}")
    with open(results_path, encoding="utf-8") as f:
        return [float(v) for v in f.read().split()]


def main(num_seeds=20, only=None):
    # TFG_H2H_OUT: separate output file so two harness processes can split
    # the (model, shape) grid without clobbering each other's checkpoints
    out_path = os.path.join(HERE, os.environ.get("TFG_H2H_OUT",
                                                 "head_to_head_hard.json"))
    out = {}
    if os.path.exists(out_path):
        with open(out_path, encoding="utf-8") as f:
            out = json.load(f)  # resume: keep completed entries
    # CLI order is honored (cheap combos can be scheduled first); default
    # grid order is shape-major
    keys = list(only) if only else [f"{m}_{s}" for s in SHAPES for m in MODELS]
    shared_cache = {}
    for key in keys:
        model, shape = key.rsplit("_", 1)
        if key in out and len(out[key]["reference"]) >= num_seeds:
            continue
        # per-model difficulty overrides mean the shared graph is keyed by
        # (model, shape) when an override exists, by shape otherwise
        from tf_geometric_tpu.datasets.synthetic_citation import \
            HardCitationDataset
        has_override = (model, shape) in HardCitationDataset._MODEL_DIFFICULTY
        cache_key = (model, shape) if has_override else shape
        if cache_key not in shared_cache:
            shared_cache[cache_key] = shared_from_hard(shape, model=model)
        shared = shared_cache[cache_key]
        repo_accs = run_repo_side(model, shape, num_seeds)
        print(f"{key}: repo mean {np.mean(repo_accs):.4f} "
              f"± {np.std(repo_accs):.4f}", flush=True)
        # seed extension: reference runs are deterministic per seed
        # (tf.random.set_seed), so keep the committed prefix and run only
        # the missing tail
        ref_accs = list(out[key]["reference"][:num_seeds]) if key in out else []

        def checkpoint(entry_key, refs, repos):
            entry = {
                "reference": refs,
                "repo": repos,
                "reference_mean": float(np.mean(refs)),
                "reference_std": float(np.std(refs)),
                "repo_mean": float(np.mean(repos)),
                "repo_std": float(np.std(repos)),
                "delta": float(np.mean(repos) - np.mean(refs)),
            }
            # flock-guarded merge so a concurrent rerun/revive writer can't
            # be clobbered
            from json_lock import locked_json
            with locked_json(out_path) as disk:
                disk[entry_key] = entry
                merged = {**disk}
            return merged

        for seed in range(len(ref_accs), num_seeds):
            acc = run_reference(model, seed, shared, dataset=shape)
            ref_accs.append(acc)
            print(f"{key} ref seed {seed}: {acc:.4f}", flush=True)
            # checkpoint after every REFERENCE seed: ref runs are the
            # expensive side (minutes each on the 2-core host) and the
            # resume path above keeps any committed prefix
            out = checkpoint(key, ref_accs, repo_accs)
        print("{}: ref {:.4f}±{:.4f}  repo {:.4f}±{:.4f}  delta {:+.4f}"
              .format(key, out[key]["reference_mean"],
                      out[key]["reference_std"], out[key]["repo_mean"],
                      out[key]["repo_std"], out[key]["delta"]),
              flush=True)
    print("wrote head_to_head_hard.json")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    main(n, only=sys.argv[2:] or None)
