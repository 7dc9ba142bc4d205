"""Per-(model, shape) difficulty tuning for the collapsed hard-mode cells.

The GCN-tuned difficulty (HardCitationDataset._DIFFICULTY) collapses
GAT/APPNP/SSGC to chance on citeseer/pubmed-shaped graphs under their own
reference protocols (both sides land ~0.15-0.34 — matched failure, zero
discriminative power). This script sweeps a ladder of easier difficulty
candidates and reports, per cell, where the EXECUTED REFERENCE (that
model's own Keras stack + per-dataset protocol, run under the tf_sparse
shim) lands — target band 0.50-0.85. The winning settings go into
HardCitationDataset._MODEL_DIFFICULTY.

Usage: python tune_hard_cells.py <model_shape> [num_seeds] [h=X s=Y o=Z ...]
       python tune_hard_cells.py gat_citeseer 2 0.70,2.0,0.30 0.75,2.5,0.25
Each positional candidate is "homophily,feature_signal,class_overlap".
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from head_to_head import run_reference


def shared_with(shape, diff, graph_seed=0):
    from tf_geometric_tpu.datasets import synthetic_citation as sc
    ds = sc.HardCitationDataset(shape, seed=graph_seed)
    ds.model = None
    # build with explicit difficulty: patch the per-shape table for this call
    old = sc.HardCitationDataset._DIFFICULTY
    sc.HardCitationDataset._DIFFICULTY = {**old, shape: diff}
    try:
        graph, splits = ds.load_data()
    finally:
        sc.HardCitationDataset._DIFFICULTY = old
    return (np.asarray(graph.x, np.float32),
            np.asarray(graph.edge_index, np.int32),
            np.asarray(graph.edge_weight, np.float32),
            np.asarray(graph.y, np.int32),
            tuple(np.asarray(s, np.int32) for s in splits))


def main():
    key = sys.argv[1]
    model, shape = key.rsplit("_", 1)
    num_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    candidates = []
    for arg in sys.argv[3:]:
        vals = [float(v) for v in arg.split(",")]
        cand = dict(homophily=vals[0], feature_signal=vals[1],
                    class_overlap=vals[2])
        if len(vals) > 3:          # optional: train_per_class
            cand["train_per_class"] = int(vals[3])
        if len(vals) > 4:          # optional: label_noise
            cand["label_noise"] = vals[4]
        candidates.append(cand)
    if not candidates:
        candidates = [dict(homophily=0.70, feature_signal=2.0,
                           class_overlap=0.30)]
    for diff in candidates:
        shared = shared_with(shape, diff)
        accs = []
        for seed in range(num_seeds):
            acc = run_reference(model, seed, shared, dataset=shape)
            accs.append(acc)
            print(f"  {key} {diff} seed {seed}: {acc:.4f}", flush=True)
        mean = float(np.mean(accs))
        verdict = "IN BAND" if 0.50 <= mean <= 0.85 else (
            "too hard" if mean < 0.50 else "too easy")
        print(f"{key} {diff}: ref mean {mean:.4f} ± {np.std(accs):.4f} "
              f"[{verdict}]", flush=True)


if __name__ == "__main__":
    main()
