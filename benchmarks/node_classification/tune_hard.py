"""Difficulty tuning for the hard-mode protocol (head_to_head_hard.py).

Runs the EXECUTED reference GCN (via the tf_sparse shim, same early-stop
loop as head_to_head.py) on the HardCitationDataset difficulty settings and
prints per-seed test accuracy. Target band: reference mean ~0.75-0.85 per
shape — the regime where the reference's published real-data numbers live
(cora 81.5 / citeseer 70.3 / pubmed 79.0).

Usage: python tune_hard.py <shape> [num_seeds]
       python tune_hard.py cora 3
Override difficulty from the CLI for sweeps:
       python tune_hard.py cora 2 homophily=0.55 class_overlap=0.5
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from head_to_head import run_reference


def shared_from_hard(name, seed, overrides=None):
    """(x, ei, ew, y, splits) numpy tuple from the hard dataset."""
    from tf_geometric_tpu.datasets.synthetic_citation import HardCitationDataset
    if overrides:
        HardCitationDataset._DIFFICULTY = {
            k: {**v, **{kk: vv for kk, vv in overrides.items()
                        if kk in ("homophily", "feature_signal",
                                  "class_overlap")}}
            for k, v in HardCitationDataset._DIFFICULTY.items()}
        if "train_per_class" in overrides:
            HardCitationDataset.TRAIN_PER_CLASS = int(
                overrides["train_per_class"])
        if "label_noise" in overrides:
            HardCitationDataset.LABEL_NOISE = overrides["label_noise"]
    graph, splits = HardCitationDataset(name, seed=seed).load_data()
    x = np.asarray(graph.x, np.float32)
    ei = np.asarray(graph.edge_index, np.int32)
    ew = np.asarray(graph.edge_weight, np.float32)
    y = np.asarray(graph.y, np.int32)
    return x, ei, ew, y, tuple(np.asarray(s, np.int32) for s in splits)


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else "cora"
    num_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    overrides = {}
    for arg in sys.argv[3:]:
        k, v = arg.split("=")
        overrides[k] = float(v)
    accs = []
    for seed in range(num_seeds):
        shared = shared_from_hard(shape, seed, overrides)
        acc = run_reference("gcn", seed, shared)
        accs.append(acc)
        print(f"{shape} seed {seed}: ref GCN {acc:.4f}", flush=True)
    print(f"{shape} ref GCN mean {np.mean(accs):.4f} ± {np.std(accs):.4f} "
          f"overrides={overrides}")


if __name__ == "__main__":
    main()
