"""Re-run the repo side of hard-mode entries under the seeded dropout
stream (demo_utils.train_node_classifier seed= fix) and refresh
head_to_head_hard.json in place.

The original repo-side sweeps were produced with a hardcoded PRNGKey(0)
dropout stream — 20 runs conditioned on one noise draw. Entries WITHOUT
dropout in their protocol (all sgc_*, gat_pubmed drop 0.0) are unaffected
and not rerun by default. Reference-side lists are untouched (the
reference always reseeded per run).

Usage: python rerun_hard_repo_side.py <model_shape> [...]
       python rerun_hard_repo_side.py gcn_cora appnp_cora ssgc_cora
"""
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
JSON_PATH = os.path.join(HERE, "head_to_head_hard.json")


def rerun(key, num_seeds=20):
    model, shape = key.rsplit("_", 1)
    results_path = os.path.join(HERE, f"results_{model}_{shape}_hard.txt")
    if os.path.exists(results_path):
        os.replace(results_path, results_path + ".prefix-dropout-stream")
    env = dict(os.environ,
               TFG_HARD_PROTOCOL="1", TFG_HARD_SEED="0",
               BENCH_DATASET=shape, BENCH_PLATFORM="cpu",
               TFG_RESULTS_PATH=results_path)
    script = os.path.join(HERE, f"bench_node_cls_early_stop_{model}.py")
    cmd = [sys.executable, script] + [str(s) for s in range(num_seeds)]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"{key} failed:\n{proc.stdout[-2000:]}"
                           f"\n{proc.stderr[-2000:]}")
    with open(results_path, encoding="utf-8") as f:
        repo = [float(v) for v in f.read().split()]
    data = json.load(open(JSON_PATH, encoding="utf-8"))
    e = data[key]
    n = len(e["reference"])
    e["repo"] = repo[:max(n, num_seeds)]
    e["repo_mean"] = float(np.mean(e["repo"]))
    e["repo_std"] = float(np.std(e["repo"]))
    e["delta"] = e["repo_mean"] - e["reference_mean"]
    with open(JSON_PATH, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2)
    sem = float(np.sqrt(np.var(e["reference"]) / n
                        + np.var(e["repo"]) / len(e["repo"])))
    print(f"{key}: repo {e['repo_mean']:.4f}±{e['repo_std']:.4f} "
          f"delta {e['delta']:+.4f} (2·SEM {2 * sem:.4f})", flush=True)


if __name__ == "__main__":
    for key in sys.argv[1:]:
        rerun(key)
