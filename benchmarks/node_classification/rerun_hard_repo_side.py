"""Re-run the repo side of hard-mode entries under the seeded dropout
stream (demo_utils.train_node_classifier seed= fix) and refresh
head_to_head_hard.json in place.

The original repo-side sweeps were produced with a hardcoded PRNGKey(0)
dropout stream — 20 runs conditioned on one noise draw. Entries WITHOUT
dropout in their protocol (all sgc_*, gat_pubmed drop 0.0) are unaffected
and not rerun by default. Reference-side lists are untouched (the
reference always reseeded per run).

Usage: python rerun_hard_repo_side.py [--seeds N] [--resume] <model_shape> [...]
       python rerun_hard_repo_side.py gcn_citeseer gcn_pubmed appnp_pubmed
       python rerun_hard_repo_side.py --resume ssgc_cora   # finish a partial

``--resume`` keeps an existing results file (assumed to already hold
seeded-stream values) and appends only the missing seeds; the default mode
backs the pre-fix file up to ``.prefix-dropout-stream`` (only if no such
backup exists yet — a retry must never overwrite the original pre-fix
data) and reruns every seed from scratch.
"""
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
JSON_PATH = os.path.join(HERE, "head_to_head_hard.json")


def rerun(key, num_seeds=20, resume=False):
    model, shape = key.rsplit("_", 1)
    results_path = os.path.join(HERE, f"results_{model}_{shape}_hard.txt")
    done = 0
    if os.path.exists(results_path):
        if resume:
            with open(results_path, encoding="utf-8") as f:
                done = len(f.read().split())
        else:
            backup = results_path + ".prefix-dropout-stream"
            if os.path.exists(backup):
                raise RuntimeError(
                    f"{backup} already exists — refusing to overwrite the "
                    "original pre-fix data. Use --resume to continue a "
                    "partial seeded-stream rerun, or remove the current "
                    "results file by hand.")
            os.replace(results_path, backup)
    if done < num_seeds:
        env = dict(os.environ,
                   TFG_HARD_PROTOCOL="1", TFG_HARD_SEED="0",
                   TFG_HARD_MODEL=model,
                   BENCH_DATASET=shape, BENCH_PLATFORM="cpu",
                   TFG_RESULTS_PATH=results_path)
        script = os.path.join(HERE, f"bench_node_cls_early_stop_{model}.py")
        cmd = [sys.executable, script] + [str(s)
                                          for s in range(done, num_seeds)]
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(f"{key} failed:\n{proc.stdout[-2000:]}"
                               f"\n{proc.stderr[-2000:]}")
    with open(results_path, encoding="utf-8") as f:
        repo = [float(v) for v in f.read().split()]
    assert len(repo) >= num_seeds, (
        f"{key}: results file holds {len(repo)} < {num_seeds} values — "
        "not committing a fewer-seed mean")
    from json_lock import locked_json
    with locked_json(JSON_PATH) as data:
        e = data[key]
        e["repo"] = repo[:num_seeds]
        e["repo_mean"] = float(np.mean(e["repo"]))
        e["repo_std"] = float(np.std(e["repo"]))
        e["delta"] = e["repo_mean"] - e["reference_mean"]
    n = len(e["reference"])
    sem = float(np.sqrt(np.var(e["reference"]) / n
                        + np.var(e["repo"]) / len(e["repo"])))
    print(f"{key}: repo {e['repo_mean']:.4f}±{e['repo_std']:.4f} "
          f"delta {e['delta']:+.4f} (2·SEM {2 * sem:.4f})", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    seeds, resume, keys = 20, False, []
    while args:
        a = args.pop(0)
        if a == "--seeds":
            seeds = int(args.pop(0))
        elif a == "--resume":
            resume = True
        else:
            keys.append(a)
    for key in keys:
        rerun(key, num_seeds=seeds, resume=resume)
