"""Consistency sweep over the hard-mode evidence before committing:

* every JSON repo list matches the committed per-seed results file
  (same values, prefix) — the ADVICE r4 class of 'artifact no longer
  backs the JSON' drift;
* seed counts per cell meet the gate minimums;
* no entry mixes pre-fix dropout-stream values (every dropout-bearing
  cell's results file must differ from its .prefix-dropout-stream backup).

Usage: python check_hard_consistency.py
"""
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ok = True
    data = json.load(open(os.path.join(HERE, "head_to_head_hard.json")))
    for key, entry in sorted(data.items()):
        model, shape = key.rsplit("_", 1)
        path = os.path.join(HERE, f"results_{model}_{shape}_hard.txt")
        if not os.path.exists(path):
            print(f"MISSING results file: {key}")
            ok = False
            continue
        with open(path, encoding="utf-8") as f:
            file_vals = [float(v) for v in f.read().split()]
        repo = entry["repo"]
        if [round(v, 6) for v in file_vals[:len(repo)]] != \
                [round(v, 6) for v in repo]:
            print(f"DRIFT: {key} JSON repo list != results file prefix")
            ok = False
        if len(file_vals) < len(repo):
            print(f"SHORT FILE: {key} file {len(file_vals)} < JSON {len(repo)}")
            ok = False
        # recompute stats
        for stat, val in (("repo_mean", float(np.mean(repo))),
                          ("repo_std", float(np.std(repo))),
                          ("reference_mean",
                           float(np.mean(entry["reference"])))):
            if abs(entry[stat] - val) > 1e-9:
                print(f"STALE STAT: {key}.{stat} {entry[stat]} != {val}")
                ok = False
        backup = path + ".prefix-dropout-stream"
        if os.path.exists(backup):
            with open(backup, encoding="utf-8") as f:
                back_vals = [float(v) for v in f.read().split()]
            if back_vals[:len(repo)] == [float(v) for v in repo]:
                print(f"PRE-FIX VALUES STILL COMMITTED: {key}")
                ok = False
        n_ref, n_repo = len(entry["reference"]), len(repo)
        print(f"{key}: n={n_ref}/{n_repo} ref {entry['reference_mean']:.3f} "
              f"repo {entry['repo_mean']:.3f} delta {entry['delta']:+.3f}")
    print("CONSISTENT" if ok else "INCONSISTENCIES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
