"""Regenerate a hard-mode cell from scratch after its difficulty changed
(per-(model,shape) overrides in HardCitationDataset._MODEL_DIFFICULTY).

A retuned cell gets a NEW graph, so BOTH committed lists are stale: the old
repo results file is moved aside (suffix .pre-model-difficulty) and the
JSON entry is deleted, then head_to_head_hard.main regenerates both sides
on the new data.

Usage: python revive_cell.py <num_seeds> <model_shape> [...]
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "..", ".."))
JSON_PATH = os.path.join(HERE, "head_to_head_hard.json")


def clear(key):
    model, shape = key.rsplit("_", 1)
    results_path = os.path.join(HERE, f"results_{model}_{shape}_hard.txt")
    if os.path.exists(results_path):
        backup = results_path + ".pre-model-difficulty"
        if not os.path.exists(backup):
            os.replace(results_path, backup)
        else:
            os.remove(results_path)
    from json_lock import locked_json
    with locked_json(JSON_PATH) as data:
        if key in data:
            del data[key]
    print(f"cleared {key}", flush=True)


if __name__ == "__main__":
    num_seeds = int(sys.argv[1])
    keys = sys.argv[2:]
    from tf_geometric_tpu.datasets.synthetic_citation import \
        HardCitationDataset
    for key in keys:
        model, shape = key.rsplit("_", 1)
        assert (model, shape) in HardCitationDataset._MODEL_DIFFICULTY, (
            f"{key}: no per-model difficulty override — revive_cell is only "
            "for retuned cells")
        clear(key)
    import head_to_head_hard
    head_to_head_hard.main(num_seeds, only=keys)
