"""flock-guarded read-modify-write for the head-to-head JSON files —
several harness processes (rerun_hard_repo_side, head_to_head_hard,
revive_cell) may finish cells concurrently; an unguarded load→dump pair
can drop another writer's update."""
import fcntl
import json
import os
from contextlib import contextmanager


@contextmanager
def locked_json(path):
    """Yields the parsed dict; dumps it back (pretty) on clean exit, all
    under an exclusive flock on <path>.lock."""
    with open(path + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        data = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
        yield data
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=2)
        os.replace(tmp, path)
