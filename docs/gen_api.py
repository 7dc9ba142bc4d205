"""Regenerate docs/api.md from docstring first lines.

    python docs/gen_api.py > docs/api.md
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import importlib
import inspect
import re

SECTIONS = [
    ("tf_geometric_tpu.nn (functional ops)", "tf_geometric_tpu.nn"),
    ("tf_geometric_tpu.layers (flax modules)", "tf_geometric_tpu.layers"),
    ("tf_geometric_tpu.data", "tf_geometric_tpu.data"),
    ("tf_geometric_tpu.datasets", "tf_geometric_tpu.datasets"),
    ("tf_geometric_tpu.sparse", "tf_geometric_tpu.sparse"),
    ("tf_geometric_tpu.ops (kernels)", "tf_geometric_tpu.ops"),
    ("tf_geometric_tpu.parallel", "tf_geometric_tpu.parallel"),
    ("tf_geometric_tpu.utils.graph_utils", "tf_geometric_tpu.utils.graph_utils"),
    ("tf_geometric_tpu.utils (misc)", "tf_geometric_tpu.utils"),
    ("tf_geometric_tpu.native (C++ host ops)", "tf_geometric_tpu.native"),
]

HEADER = """# API reference

Every public symbol of `tf_geometric_tpu`, auto-extracted from docstrings
(first line; most cite the mirrored reference file:line in
CrawlScript/tf_geometric). Regenerate with ``python docs/gen_api.py >
docs/api.md``. See `IMPLEMENTATION_NOTES.md` for the component-level
parity map and `docs/performance.md` for the kernel cost model."""


def first_line(obj):
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    line = doc.strip().splitlines()[0].strip()
    # dataclass-generated docstrings embed runtime repr()s (memory
    # addresses) — truncate at the signature so regeneration is stable
    line = re.sub(r" at 0x[0-9a-f]+", "", line)
    if len(line) > 120:
        line = line[:117] + "..."
    return line.replace("|", "\\|")


def main():
    print(HEADER)
    for title, modname in SECTIONS:
        mod = importlib.import_module(modname)
        names = getattr(mod, "__all__", None)
        if names is None:
            names = [n for n in dir(mod) if not n.startswith("_")
                     and not inspect.ismodule(getattr(mod, n))]
        rows = []
        for n in sorted(set(names)):
            obj = getattr(mod, n, None)
            if obj is None or inspect.ismodule(obj):
                continue
            rows.append((n, first_line(obj)))
        if not rows:
            continue
        print(f"\n## {title}\n")
        print("| symbol | summary |")
        print("|---|---|")
        for n, s in rows:
            print(f"| `{n}` | {s} |")


if __name__ == "__main__":
    main()
