"""Render the README hard-mode table from the committed JSONs (so the
README rows can never drift from the gated evidence again — ADVICE r4).

Usage: python render_hard_table.py
Prints the markdown table for README.md's hard-mode section.
"""
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def fmt(entry, extra=""):
    ref = float(np.mean(entry["reference"]))
    repo = float(np.mean(entry["repo"]))
    n_ref, n_repo = len(entry["reference"]), len(entry["repo"])
    sem = float(np.sqrt(np.var(entry["reference"]) / n_ref
                        + np.var(entry["repo"]) / n_repo))
    delta = repo - ref
    return ref, repo, delta, sem, n_ref, n_repo


def main():
    node = json.load(open(os.path.join(HERE, "head_to_head_hard.json")))
    print("| entry | n | ref | repo | Δ | 2·SEM |")
    print("|---|---|---|---|---|---|")
    order = [f"{m}_{s}" for s in ("cora", "citeseer", "pubmed")
             for m in ("gcn", "gat", "appnp", "sgc", "ssgc")]
    for key in order:
        if key not in node:
            continue
        ref, repo, d, sem, n_ref, n_repo = fmt(node[key])
        n = str(n_ref) if n_ref == n_repo else f"{n_ref}/{n_repo}"
        print(f"| {key} | {n} | {ref:.3f} | {repo:.3f} | {d:+.3f} "
              f"| {2 * sem:.3f} |")
    arxiv_path = os.path.join(HERE, "head_to_head_arxiv.json")
    if os.path.exists(arxiv_path):
        arxiv = json.load(open(arxiv_path))
        for key, entry in arxiv.items():
            ref, repo, d, sem, n_ref, n_repo = fmt(entry)
            n = str(n_ref) if n_ref == n_repo else f"{n_ref}/{n_repo}"
            print(f"| {key} | {n} | {ref:.3f} | {repo:.3f} | {d:+.3f} "
                  f"| {2 * sem:.3f} |")
    graph_path = os.path.join(HERE, "..", "graph_classification",
                              "head_to_head_graph.json")
    if os.path.exists(graph_path):
        graph = json.load(open(graph_path))
        print()
        print("| graph-level | n | ref | repo | Δ | 2·SEM |")
        print("|---|---|---|---|---|---|")
        for key, entry in graph.items():
            ref, repo, d, sem, n_ref, n_repo = fmt(entry)
            n = str(n_ref) if n_ref == n_repo else f"{n_ref}/{n_repo}"
            print(f"| {key} | {n} | {ref:.3f} | {repo:.3f} | {d:+.3f} "
                  f"| {2 * sem:.3f} |")


def inject_readme():
    """Replace the block between HARD-TABLE-START/END markers in README.md
    with the freshly rendered tables."""
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main()
    table = buf.getvalue().rstrip()
    readme = os.path.join(HERE, "..", "..", "README.md")
    with open(readme, encoding="utf-8") as f:
        text = f.read()
    start = "<!-- HARD-TABLE-START -->"
    end = "<!-- HARD-TABLE-END -->"
    i, j = text.index(start) + len(start), text.index(end)
    text = text[:i] + "\n" + table + "\n" + text[j:]
    with open(readme, "w", encoding="utf-8") as f:
        f.write(text)
    print("README.md hard table refreshed")


if __name__ == "__main__":
    import sys
    if "--inject" in sys.argv:
        inject_readme()
    else:
        main()
