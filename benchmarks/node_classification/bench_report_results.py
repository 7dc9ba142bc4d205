"""Aggregate results.txt into mean±std (reference: bench_report_results.py:11-18)."""
import os

import numpy as np

path = os.path.join(os.path.dirname(__file__), "results.txt")
with open(path, encoding="utf-8") as f:
    accs = [float(line.strip()) for line in f if line.strip()]
print(f"{len(accs)} runs: mean={np.mean(accs):.4f} std={np.std(accs):.4f}")
