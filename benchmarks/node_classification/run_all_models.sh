#!/bin/bash
# 20-seed early-stop accuracy sweep over all five models (the reference's
# regression protocol, run_multi_times.sh applied per model). Writes
# results_<model>.txt per model, leaves the last model's runs in results.txt,
# and prints a summary table.
set -e
cd "$(dirname "$0")"
RUNS=${1:-20}
for model in gcn gat appnp sgc ssgc; do
    : > results.txt
    python "bench_node_cls_early_stop_${model}.py" $(seq 0 $((RUNS - 1)))
    cp results.txt "results_${model}.txt"
    echo "== ${model}"
    python bench_report_results.py
done
