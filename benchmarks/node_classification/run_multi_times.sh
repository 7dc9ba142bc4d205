#!/bin/bash
# Run an early-stop benchmark over many seeds (reference: run_multi_times.sh:1-11).
# Usage: ./run_multi_times.sh bench_node_cls_early_stop_gcn.py [num_runs]
SCRIPT=${1:-bench_node_cls_early_stop_gcn.py}
RUNS=${2:-20}
# fresh results file: appending across runs/models would average stale
# accuracies into the reported mean±std
: > "$(dirname "$0")/results.txt"
python "$(dirname "$0")/$SCRIPT" $(seq 0 $((RUNS - 1)))
python "$(dirname "$0")/bench_report_results.py"
