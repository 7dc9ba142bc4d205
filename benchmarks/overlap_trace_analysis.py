"""Compute the collective/compute overlap fraction from a jax.profiler trace.

Companion to benchmarks/halo_overlap.py (VERDICT r2 #9): the wall-clock
decomposition there can only *infer* overlap; this script settles it from
the profiler's own event timeline. Run the probe with a trace:

    TFG_SCALING_REAL=1 python benchmarks/halo_overlap.py   # pod slice;
                                                           # auto-captures
                                                           # /tmp/halo_trace
    python benchmarks/overlap_trace_analysis.py /tmp/halo_trace

Methodology: parse the Chrome-trace JSON the profiler writes
(plugins/profile/<run>/*.trace.json.gz), keep only DEVICE-process events
(process_name containing "TPU"/"GPU"/"/device:"), classify each complete
event as COLLECTIVE (all-to-all / all-reduce / all-gather /
collective-permute / reduce-scatter, including fusions whose name embeds
one) or COMPUTE, and merge each class's intervals per device:

    overlap_fraction = (t_coll + t_comp - t_union) / min(t_coll, t_comp)

1.0 → the cheaper class is fully hidden under the other; 0 → perfectly
serialized. On TPU the collectives run on dedicated DMA engines with their
own trace lines, so a hardware trace is the authoritative answer to whether
the halo exchange hides under local aggregation (parallel/halo.py:19-23).
The CPU backend emits no device timeline in its traces — this script then
reports that explicitly (the known-refuted CPU result lives in SCALING.md;
this tool exists for the day real multi-chip hardware is attached).
"""
import glob
import gzip
import json
import os
import sys

COLLECTIVE_MARKERS = ("all-to-all", "all-reduce", "all-gather",
                      "collective-permute", "reduce-scatter",
                      "cross-replica", "ncclalltoall")

DEVICE_MARKERS = ("tpu", "gpu", "/device:", "xla")


def _find_trace(trace_dir):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir} — did the "
                         "probe run with a trace dir set?")
    return max(files, key=os.path.getmtime)


def _merged_duration(intervals):
    total, cur_start, cur_end = 0.0, None, None
    for s, e in sorted(intervals):
        if cur_end is None or s > cur_end:
            if cur_end is not None:
                total += cur_end - cur_start
            cur_start, cur_end = s, e
        else:
            cur_end = max(cur_end, e)
    if cur_end is not None:
        total += cur_end - cur_start
    return total


def analyze(trace_dir):
    path = _find_trace(trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    process_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            process_names[ev.get("pid")] = ev.get("args", {}).get("name", "")

    device_pids = {pid: name for pid, name in process_names.items()
                   if any(m in name.lower() for m in DEVICE_MARKERS)
                   and "host" not in name.lower()}

    per_device = {}
    for pid, dev_name in device_pids.items():
        coll, comp = [], []
        for ev in events:
            if ev.get("ph") != "X" or ev.get("pid") != pid:
                continue
            dur = ev.get("dur", 0)
            if dur <= 0:
                continue
            start = ev.get("ts", 0.0)
            name = ev.get("name", "").lower()
            (coll if any(m in name for m in COLLECTIVE_MARKERS)
             else comp).append((start, start + dur))
        if not coll and not comp:
            continue
        t_coll = _merged_duration(coll)
        t_comp = _merged_duration(comp)
        t_union = _merged_duration(coll + comp)
        denom = min(t_coll, t_comp)
        per_device[dev_name] = {
            "collective_ms": round(t_coll / 1e3, 3),
            "compute_ms": round(t_comp / 1e3, 3),
            "union_ms": round(t_union / 1e3, 3),
            "overlap_fraction": (round((t_coll + t_comp - t_union) / denom, 4)
                                 if denom else 0.0),
        }
    result = {"trace": path, "devices": per_device}
    if not per_device:
        result["note"] = (
            "no device-process timeline in this trace (the CPU backend "
            "emits host events only) — rerun the probe on real TPU/GPU "
            "hardware; device processes appear automatically there")
    return result


if __name__ == "__main__":
    out = analyze(sys.argv[1] if len(sys.argv) > 1 else "/tmp/halo_trace")
    print(json.dumps(out, indent=2))
