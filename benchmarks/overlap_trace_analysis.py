"""Compute the collective/compute overlap fraction from a jax.profiler trace.

Companion to benchmarks/halo_overlap.py (VERDICT r2 #9): the wall-clock
decomposition there can only *infer* overlap; this script settles it from
the profiler's own event timeline. Run the probe with a trace:

    TFG_SCALING_REAL=1 TFG_TRACE_DIR=/tmp/halo_trace \
        python benchmarks/halo_overlap.py          # on a real pod slice
    python benchmarks/overlap_trace_analysis.py /tmp/halo_trace

Methodology: parse the XSpace protobuf the profiler writes, take every
device line, classify events as COLLECTIVE (all-to-all / all-reduce /
all-gather / collective-permute / reduce-scatter, including fusions whose
name embeds one) or COMPUTE (everything else executing on the device), and
merge each class's intervals. Then per device:

    overlap_fraction = (t_coll + t_comp - t_union) / min(t_coll, t_comp)

1.0 → the cheaper class is fully hidden under the other; 0 → perfectly
serialized. On TPU the collectives run on the DMA engines, so a trace from
real hardware is the authoritative answer to whether the halo exchange
hides under local aggregation (parallel/halo.py:19-23); on the CPU backend
thunks serialize and this reports ~0 (the known lower bound, SCALING.md).
"""
import glob
import json
import os
import sys

COLLECTIVE_MARKERS = ("all-to-all", "all-reduce", "all-gather",
                      "collective-permute", "reduce-scatter", "all-to-all-start",
                      "ncclAllToAll", "cross-replica")


def _find_xspace(trace_dir):
    pats = [os.path.join(trace_dir, "**", "*.xplane.pb")]
    files = []
    for p in pats:
        files.extend(glob.glob(p, recursive=True))
    if not files:
        raise SystemExit(f"no .xplane.pb under {trace_dir} — did the probe "
                         "run with TFG_TRACE_DIR set?")
    return max(files, key=os.path.getmtime)


def _merged_duration(intervals):
    total, cur_start, cur_end = 0, None, None
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
    from tensorflow.core.profiler.protobuf import xplane_pb2

    path = _find_xspace(trace_dir)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    per_device = {}
    for plane in space.planes:
        name = plane.name
        # device planes: "/device:TPU:0", "/device:CPU:0" XLA lines, GPU streams
        if not (name.startswith("/device") or "TPU" in name or "XLA" in name):
            continue
        ev_names = dict(plane.event_metadata)
        coll, comp = [], []
        for line in plane.lines:
            for ev in line.events:
                meta = ev_names.get(ev.metadata_id)
                ename = meta.name.lower() if meta is not None else ""
                start = ev.offset_ps
                end = ev.offset_ps + ev.duration_ps
                if ev.duration_ps <= 0:
                    continue
                if any(m in ename for m in COLLECTIVE_MARKERS):
                    coll.append((start, end))
                else:
                    comp.append((start, end))
        if not coll and not comp:
            continue
        t_coll = _merged_duration(coll)
        t_comp = _merged_duration(comp)
        t_union = _merged_duration(coll + comp)
        denom = min(t_coll, t_comp)
        overlap = (t_coll + t_comp - t_union) / denom if denom else 0.0
        per_device[name] = {
            "collective_ms": round(t_coll / 1e9, 3),
            "compute_ms": round(t_comp / 1e9, 3),
            "union_ms": round(t_union / 1e9, 3),
            "overlap_fraction": round(overlap, 4),
        }
    return {"xspace": path, "devices": per_device}


if __name__ == "__main__":
    out = analyze(sys.argv[1] if len(sys.argv) > 1 else "/tmp/halo_trace")
    print(json.dumps(out, indent=2))
