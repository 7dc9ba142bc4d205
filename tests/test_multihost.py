"""Multi-host (2-process jax.distributed) correctness vs single-process.

Spawns a real 2-process CPU cluster (4 virtual devices each, Gloo
collectives — tests/_multihost_worker.py), runs 3 edge-partitioned halo-GCN
training steps with per-process shard loading, and asserts the losses match
the single-process 8-device run of the exact same problem. Covers both mesh
layouts from parallel/multihost.build_multihost_mesh:

- two-level (data=2 hosts × graph=4 local devices — ICI×DCN layout)
- flat (graph=8 spanning both processes — halo all_to_all crosses hosts)

Reference match: SURVEY §2.8 comm-backend row ("jax.distributed init per
host … DCN across slices"), replacing demo_distributed_gcn.py:52-57.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_losses(two_level, layout="coo"):
    """Oracle: the same problem on this process's 8 virtual devices."""
    sys.path.insert(0, HERE)
    import _multihost_worker as w

    from tf_geometric_tpu.parallel.sharded import build_mesh

    num_parts = 4 if two_level else 8
    x_p, y_p, mask, halo, params, hidden, num_classes = w.build_problem(
        num_parts, layout=layout)
    if two_level:
        mesh = build_mesh({"data": 2, "graph": 4})
    else:
        mesh = build_mesh({"graph": 8})
    return w.run_steps(mesh, "graph", x_p, y_p, mask, halo, params, hidden,
                       num_classes)


def _run_cluster(two_level, layout="coo"):
    import tempfile
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # stdout to FILES: a worker blocked on a full pipe stalls its Gloo
    # collectives and deadlocks the other worker until the timeout
    logs = [tempfile.NamedTemporaryFile("w+", suffix=f".mh{pid}.log")
            for pid in (0, 1)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
         str(port), str(pid), str(int(two_level)), layout],
        stdout=logs[pid], stderr=subprocess.STDOUT, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p, log in zip(procs, logs):
            p.wait(timeout=240)
            log.flush()
            log.seek(0)
            out = log.read()
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES")]
        assert line, out[-3000:]
        losses.append([float(v) for v in line[-1].split()[1:]])
    return losses


@pytest.mark.parametrize("two_level,layout",
                         [(True, "coo"), (False, "coo"), (False, "ell")],
                         ids=["ici_x_dcn", "flat_graph_over_dcn",
                              "flat_graph_ell_plan"])
def test_two_process_cluster_matches_single_process(two_level, layout):
    expected = _single_process_losses(two_level, layout)
    got = _run_cluster(two_level, layout)
    # both processes must agree (replicated loss) …
    np.testing.assert_allclose(got[0], got[1], rtol=0, atol=0)
    # … and match the single-process oracle
    np.testing.assert_allclose(got[0], expected, rtol=1e-5, atol=1e-6)
