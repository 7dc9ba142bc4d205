"""Multi-host runtime entry: jax.distributed + two-level ICI×DCN meshes.

The reference's distributed story is single-process MirroredStrategy
(reference demo/demo_distributed_gcn.py:52-57); on TPU pods the equivalent
is one JAX process per host, a global device mesh, and XLA collectives over
ICI within a slice / DCN across hosts (SURVEY §2.8, §5 "Distributed
communication backend"). This module is the per-host entry path:

- :func:`initialize` — per-host ``jax.distributed.initialize`` with env-var
  fallbacks (no-op when single-process).
- :func:`build_multihost_mesh` — device mesh in process-major order, either
  *two-level* (``data`` axis across hosts/DCN × ``graph`` axis across each
  host's local chips/ICI — the production layout: per-layer halo all_to_all
  rides ICI, one gradient psum per step crosses DCN) or *flat* (``graph``
  spanning every chip, for graphs too big for one host's HBM).
- :func:`distribute` — materialize a host-resident global array onto a
  (possibly multi-process) mesh; each process instantiates only the shards
  its local devices own, which is what makes per-host shard loading real:
  with a flat graph mesh every host holds only its own halo-plan rows.
- :func:`distribute_halo_plan` — per-host loading of a
  :class:`~tf_geometric_tpu.parallel.halo.HaloSpec` in the layout the
  sharded steps expect.

Verified by a real 2-process CPU cluster in tests/test_multihost.py (Gloo
collectives), asserting the sharded GCN step's loss matches the
single-process run bit-for-bit in both mesh layouts.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["initialize", "build_multihost_mesh", "distribute",
           "distribute_halo_plan"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Per-host ``jax.distributed.initialize`` with env fallbacks.

    Arguments default to ``TFG_COORDINATOR`` / ``TFG_NUM_PROCESSES`` /
    ``TFG_PROCESS_ID`` (and the JAX-standard env vars underneath). A no-op
    when no coordinator is configured (single-host run) or when the
    distributed runtime is already up.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("TFG_COORDINATOR")
    if num_processes is None and "TFG_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TFG_NUM_PROCESSES"])
    if process_id is None and "TFG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TFG_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single host
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as exc:
        # jax raises "distributed.initialize should only be called once."
        # (wording varies by version) — the documented no-op path
        msg = str(exc)
        if "already" not in msg and "only be called once" not in msg:
            raise


def _process_major_devices():
    import jax
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def build_multihost_mesh(graph_axis: str = "graph", data_axis: str = "data",
                         two_level: bool = True):
    """Build the global mesh in process-major device order.

    two_level=True  → axes ``(data, graph)`` = (num_processes,
    local_device_count): the ``graph`` axis's all_to_all/all_gather stay
    within one host (ICI), the ``data`` axis's psum crosses DCN once per
    step.  two_level=False → a flat ``(graph,)`` mesh over every device;
    graph collectives cross DCN (use when one host's HBM can't hold a
    partition replica).
    """
    import jax
    from jax.sharding import Mesh

    devs = _process_major_devices()
    nproc = jax.process_count()
    if two_level:
        local = len(devs) // nproc
        return Mesh(np.asarray(devs, object).reshape(nproc, local),
                    (data_axis, graph_axis))
    return Mesh(np.asarray(devs, object).reshape(len(devs)), (graph_axis,))


def distribute(mesh, spec, global_array):
    """Place a host-resident global numpy array onto ``mesh`` under ``spec``.

    Works in single- AND multi-process runs: each process materializes only
    the shards owned by its addressable devices (the callback is invoked
    per-local-shard with the global index), so per-host memory is the local
    shard set, not the global array.
    """
    import jax
    from jax.sharding import NamedSharding

    global_array = np.asarray(global_array)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        global_array.shape, sharding, lambda idx: global_array[idx])


def distribute_halo_plan(mesh, graph_axis: str, halo_spec) -> Tuple:
    """Per-host loading of a halo plan: each process instantiates only its
    devices' rows of every plan array (all sharded on the leading device
    dim — the layout ``make_graph_parallel_*_step`` expects). Handles both
    the COO :class:`~tf_geometric_tpu.parallel.halo.HaloSpec` (7 arrays) and
    the packed :class:`~tf_geometric_tpu.parallel.halo.HaloSpecEll`
    (23 arrays)."""
    from jax.sharding import PartitionSpec as P

    if hasattr(halo_spec, "local"):  # HaloSpecEll
        from .halo import ell_plan_specs
        arrays = ((halo_spec.send_idx,) + tuple(halo_spec.local)
                  + tuple(halo_spec.remote))
        specs = ell_plan_specs(halo_spec, graph_axis)
    else:
        # same ordering as sharded._plan_arrays
        arrays = (halo_spec.send_idx, halo_spec.loc_row, halo_spec.loc_col,
                  halo_spec.loc_val, halo_spec.rem_row, halo_spec.rem_addr,
                  halo_spec.rem_val)
        specs = (P(graph_axis, None, None),) + (P(graph_axis, None),) * 6
    return tuple(distribute(mesh, s, a) for s, a in zip(specs, arrays))
