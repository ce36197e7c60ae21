r"""Multi-host runtime: process init, (host, chip) meshes, primary-only I/O.

New design — the reference is single-process/single-GPU (SURVEY.md §2.1-E,
§5 "Distributed communication backend: absent"). This module is the entry
path for running the framework on a multi-host TPU pod slice:

  * `init_distributed()` wires `jax.distributed.initialize` from explicit
    args, SGTPU_* env vars, or the TPU metadata autodetect.
  * `make_data_mesh()` — 1D mesh over all global devices (view-DP: each chip
    renders a different view; gradients ride ICI within a host and DCN
    across hosts through the same psum).
  * `make_view_band_mesh()` — 2D (view=host, band=chip) mesh: each host
    trains a different view whose tile bands are sharded over that host's
    chips, so the band-psum (big: per-pixel transposes) stays on ICI and
    only the parameter-grad psum crosses DCN once per step.
  * `is_primary()` + `primary_only` gate logging/checkpoint/PLY writes to
    process 0 (every process computes identically; only one writes).

Launch recipe (2 hosts):
    # host 0                                   # host 1
    SGTPU_COORDINATOR=10.0.0.1:8476 \
    SGTPU_NUM_PROCS=2 SGTPU_PROC_ID=0 \        ... SGTPU_PROC_ID=1 \
    python train.py cfg.yaml pipeline.distributed=true
On Cloud TPU pods, plain `pipeline.distributed=true` suffices: with no
SGTPU_* vars `jax.distributed.initialize()` autodetects from the TPU
metadata server. `tools/launch_multihost.py` runs an N-process CPU-mesh
rehearsal of the same path on one machine.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process runtime. Returns True if distributed.

    Resolution order: explicit args > SGTPU_COORDINATOR/SGTPU_NUM_PROCS/
    SGTPU_PROC_ID env vars > bare `jax.distributed.initialize()` autodetect
    (Cloud TPU metadata). A no-op single-process fallback keeps every entry
    point usable unlaunched.
    """
    coordinator = coordinator or os.environ.get("SGTPU_COORDINATOR")
    if num_processes is None and "SGTPU_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["SGTPU_NUM_PROCS"])
    if process_id is None and "SGTPU_PROC_ID" in os.environ:
        process_id = int(os.environ["SGTPU_PROC_ID"])
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    try:  # Cloud TPU pod autodetect; raises when no env is present
        jax.distributed.initialize()
        return jax.process_count() > 1
    except Exception:
        return False


def is_primary() -> bool:
    return jax.process_index() == 0


def primary_only(fn):
    """Run `fn` only on process 0 (logging, checkpoint, PLY writes)."""

    @functools.wraps(fn)
    def wrapped(*a, **k):
        if is_primary():
            return fn(*a, **k)
        return None

    return wrapped


def primary_print(*a, **k):
    if is_primary():
        print(*a, **k)


def _global_devices() -> list:
    # Stable (process, local id) order so meshes agree across processes.
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def make_data_mesh(axis_name: str = "data") -> Mesh:
    """1D mesh over all global devices (view-DP across hosts and chips)."""
    return Mesh(np.array(_global_devices()), (axis_name,))


def make_view_band_mesh(
    axis_view: str = "view", axis_band: str = "band"
) -> Mesh:
    """2D (host, chip-in-host) mesh: views across hosts (DCN), tile bands
    across each host's chips (ICI)."""
    devs = _global_devices()
    nproc = jax.process_count()
    if len(devs) % nproc:
        raise ValueError(
            f"{len(devs)} devices not divisible by {nproc} processes"
        )
    arr = np.array(devs).reshape(nproc, len(devs) // nproc)
    return Mesh(arr, (axis_view, axis_band))


def global_batch_from_local(local_tree, mesh: Mesh, axis: str):
    """Assemble a global batch array from per-process local leaves.

    Each process passes its local stack (leading axis = its share); the
    result is a global jax.Array sharded over `axis` whose global leading
    dim is process_count * local. Single-process: plain device_put.
    """
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        s = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(s, np.asarray(x), global_shape)

    return jax.tree.map(put, local_tree)
