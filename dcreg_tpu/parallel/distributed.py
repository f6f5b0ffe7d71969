"""Multi-host (multi-process) scaffolding: jax.distributed init + host mesh.

The reference is strictly single-process (SURVEY.md section 2.9); the
TPU-native scale-out runs one process per host, each owning its local
chips, with XLA collectives riding ICI inside a slice and DCN across
hosts.  Axis layout follows the scaling-book recipe: the OUTER mesh axis
(data) spans hosts so the per-iteration 42-float psum is the only DCN
traffic, while the map axis -- whose all_gather moves real candidate
bytes -- stays INSIDE each host on ICI.

Real N-host numbers need N hosts; everything here also works on a single
process with virtual devices (tests / scripts/bench_scaling.py), which
validates shardings and collective layouts but measures no DCN.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh

from .sharded import make_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host run.

    All-None on TPU pods uses the TPU environment's auto-detection; on
    CPU/GPU fleets pass coordinator ("host:port"), num_processes and
    process_id explicitly.  Returns True if distributed mode is active
    (more than one process), False for single-process runs (no-op).
    """
    already = getattr(jax.distributed, "is_initialized", lambda: False)()
    if already:
        # benign: a second init call in a live multi-host job
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        msg = str(e).lower()
        if "already initialized" in msg or "must be called before" in msg:
            return jax.process_count() > 1
        if jax.process_count() <= 1:
            # single-process environment: distributed mode unavailable
            return False
        raise
    return jax.process_count() > 1


def make_host_mesh(map_per_host: int | None = None) -> Mesh:
    """(data, map) mesh over ALL processes' devices, DCN-aware.

    ``jax.devices()`` enumerates devices grouped by process; keeping the
    map axis within one process's device block keeps its all_gather on
    ICI.  map_per_host defaults to the largest {1,2,3} factor of the
    local device count.
    """
    devices = jax.devices()
    local = max(jax.local_device_count(), 1)
    if map_per_host is None:
        map_per_host = next((f for f in (3, 2) if local % f == 0), 1)
    n_map = map_per_host
    n_data = len(devices) // n_map
    return make_mesh(n_data, n_map, devices=devices)
