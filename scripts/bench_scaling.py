"""Weak-scaling benchmark of the sharded registration path.

Measures the sharded engine at mesh sizes 1, 2, 4, 8 with the per-device
problem size held constant (weak scaling): N source points per data shard,
M map points per map shard.  Total work grows n-fold, so ideal weak
scaling keeps per-iteration wall time FLAT; efficiency =
(time_per_iter at 1 device) / (time_per_iter at n devices).

HONEST CAVEAT: with no multi-chip hardware attached this runs on VIRTUAL
CPU devices (xla_force_host_platform_device_count), which validates the
shardings + collective layout and measures the collective/compute
structure, but NOT real ICI/DCN bandwidth.  On a real slice, run under
one process per host after parallel.distributed.init_distributed(); the
BASELINE.json north-star is >=80% weak-scaling efficiency at N>=2 hosts.

Usage:  python scripts/bench_scaling.py [points_per_shard]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = (1, 2, 4, 8)
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={max(N_DEVICES)}").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.parallel import (factor_mesh, make_mesh, shard_points,
                                sharded_icp_register)


from dcreg_tpu.ops.block_sparse import morton_argsort


def toy_scene(n_src, n_tgt, seed=0, dtype=jnp.float32, extent=None):
    """Structured surface world, Morton-sorted (the block-culled sharded
    search needs spatially compact blocks).  ``extent`` scales with point
    count by default so density (and hence neighborhood occupancy per
    query) stays constant as shards grow -- the honest weak-scaling
    setup."""
    rng = np.random.default_rng(seed)
    if extent is None:
        extent = max(8.0, 0.12 * np.sqrt(n_tgt))
    xy = rng.uniform(-extent, extent, (n_tgt, 2))
    z = 0.6 * np.sin(0.6 * xy[:, 0]) + 0.5 * np.cos(0.4 * xy[:, 1])
    target = np.column_stack([xy, z])
    target = target[morton_argsort(target)]
    # source = a DENSE local disc (a scan sees a contiguous neighborhood
    # at full density); a sparse random subsample would make each
    # 128-query block span tens of meters and defeat block culling
    density = n_tgt / (2 * extent) ** 2
    r_disc = np.sqrt(1.3 * n_src / density / np.pi)
    # center the disc INSIDE a Morton quadrant: a disc at the origin
    # straddles the top-level Z-order seam, giving a few query blocks
    # map-spanning bboxes
    cx, cy = 0.45 * extent, 0.4 * extent
    in_disc = ((target[:, 0] - cx) ** 2
               + (target[:, 1] - cy) ** 2) < r_disc ** 2
    src = target[in_disc][:n_src]
    if src.shape[0] < n_src:                       # top up, keep sorted
        src = target[in_disc]
    return jnp.asarray(src, dtype), jnp.asarray(target, dtype)


def main():
    # default 100k map points per shard: the block-culled path makes this
    # regime viable (the dense per-shard matrix would be n x 200k)
    per_shard = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_src_per_shard = min(per_shard, 4096)
    params = ICPParams(max_iterations=10, full_telemetry=False)
    results = []
    base_per_dev = None
    for n in N_DEVICES:
        if n > len(jax.devices()):
            break
        dp, mp = factor_mesh(n)
        mesh = make_mesh(dp, mp)
        source, target = toy_scene(n_src_per_shard * dp, per_shard * mp,
                                   seed=1)
        src_p, src_v = shard_points(source, dp)
        tgt_p, tgt_v = shard_points(target, mp, block=32)
        R0 = jnp.eye(3, dtype=jnp.float32)
        t0 = jnp.asarray([0.05, -0.04, 0.06], jnp.float32)

        # two-level cull for big shards: per-iteration bbox work tracks
        # the neighborhood, not the shard's block count (a 1M-pt shard is
        # ~31k blocks -- the flat matrix would be nq x 31k per iteration)
        nbt_loc = tgt_p.shape[0] // mp // 32
        sup = dict(super_size=64, num_supers=48) if nbt_loc > 4096 else {}
        nb = 128 if nbt_loc > 4096 else 64

        def run():
            return sharded_icp_register(
                mesh, src_p, tgt_p, R0, t0,
                DetectionMethod.SCHUR_CONDITION_NUMBER,
                HandlingMethod.PRECONDITIONED_CG, params,
                source_valid=src_v, target_valid=tgt_v,
                num_blocks=nb, **sup)
        jax.block_until_ready(run())          # compile
        reps = 5
        t0_ = time.perf_counter()
        for _ in range(reps):
            res = jax.block_until_ready(run())
        dt = (time.perf_counter() - t0_) / reps
        iters = max(int(res.iterations), 1)
        per_iter = dt / iters
        if base_per_dev is None:
            base_per_dev = per_iter
        results.append(dict(
            devices=n, mesh=f"{dp}x{mp}", time_ms=round(dt * 1e3, 2),
            points=int(src_p.shape[0]), map_points=int(tgt_p.shape[0]),
            time_per_iter_ms=round(per_iter * 1e3, 2),
            efficiency=round(base_per_dev / per_iter, 3),
            block_overflow=int(res.block_overflow),
            iterations=iters))
        print(json.dumps(results[-1]))
    print(json.dumps({
        "metric": "weak_scaling_efficiency_virtual_cpu_mesh",
        "value": results[-1]["efficiency"] if results else 0.0,
        "per_shard_map_points": per_shard,
        "note": "virtual devices validate sharding/collective structure, "
                "not ICI/DCN bandwidth; rerun per-host on real slices"}))


if __name__ == "__main__":
    main()
