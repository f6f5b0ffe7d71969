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


def toy_scene(n_src, n_tgt, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-8.0, 8.0, (n_tgt, 2))
    z = 0.6 * np.sin(0.6 * xy[:, 0]) + 0.5 * np.cos(0.4 * xy[:, 1])
    target = np.column_stack([xy, z])
    src = target[rng.choice(n_tgt, n_src, replace=False)]
    return jnp.asarray(src, dtype), jnp.asarray(target, dtype)


def main():
    per_shard = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    params = ICPParams(max_iterations=10, full_telemetry=False)
    results = []
    base_per_dev = None
    for n in N_DEVICES:
        if n > len(jax.devices()):
            break
        dp, mp = factor_mesh(n)
        mesh = make_mesh(dp, mp)
        source, target = toy_scene(per_shard * dp, 2 * per_shard * mp,
                                   seed=1)
        src_p, src_v = shard_points(source, dp)
        tgt_p, tgt_v = shard_points(target, mp)
        R0 = jnp.eye(3, dtype=jnp.float32)
        t0 = jnp.asarray([0.05, -0.04, 0.06], jnp.float32)

        def run():
            return sharded_icp_register(
                mesh, src_p, tgt_p, R0, t0,
                DetectionMethod.SCHUR_CONDITION_NUMBER,
                HandlingMethod.PRECONDITIONED_CG, params,
                source_valid=src_v, target_valid=tgt_v)
        jax.block_until_ready(run())          # compile
        reps = 3
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
            points=int(src_p.shape[0]),
            time_per_iter_ms=round(per_iter * 1e3, 2),
            efficiency=round(base_per_dev / per_iter, 3),
            iterations=iters))
        print(json.dumps(results[-1]))
    print(json.dumps({
        "metric": "weak_scaling_efficiency_virtual_cpu_mesh",
        "value": results[-1]["efficiency"] if results else 0.0,
        "note": "virtual devices validate sharding/collective structure, "
                "not ICI/DCN bandwidth; rerun per-host on real slices"}))


if __name__ == "__main__":
    main()
