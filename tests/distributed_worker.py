"""Worker for the two-process jax.distributed smoke test (spawned by
tests/test_distributed.py, one process per fake 'host').

Each process forces 2 virtual CPU devices, joins the coordinator, builds
the DCN-aware host mesh (data axis across hosts, map axis inside each
host -- parallel/distributed.make_host_mesh), runs one sharded DCReg
registration, and writes its replicated result to a JSON file for the
parent to compare against the single-process engine.
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from dcreg_tpu.parallel.distributed import init_distributed, make_host_mesh
from dcreg_tpu.parallel import shard_points, sharded_icp_register
from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.ops.block_sparse import morton_argsort
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.ops import se3


def scene(n=512, m=1024, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-5, 5, (m, 2))
    z = 0.1 * np.sin(xy[:, 0]) * np.cos(xy[:, 1]) + rng.normal(0, 0.002, m)
    target = np.column_stack([xy, z])
    target = target[morton_argsort(target)]
    source = target[rng.choice(m, n, replace=False)]
    return (jnp.asarray(source, jnp.float64),
            jnp.asarray(target, jnp.float64))


def main():
    coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    ok = init_distributed(coordinator_address=coord, num_processes=2,
                          process_id=pid)
    assert ok, "init_distributed returned False in a 2-process job"
    # a second call must be benign (the 'already initialized' path)
    ok2 = init_distributed(coordinator_address=coord, num_processes=2,
                           process_id=pid)
    assert ok2, "re-init was not treated as benign"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    mesh = make_host_mesh(map_per_host=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"data": 2, "map": 2}
    # DCN-outer layout: each row of the data axis must be one host
    procs = [[d.process_index for d in row] for row in mesh.devices]
    assert procs == [[0, 0], [1, 1]], procs

    source, target = scene()
    pose = jnp.array([0.01, -0.02, 0.03, 0.05, -0.04, 0.06])
    R0 = se3.euler_zyx_to_rot(pose[0], pose[1], pose[2])
    t0 = pose[3:]
    params = ICPParams(max_iterations=8)
    src_p, src_v = shard_points(source, 2)
    tgt_p, tgt_v = shard_points(target, 2, block=32)
    res = sharded_icp_register(
        mesh, src_p, tgt_p, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params,
        source_valid=src_v, target_valid=tgt_v)
    out = {
        "process": pid,
        "t": np.asarray(res.t).tolist(),
        "R": np.asarray(res.R).tolist(),
        "iterations": int(res.iterations),
        "converged": bool(res.converged),
        "block_overflow": int(res.block_overflow),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print("worker", pid, "done", flush=True)


if __name__ == "__main__":
    main()
