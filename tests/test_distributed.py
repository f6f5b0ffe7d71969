"""Two-process jax.distributed smoke test on localhost.

Executes the multi-process code path (parallel/distributed.py) that a
real multi-host TPU job would use: a coordinator + worker process pair,
DCN-aware host mesh (data across hosts, map inside), one sharded DCReg
registration, compared against the single-process engine.  This is the
only environment-independent way to validate the axis layout claim
without a TPU pod (SURVEY.md section 2.9; BASELINE.json north-star)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_registration(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # a clean slate: the parent's JAX/XLA settings must not leak
    env.pop("XLA_FLAGS", None)
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, str(i), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            assert p.returncode == 0, (
                f"worker failed rc={p.returncode}\n--- stdout ---\n"
                f"{out[-2000:]}\n--- stderr ---\n{err[-4000:]}")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = [json.load(open(o)) for o in outs]
    # both processes hold the same replicated result
    np.testing.assert_allclose(results[0]["t"], results[1]["t"], atol=0)
    np.testing.assert_allclose(results[0]["R"], results[1]["R"], atol=0)
    assert results[0]["converged"]
    assert results[0]["block_overflow"] == 0

    # single-process oracle (in this process: CPU, f64 via conftest)
    import jax.numpy as jnp
    from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
    from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
    from dcreg_tpu.ops import se3
    sys.path.insert(0, os.path.dirname(WORKER))
    from distributed_worker import scene
    source, target = scene()
    pose = jnp.array([0.01, -0.02, 0.03, 0.05, -0.04, 0.06])
    R0 = se3.euler_zyx_to_rot(pose[0], pose[1], pose[2])
    ref = icp_point_to_plane_so3(
        source, target, R0, pose[3:],
        DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, ICPParams(max_iterations=8))
    np.testing.assert_allclose(np.asarray(results[0]["t"]),
                               np.asarray(ref.t), atol=1e-8)
    np.testing.assert_allclose(np.asarray(results[0]["R"]),
                               np.asarray(ref.R), atol=1e-8)
    assert results[0]["iterations"] == int(ref.iterations)
