"""Benchmark: DCReg ("Ours") registration on the cylinder ill-conditioned
benchmark -- the reference's headline scenario (supp.pdf Table I: 7.79 ms /
registration on an 8-thread workstation CPU, 2.71 cm / 0.05 deg error).

Metric: registrations/second/chip for the FULL degeneracy-aware pipeline
(5-NN search + plane fits + robust weights + 6x6 GN + Schur analysis +
targeted-PCG solve, iterated to convergence), measured over a vmapped batch
of Monte-Carlo-perturbed initial poses -- the reference's own num_runs
statistics mode (icp_test_runner.cpp:604-664), run as one device program.
Accuracy gates the number: a run only counts if the batch-mean error stays
inside the reference envelope (TE < 5 cm, RE < 0.5 deg vs recorded
2.71 cm / 0.05 deg).

Prints ONE JSON line:
  {"metric": ..., "value": reg_per_sec, "unit": "reg/s/chip",
   "vs_baseline": value / (1000 / 7.79), ...extras}
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MS = 7.79          # supp.pdf Table I, "Ours" cylinder time
BASELINE_REG_S = 1000.0 / BASELINE_MS
BATCH = 32

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"


def main():
    import jax
    import jax.numpy as jnp
    import dcreg_tpu
    dcreg_tpu.enable_compile_cache(jax.default_backend())
    from dcreg_tpu.io.pcd import load_pcd
    from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
    from dcreg_tpu.ops.correspondence import CorrespondenceParams
    from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
    from dcreg_tpu.ops.block_sparse import (build_block_index, morton_argsort,
                                            suggest_num_blocks)
    from dcreg_tpu.ops import se3

    dtype = jnp.float32
    xyz = load_pcd(CYL)["xyz"]
    # spatial index: Morton-sort + block index built ONCE per target, shared
    # across every Monte-Carlo run and iteration (the reference's KD-tree
    # build, utils.hpp:393-424)
    perm = morton_argsort(xyz)
    xyz = np.asarray(xyz)[perm]
    source = jnp.asarray(xyz, dtype)
    target = source
    index = build_block_index(xyz, dtype=dtype)
    T_gt = jnp.eye(4, dtype=dtype)

    # Monte-Carlo initial poses around the configured noise
    # (config/icp.yaml:36-48: rpy (0.1, 0.1, 2.0) deg, t (0.2, 0.8, 0.5))
    rng = np.random.default_rng(0)
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    poses = nominal[None, :] * rng.uniform(0.8, 1.2, (BATCH, 6))
    poses = jnp.asarray(poses, dtype)

    # candidate-block cap: exact max over the initial poses AND the
    # converged (identity) pose, + margin (block_knn reports overflow = 0)
    import dcreg_tpu.ops.se3 as se3np
    samples = [xyz]
    for p in np.asarray(poses):
        Rm = np.asarray(se3.euler_zyx_to_rot(*[jnp.asarray(v, dtype)
                                               for v in p[:3]]), np.float64)
        samples.append(xyz @ Rm.T + p[3:])
    G = max(suggest_num_blocks(index, s, 1.0) for s in samples)
    params = ICPParams(corr=CorrespondenceParams(num_blocks=G))

    def one(pose):
        R0 = se3.euler_zyx_to_rot(pose[0], pose[1], pose[2])
        t0 = pose[3:]
        r = icp_point_to_plane_so3(
            source, target, R0, t0,
            DetectionMethod.SCHUR_CONDITION_NUMBER,
            HandlingMethod.PRECONDITIONED_CG, params, T_gt=T_gt, grid=index)
        return r.t, r.R, r.converged, r.iterations, r.log.trans_error, \
            r.log.rot_error_deg

    batched = jax.jit(jax.vmap(one))

    # warmup / compile
    out = jax.block_until_ready(batched(poses))
    # timed
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(batched(poses))
    dt = (time.perf_counter() - t0) / reps
    reg_per_sec = BATCH / dt

    t_fin, R_fin, converged, iters, te_log, re_log = map(np.asarray, out)
    # final errors: last executed row of each run's log
    last = np.asarray(iters) - 1
    te = np.array([te_log[i, last[i]] for i in range(BATCH)])
    re = np.array([re_log[i, last[i]] for i in range(BATCH)])

    # single-registration latency (batch of 1)
    single = jax.jit(jax.vmap(one))
    p1 = poses[:1]
    jax.block_until_ready(single(p1))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(single(p1))
    single_ms = (time.perf_counter() - t0) / 10 * 1e3

    accuracy_ok = bool((te.mean() < 0.05) and (re.mean() < 0.5))
    value = reg_per_sec if accuracy_ok else 0.0
    print(json.dumps({
        "metric": "cylinder_DCReg_registrations_per_sec_chip",
        "value": round(float(value), 2),
        "unit": "reg/s/chip",
        "vs_baseline": round(float(value / BASELINE_REG_S), 3),
        "baseline_reg_per_sec": round(BASELINE_REG_S, 2),
        "batch": BATCH,
        "single_latency_ms": round(float(single_ms), 3),
        "te_mean_m": round(float(te.mean()), 5),
        "re_mean_deg": round(float(re.mean()), 5),
        "converged_frac": round(float(converged.mean()), 3),
        "iters_mean": round(float(iters.mean()), 2),
        "accuracy_ok": accuracy_ok,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
