"""Benchmark: DCReg ("Ours") registration on the cylinder ill-conditioned
benchmark -- the reference's headline scenario (supp.pdf Table I: 7.79 ms /
registration on an 8-thread workstation CPU, 2.71 cm / 0.05 deg error).

Metric: registrations/second/chip for the FULL degeneracy-aware pipeline
(5-NN search + plane fits + robust weights + 6x6 GN + Schur analysis +
targeted-PCG solve, iterated to convergence, with the reference's full
per-iteration telemetry reconstructed), measured over a batch of
Monte-Carlo-perturbed initial poses -- the reference's own num_runs
statistics mode (icp_test_runner.cpp:604-664) run as ONE device program
through the batched block-sparse engine (models/icp_batch.py).
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
BATCH = int(__import__("os").environ.get("DCREG_BENCH_BATCH", "32"))

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"


def main():
    import jax
    import jax.numpy as jnp
    import dcreg_tpu
    dcreg_tpu.enable_compile_cache(jax.default_backend())
    from dcreg_tpu.io.pcd import load_pcd
    from dcreg_tpu.models.icp import ICPParams
    from dcreg_tpu.models.icp_batch import icp_batch_so3, estimate_num_pairs
    from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
    from dcreg_tpu.ops.block_sparse import build_block_index, morton_argsort
    from dcreg_tpu.ops import se3

    dtype = jnp.float32
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    # spatial index: Morton sort + 128-point block index, built ONCE per
    # target and shared across every Monte-Carlo run and iteration (the
    # reference's one-time KD-tree build, utils.hpp:393-424)
    perm = morton_argsort(xyz)
    xyz = xyz[perm]
    source = jnp.asarray(xyz, dtype)
    target = source
    index = build_block_index(xyz, dtype=dtype, tb=128)
    T_gt = jnp.eye(4, dtype=dtype)
    params = ICPParams()

    # Monte-Carlo initial poses around the configured noise
    # (config/icp.yaml:36-48: rpy (0.1, 0.1, 2.0) deg, t (0.2, 0.8, 0.5)).
    # The reference's num_runs statistics mode re-runs the SAME configured
    # pose every run (icp_test_runner.cpp:339-357); the +-2% jitter here
    # keeps lanes numerically distinct without changing the problem the
    # recorded 7.79 ms / 2.71 cm row solved.
    rng = np.random.default_rng(0)
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    poses = nominal[None, :] * rng.uniform(0.98, 1.02, (BATCH, 6))
    R0s = jnp.stack([se3.euler_zyx_to_rot(*map(jnp.asarray, p[:3]))
                     for p in poses]).astype(dtype)
    t0s = jnp.asarray(poses[:, 3:], dtype)

    # static pair-list capacity from the initial + converged pose envelope
    P = estimate_num_pairs(
        index, xyz, [(np.asarray(R0s[i], np.float64), poses[i, 3:])
                     for i in range(BATCH)], params.corr.search_radius)

    def run(R0s_, t0s_):
        return icp_batch_so3(source, target, R0s_, t0s_,
                             DetectionMethod.SCHUR_CONDITION_NUMBER,
                             HandlingMethod.PRECONDITIONED_CG, params,
                             index, P, T_gt=T_gt)

    # warmup / compile
    out = jax.block_until_ready(run(R0s, t0s))
    assert int(out.pair_overflow) == 0, "pair-list overflow; raise margin"
    # timed
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(run(R0s, t0s))
    dt = (time.perf_counter() - t0) / reps
    reg_per_sec = BATCH / dt

    iters = np.asarray(out.iterations)
    te_log = np.asarray(out.log.trans_error)
    re_log = np.asarray(out.log.rot_error_deg)
    last = iters - 1
    te = np.array([te_log[i, last[i]] for i in range(BATCH)])
    re = np.array([re_log[i, last[i]] for i in range(BATCH)])
    converged = np.asarray(out.converged)

    # single-registration latency (batch of 1)
    r1, t1 = R0s[:1], t0s[:1]
    single = jax.jit(lambda a, b: icp_batch_so3(
        source, target, a, b, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params, index, P, T_gt=T_gt))
    jax.block_until_ready(single(r1, t1))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(single(r1, t1))
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
        "num_pairs": int(P),
        "accuracy_ok": accuracy_ok,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
