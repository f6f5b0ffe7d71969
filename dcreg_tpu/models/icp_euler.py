"""Euler-parameterized (LOAM-faithful) point-to-plane ICP engine.

Rebuild of ``TestRunner::Point2PlaneICP`` (icp_test_runner.cpp:2064-2831) --
the engine the paper's baseline numbers use when
``use_so3_parameterization`` is false.  Kept behaviorally faithful:

  * LOAM's coordinate swap (x <- y, y <- z, z <- x) applied to both points
    and (weighted) normals before the trig Jacobian (:2307-2336);
  * Jacobian row ordering [arz, arx, ary, n_z', n_x', n_y'] (:2339-2344);
  * additive Euler update (:2633-2638);
  * convergence on |delta rmse| and |delta fitness| < 1e-4 (:2678-2687);
  * Euler covariance mapped through computeEulerToLieJacobian (:2712-2727).

The Jacobian here comes from the derivative of R(yaw)R(pitch)R(roll) in the
swapped LOAM frame; unlike the SO3 engine, weight-derivative scaling never
applies (the reference's Euler loop uses the weighted normal directly).
Shares the correspondence/analysis/solve stack with the SO3 engine, and the
same two-pass structure (minimal while_loop + batched telemetry
reconstruction from the pose history -- see icp.py docstring).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import linalg, se3
from ..ops.correspondence import find_correspondences
from ..ops.degeneracy import DetectionMethod, HandlingMethod, analyze
from ..ops.solvers import solve
from .icp import ICPParams, ICPResult, IterationLog, _empty_log
from ..utils import precise_jit


def _euler_jacobian_rows(points, weighted_normals, pose,
                         faithful: bool = False):
    """LOAM trig Jacobian rows (icp_test_runner.cpp:2299-2344), vectorized.

    points: (N, 3) body frame; weighted_normals: (N, 3) = s * n;
    pose: (6,) [roll, pitch, yaw, x, y, z].
    Returns (N, 6) rows ordered [d/droll, d/dpitch, d/dyaw, dx, dy, dz].

    ``faithful=False`` (default) returns the EXACT derivative of
    n . (R(pose) p + t) under the engine's own ZYX composition
    (se3.pose6d_to_matrix == utils.hpp:452-460) -- verified to machine
    precision against jax.grad (tests/test_jacobian_oracles.py).

    ``faithful=True`` reproduces the reference formula verbatim.  The
    reference inherited LIO-SAM's camera-frame trig Jacobian but dropped
    the lidar->camera swap of the NORMAL inside the rotation columns
    (icp_test_runner.cpp:2326-2339 multiplies the angle-derivative groups
    by coeff.z/coeff.x/coeff.y where the exact derivative of its own
    Pose6D2Matrix needs coeff.x/coeff.y/coeff.z) -- the rotation block of
    J is a cyclic mis-permutation of the true gradient.  GN still
    converges on well-posed pairs (any J with J^T r = 0 at r = 0 shares
    the fixed point), which is why the reference's Euler-vs-SO3 oracle
    (icp_test_runner.h:66-102) never caught it.
    """
    srx, crx = jnp.sin(pose[1]), jnp.cos(pose[1])   # pitch
    sry, cry = jnp.sin(pose[2]), jnp.cos(pose[2])   # yaw
    srz, crz = jnp.sin(pose[0]), jnp.cos(pose[0])   # roll

    # LOAM axis swap for both point and normal
    px, py, pz = points[:, 1], points[:, 2], points[:, 0]
    cx, cy, cz = (weighted_normals[:, 1], weighted_normals[:, 2],
                  weighted_normals[:, 0])

    # multipliers of the three angle-derivative groups in arx/ary/arz:
    # exact = swapped normal (cx, cy, cz); faithful = the reference's
    # unswapped pattern (cz, cx, cy)
    if faithful:
        m1, m2, m3 = cz, cx, cy
    else:
        m1, m2, m3 = cx, cy, cz

    crx_sry = crx * sry
    crz_sry = crz * sry
    srx_sry = srx * sry
    srx_srz = srx * srz
    arx = ((crx_sry * srz * px + crx * crz_sry * py - srx_sry * pz) * m1
           + (-srx_srz * px - crz * srx * py - crx * pz) * m2
           + (crx * cry * srz * px + crx * cry * crz * py - cry * srx * pz) * m3)
    ary = (((cry * srx_srz - crz_sry) * px + (sry * srz + cry * crz * srx) * py
            + crx * cry * pz) * m1
           + ((-cry * crz - srx_sry * srz) * px + (cry * srz - crz * srx_sry) * py
              - crx_sry * pz) * m3)
    arz = (((crz * srx_sry - cry * srz) * px + (-cry * crz - srx_sry * srz) * py) * m1
           + (crx * crz * px - crx * srz * py) * m2
           + ((sry * srz + cry * crz * srx) * px + (crz_sry - cry * srx_srz) * py) * m3)
    return jnp.stack([arz, arx, ary, cz, cx, cy], axis=-1)


def icp_point_to_plane_euler(source_xyz, target_xyz, R0, t0,
                             detection: DetectionMethod,
                             handling: HandlingMethod,
                             params: ICPParams = ICPParams(),
                             T_gt=None, target_valid=None, source_valid=None,
                             num_source: int | None = None,
                             grid=None) -> ICPResult:
    """Euler/LOAM engine; same interface as icp_point_to_plane_so3."""
    from ..ops.degeneracy import detection_code, handling_code
    det = jnp.asarray(detection_code(detection), jnp.int32)
    hand = jnp.asarray(handling_code(handling), jnp.int32)
    return _icp_euler_impl(source_xyz, target_xyz, R0, t0, det, hand, params,
                           T_gt, target_valid, source_valid, num_source, grid)


@precise_jit(static_argnames=("params", "num_source"))
def _icp_euler_impl(source_xyz, target_xyz, R0, t0, detection, handling,
                    params: ICPParams,
                    T_gt=None, target_valid=None, source_valid=None,
                    num_source: int | None = None, grid=None) -> ICPResult:
    """(R0, t0) is converted to an Euler pose via MatrixToPose6D semantics
    and updated additively each iteration."""
    dtype = source_xyz.dtype
    I = params.max_iterations
    if T_gt is None:
        T_gt = jnp.eye(4, dtype=dtype)
    pose0 = se3.matrix_to_pose6d(se3.se3_matrix(R0.astype(dtype),
                                                t0.astype(dtype)))

    def one_iteration(pose, telemetry):
        T = se3.pose6d_to_matrix(pose)
        R, t = T[:3, :3], T[:3, 3]
        corr = find_correspondences(source_xyz, R, t, target_xyz,
                                    target_valid=target_valid,
                                    source_valid=source_valid,
                                    params=params.corr, chunk=params.chunk,
                                    grid=grid)
        s = jnp.where(corr.valid, corr.weight, 0.0).astype(dtype)
        wn = corr.normal * s[:, None]          # weighted normal s*n
        J = _euler_jacobian_rows(source_xyz, wn, pose)
        J = jnp.where(corr.valid[:, None], J, 0.0)
        b = -(s * corr.residual)
        H = J.T @ J
        g = J.T @ b

        n_valid = jnp.sum(corr.valid.astype(jnp.int32))
        raw_sq = jnp.where(corr.valid, corr.residual ** 2, 0.0)
        rmse = jnp.sqrt(jnp.sum(raw_sq) / jnp.maximum(n_valid, 1).astype(dtype))
        denom = (jnp.asarray(num_source, dtype) if num_source is not None
                 else jnp.asarray(source_xyz.shape[0], dtype))
        fitness = jnp.sum(corr.in_radius.astype(dtype)) / denom
        objective = 0.5 * jnp.sum(b * b)

        analysis = analyze(H, detection, params.thresholds)
        dx, sinfo = solve(H, g, handling, analysis, params.thresholds,
                          telemetry=telemetry)
        too_few = n_valid < params.min_effective_points
        bad_dx = ~jnp.all(jnp.isfinite(dx))
        abort_now = too_few | bad_dx
        dx = jnp.where(abort_now, jnp.zeros_like(dx), dx)
        pose_new = jnp.where(abort_now, pose, pose + dx)  # additive update
        return (pose_new, H, g, dx, rmse, fitness, objective, n_valid,
                analysis, sinfo, too_few, abort_now)

    # ---------------- pass 1: the optimization loop ----------------------
    # Records pose + (H, g, scalar stats) per iteration so pass 2 is pure
    # batched 6x6 work (no correspondence recompute) -- see icp.py.
    class Hist(NamedTuple):
        pose: jax.Array      # (I, 6) pose BEFORE iteration k
        H: jax.Array         # (I, 6, 6)
        g: jax.Array         # (I, 6)
        num_valid: jax.Array  # (I,) int32
        rmse: jax.Array      # (I,)
        fitness: jax.Array   # (I,)
        objective: jax.Array  # (I,)

    def body(state):
        (k, pose, prev_rmse, prev_fitness, converged, aborted, hist) = state
        (pose_new, H, g, dx, rmse, fitness, objective, n_valid, _, _,
         too_few, abort_now) = one_iteration(pose, False)
        hist = Hist(pose=hist.pose.at[k].set(pose), H=hist.H.at[k].set(H),
                    g=hist.g.at[k].set(g),
                    num_valid=hist.num_valid.at[k].set(
                        n_valid.astype(jnp.int32)),
                    rmse=hist.rmse.at[k].set(rmse),
                    fitness=hist.fitness.at[k].set(fitness),
                    objective=hist.objective.at[k].set(objective))
        # convergence: relative rmse AND fitness deltas < 1e-4 (:2678-2687)
        conv = (jnp.abs(rmse - prev_rmse) < 1e-4) & \
               (jnp.abs(fitness - prev_fitness) < 1e-4) & ~abort_now
        return (k + 1, pose_new, rmse, fitness, conv, abort_now, hist)

    def cond(state):
        k = state[0]
        converged, aborted = state[4], state[5]
        return (k < I) & ~converged & ~aborted

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    hist0 = Hist(pose=jnp.zeros((I, 6), dtype),
                 H=jnp.zeros((I, 6, 6), dtype), g=jnp.zeros((I, 6), dtype),
                 num_valid=jnp.zeros(I, jnp.int32),
                 rmse=jnp.full(I, jnp.nan, dtype),
                 fitness=jnp.full(I, jnp.nan, dtype),
                 objective=jnp.full(I, jnp.nan, dtype))
    init = (jnp.asarray(0, jnp.int32), pose0, big, jnp.asarray(0.0, dtype),
            jnp.asarray(False), jnp.asarray(False), hist0)
    (k, pose, _, _, converged, aborted, hist) = \
        jax.lax.while_loop(cond, body, init)
    H_last = hist.H[jnp.maximum(k - 1, 0)]

    # ---------------- pass 2: batched telemetry reconstruction -----------
    if params.full_telemetry:
        def telemetry_row(args):
            h, executed_k = args
            ana = analyze(h.H, detection, params.thresholds)
            dx, sinfo = solve(h.H, h.g, handling, ana, params.thresholds,
                              telemetry=True)
            too_few = h.num_valid < params.min_effective_points
            abort_now = too_few | ~jnp.all(jnp.isfinite(dx))
            dx = jnp.where(abort_now, jnp.zeros_like(dx), dx)
            pose_new = jnp.where(abort_now, h.pose, h.pose + dx)
            T_new = se3.pose6d_to_matrix(pose_new)
            te, re = se3.pose_error(T_gt, T_new)
            nanify = lambda x: jnp.where(
                executed_k, x, jnp.full_like(x, jnp.nan))
            return IterationLog(
                executed=executed_k & ~too_few,
                effective_points=jnp.where(executed_k, h.num_valid, 0
                                           ).astype(jnp.int32),
                corr_num=jnp.where(executed_k, h.num_valid, 0
                                   ).astype(jnp.int32),
                rmse=nanify(h.rmse), fitness=nanify(h.fitness),
                objective=nanify(h.objective),
                gradient=nanify(-h.g), dx=nanify(dx), transform=nanify(T_new),
                trans_error=nanify(te), rot_error_deg=nanify(re),
                eigenvalues_full=nanify(ana.eigenvalues_full),
                singular_values=nanify(ana.singular_values),
                lambda_schur_rot=nanify(ana.lambda_schur_rot),
                lambda_schur_trans=nanify(ana.lambda_schur_trans),
                V_schur_rot=nanify(ana.V_schur_rot),
                V_schur_trans=nanify(ana.V_schur_trans),
                lambda_diag_rot=nanify(ana.lambda_diag_rot),
                lambda_diag_trans=nanify(ana.lambda_diag_trans),
                cond_full=nanify(ana.cond_full),
                cond_schur_rot=nanify(ana.cond_schur_rot),
                cond_schur_trans=nanify(ana.cond_schur_trans),
                cond_diag_rot=nanify(ana.cond_diag_rot),
                cond_diag_trans=nanify(ana.cond_diag_trans),
                cond_full_sub_rot=nanify(ana.cond_full_sub_rot),
                cond_full_sub_trans=nanify(ana.cond_full_sub_trans),
                is_degenerate=ana.is_degenerate & executed_k,
                degenerate_mask=ana.degenerate_mask & executed_k,
                pcg_iterations=jnp.where(executed_k, sinfo.pcg_iterations,
                                         -1).astype(jnp.int32),
                pcg_residual=nanify(sinfo.pcg_residual),
                cond_PH=nanify(sinfo.cond_PH),
                P_preconditioner=nanify(sinfo.P_preconditioner),
                W_adaptive=nanify(sinfo.W_adaptive),
                H=nanify(h.H),
            )

        executed = jnp.arange(I) < k
        log = jax.vmap(telemetry_row)((hist, executed))
    else:
        log = _empty_log(I, dtype)

    # Euler covariance -> Lie (icp_test_runner.cpp:2696-2727)
    w_h, V_h = linalg.symmetric_eigh(H_last)
    invertible = jnp.abs(w_h).min() > 1e-12
    w_inv = 1.0 / jnp.where(jnp.abs(w_h) > 1e-12, w_h, 1.0)
    cov_euler = (V_h * w_inv[None, :]) @ V_h.T
    w_c, V_c = linalg.symmetric_eigh(cov_euler)
    cov_euler = (V_c * jnp.maximum(w_c, 1e-9)[None, :]) @ V_c.T
    J_lie = se3.euler_to_lie_jacobian(pose[0], pose[1], pose[2])
    J_cov = jnp.eye(6, dtype=dtype).at[:3, :3].set(J_lie)
    cov = J_cov @ cov_euler @ J_cov.T
    w_f, V_f = linalg.symmetric_eigh(cov)
    cov = (V_f * jnp.maximum(w_f, 1e-9)[None, :]) @ V_f.T
    cov = jnp.where(converged & invertible, cov,
                    1e6 * jnp.eye(6, dtype=dtype))

    T_final = se3.pose6d_to_matrix(pose)
    return ICPResult(R=T_final[:3, :3], t=T_final[:3, 3],
                     converged=converged, aborted=aborted, iterations=k,
                     covariance=cov, log=log)
