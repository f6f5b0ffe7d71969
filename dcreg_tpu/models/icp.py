"""Point-to-plane ICP engines (L3) -- the registration "models".

TPU-native rebuild of ``TestRunner::Point2PlaneICP_SO3_OpenMP``
(icp_test_runner.cpp:1611-2060).  The whole optimization -- correspondence
search, plane fits, GN assembly, degeneracy analysis, degenerate-system
solve, manifold update, convergence test, and full per-iteration telemetry --
runs inside a single ``jax.lax.while_loop`` under one ``jit``:

  * fixed-shape masked tensors replace the reference's compaction;
  * early exit keeps the reference's semantics (stop on convergence /
    abort on too-few-points or non-finite solve) while remaining jittable;
  * the per-iteration log (IterationLogData, utils.hpp:174-249) is carried
    as preallocated buffers written with ``.at[k].set`` -- the writers layer
    reproduces the reference's CSV schemas from this pytree.

The Euler/LOAM twin engine (icp_test_runner.cpp:2064-2831) lives in
``icp_euler.py``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3, linalg
from ..ops.correspondence import CorrespondenceParams, find_correspondences
from ..ops.degeneracy import (DegeneracyThresholds, DetectionMethod,
                              HandlingMethod, analyze)
from ..ops.gauss_newton import build_system
from ..ops.solvers import solve
from ..utils import precise_jit


class ICPParams(NamedTuple):
    """Static engine parameters (Config / ICPParameters, utils.hpp:82-171)."""
    max_iterations: int = 30
    convergence_thresh_trans: float = 1e-3   # icp.yaml:30
    convergence_thresh_rot: float = 1e-4     # icp.yaml:31
    min_effective_points: int = 10           # icp_test_runner.cpp:1847
    use_weight_derivative: bool = True       # matches archived artifacts
    corr: CorrespondenceParams = CorrespondenceParams()
    thresholds: DegeneracyThresholds = DegeneracyThresholds()
    chunk: int = 2048


class IterationLog(NamedTuple):
    """Stacked per-iteration telemetry; row k valid iff executed[k]."""
    executed: jax.Array            # (I,) bool
    effective_points: jax.Array    # (I,) int32
    rmse: jax.Array                # (I,)
    fitness: jax.Array             # (I,)
    objective: jax.Array           # (I,)
    gradient: jax.Array            # (I, 6)  == -g = J^T (s r)
    dx: jax.Array                  # (I, 6)
    transform: jax.Array           # (I, 4, 4) pose AFTER the update
    trans_error: jax.Array         # (I,) vs GT, after update
    rot_error_deg: jax.Array       # (I,)
    eigenvalues_full: jax.Array    # (I, 6) ascending
    singular_values: jax.Array     # (I, 6) descending
    lambda_schur_rot: jax.Array    # (I, 3)
    lambda_schur_trans: jax.Array  # (I, 3)
    V_schur_rot: jax.Array         # (I, 3, 3)
    V_schur_trans: jax.Array       # (I, 3, 3)
    lambda_diag_rot: jax.Array     # (I, 3)
    lambda_diag_trans: jax.Array   # (I, 3)
    cond_full: jax.Array           # (I,)
    cond_schur_rot: jax.Array      # (I,)
    cond_schur_trans: jax.Array    # (I,)
    cond_diag_rot: jax.Array       # (I,)
    cond_diag_trans: jax.Array     # (I,)
    cond_full_sub_rot: jax.Array   # (I,)
    cond_full_sub_trans: jax.Array  # (I,)
    is_degenerate: jax.Array       # (I,) bool
    degenerate_mask: jax.Array     # (I, 6) bool
    pcg_iterations: jax.Array      # (I,) int32
    pcg_residual: jax.Array        # (I,)
    cond_PH: jax.Array             # (I,)
    P_preconditioner: jax.Array    # (I, 6, 6)
    W_adaptive: jax.Array          # (I, 6, 6)


class ICPResult(NamedTuple):
    R: jax.Array                  # (3, 3) final rotation
    t: jax.Array                  # (3,) final translation
    converged: jax.Array          # () bool
    aborted: jax.Array            # () bool (too few points / non-finite dx)
    iterations: jax.Array         # () int32 (final_iterations_)
    covariance: jax.Array         # (6, 6) repaired H^-1 (:2014-2037)
    log: IterationLog


def log_from_buffer(buf) -> IterationLog:
    """Reconstruct the structured IterationLog from a packed buffer."""
    from . import logpack
    return IterationLog(**{name: logpack.unpack(buf, name)
                           for name in IterationLog._fields})


def _empty_log(I, dtype):
    f = functools.partial(jnp.full, dtype=dtype)
    return IterationLog(
        executed=jnp.zeros(I, bool),
        effective_points=jnp.zeros(I, jnp.int32),
        rmse=f(I, jnp.nan), fitness=f(I, jnp.nan), objective=f(I, jnp.nan),
        gradient=f((I, 6), jnp.nan), dx=f((I, 6), jnp.nan),
        transform=f((I, 4, 4), jnp.nan),
        trans_error=f(I, jnp.nan), rot_error_deg=f(I, jnp.nan),
        eigenvalues_full=f((I, 6), jnp.nan),
        singular_values=f((I, 6), jnp.nan),
        lambda_schur_rot=f((I, 3), jnp.nan),
        lambda_schur_trans=f((I, 3), jnp.nan),
        V_schur_rot=f((I, 3, 3), jnp.nan),
        V_schur_trans=f((I, 3, 3), jnp.nan),
        lambda_diag_rot=f((I, 3), jnp.nan),
        lambda_diag_trans=f((I, 3), jnp.nan),
        cond_full=f(I, jnp.nan),
        cond_schur_rot=f(I, jnp.nan), cond_schur_trans=f(I, jnp.nan),
        cond_diag_rot=f(I, jnp.nan), cond_diag_trans=f(I, jnp.nan),
        cond_full_sub_rot=f(I, jnp.nan), cond_full_sub_trans=f(I, jnp.nan),
        is_degenerate=jnp.zeros(I, bool),
        degenerate_mask=jnp.zeros((I, 6), bool),
        pcg_iterations=jnp.full(I, -1, jnp.int32),
        pcg_residual=f(I, jnp.nan), cond_PH=f(I, jnp.nan),
        P_preconditioner=f((I, 6, 6), jnp.nan),
        W_adaptive=f((I, 6, 6), jnp.nan),
    )


def icp_point_to_plane_so3(source_xyz, target_xyz, R0, t0,
                           detection: DetectionMethod,
                           handling: HandlingMethod,
                           params: ICPParams = ICPParams(),
                           T_gt=None, target_valid=None, source_valid=None,
                           num_source: int | None = None) -> ICPResult:
    """Run the SO(3) point-to-plane ICP to convergence (one jit).

    source_xyz (N, 3) body frame, target_xyz (M, 3) map frame, (R0, t0)
    initial pose.  detection / handling may be enums or traced int codes --
    they are lowered to traced scalars so ONE compilation serves the whole
    method matrix (the per-method masks/solves are 6x6-scale and computed
    branchlessly; the NN/assembly graph dominates and is shared)."""
    from ..ops.degeneracy import detection_code, handling_code
    det = jnp.asarray(detection_code(detection), jnp.int32)
    hand = jnp.asarray(handling_code(handling), jnp.int32)
    return _icp_so3_impl(source_xyz, target_xyz, R0, t0, det, hand, params,
                         T_gt, target_valid, source_valid, num_source)


@precise_jit(static_argnames=("params", "num_source"))
def _icp_so3_impl(source_xyz, target_xyz, R0, t0, detection, handling,
                  params: ICPParams,
                  T_gt=None, target_valid=None, source_valid=None,
                  num_source: int | None = None) -> ICPResult:
    dtype = source_xyz.dtype
    I = params.max_iterations
    if T_gt is None:
        T_gt = jnp.eye(4, dtype=dtype)

    def one_iteration(R, t):
        corr = find_correspondences(source_xyz, R, t, target_xyz,
                                    target_valid=target_valid,
                                    source_valid=source_valid,
                                    params=params.corr, chunk=params.chunk)
        sysm = build_system(source_xyz, R, t, corr, num_source=num_source,
                            use_weight_derivative=params.use_weight_derivative,
                            weight_slope=params.corr.weight_slope)
        analysis = analyze(sysm.H, detection, params.thresholds)
        dx, sinfo = solve(sysm.H, sysm.g, handling, analysis,
                          params.thresholds)
        return corr, sysm, analysis, dx, sinfo

    from . import logpack

    def body(state):
        k, R, t, converged, aborted, H_last, buf = state
        corr, sysm, analysis, dx, sinfo = one_iteration(R, t)

        too_few = sysm.num_valid < params.min_effective_points
        bad_dx = ~jnp.all(jnp.isfinite(dx))
        abort_now = too_few | bad_dx
        dx = jnp.where(abort_now, jnp.zeros_like(dx), dx)

        R_new, t_new = se3.boxplus(R, t, dx)
        R_new = jnp.where(abort_now, R, R_new)
        t_new = jnp.where(abort_now, t, t_new)
        T_new = se3.se3_matrix(R_new, t_new)
        te, re = se3.pose_error(T_gt, T_new)

        row = logpack.pack_row(
            dtype,
            executed=~too_few,
            effective_points=sysm.num_valid,
            rmse=sysm.rmse, fitness=sysm.fitness, objective=sysm.objective,
            gradient=-sysm.g, dx=dx, transform=T_new,
            trans_error=te, rot_error_deg=re,
            eigenvalues_full=analysis.eigenvalues_full,
            singular_values=analysis.singular_values,
            lambda_schur_rot=analysis.lambda_schur_rot,
            lambda_schur_trans=analysis.lambda_schur_trans,
            V_schur_rot=analysis.V_schur_rot,
            V_schur_trans=analysis.V_schur_trans,
            lambda_diag_rot=analysis.lambda_diag_rot,
            lambda_diag_trans=analysis.lambda_diag_trans,
            cond_full=analysis.cond_full,
            cond_schur_rot=analysis.cond_schur_rot,
            cond_schur_trans=analysis.cond_schur_trans,
            cond_diag_rot=analysis.cond_diag_rot,
            cond_diag_trans=analysis.cond_diag_trans,
            cond_full_sub_rot=analysis.cond_full_sub_rot,
            cond_full_sub_trans=analysis.cond_full_sub_trans,
            is_degenerate=analysis.is_degenerate,
            degenerate_mask=analysis.degenerate_mask,
            pcg_iterations=sinfo.pcg_iterations,
            pcg_residual=sinfo.pcg_residual,
            cond_PH=sinfo.cond_PH,
            P_preconditioner=sinfo.P_preconditioner,
            W_adaptive=sinfo.W_adaptive,
        )
        buf = jax.lax.dynamic_update_slice(buf, row[None, :], (k, jnp.asarray(0, k.dtype)))

        # convergence AFTER update & logging (icp_test_runner.cpp:1998-2002)
        conv = (jnp.linalg.norm(dx[:3]) < params.convergence_thresh_rot) & \
               (jnp.linalg.norm(dx[3:]) < params.convergence_thresh_trans) & \
               ~abort_now
        H_last = jnp.where(abort_now, H_last, sysm.H)
        return (k + 1, R_new, t_new, conv, abort_now, H_last, buf)

    def cond(state):
        k, R, t, converged, aborted, H_last, buf = state
        return (k < I) & ~converged & ~aborted

    init = (jnp.asarray(0, jnp.int32), R0.astype(dtype), t0.astype(dtype),
            jnp.asarray(False), jnp.asarray(False),
            jnp.eye(6, dtype=dtype), logpack.empty_buffer(I, dtype))
    k, R, t, converged, aborted, H_last, buf = jax.lax.while_loop(
        cond, body, init)
    log = log_from_buffer(buf)

    # covariance: repaired H^-1 when converged, 1e6 I otherwise (:2014-2037)
    w_h, V_h = linalg.symmetric_eigh(H_last)
    invertible = jnp.abs(w_h).min() > 1e-12
    w_inv = 1.0 / jnp.where(jnp.abs(w_h) > 1e-12, w_h, 1.0)
    cov_inv = (V_h * w_inv[None, :]) @ V_h.T
    # PD repair: floor eigenvalues of the covariance at 1e-9
    w_c, V_c = linalg.symmetric_eigh(cov_inv)
    needs_repair = w_c.min() <= 1e-12
    w_rep = jnp.maximum(w_c, 1e-9)
    cov_rep = (V_c * w_rep[None, :]) @ V_c.T
    cov = jnp.where(needs_repair, cov_rep, cov_inv)
    cov = jnp.where(converged & invertible, cov,
                    1e6 * jnp.eye(6, dtype=dtype))

    return ICPResult(R=R, t=t, converged=converged, aborted=aborted,
                     iterations=k, covariance=cov, log=log)
