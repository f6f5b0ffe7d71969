"""Point-to-plane ICP engines (L3) -- the registration "models".

TPU-native rebuild of ``TestRunner::Point2PlaneICP_SO3_OpenMP``
(icp_test_runner.cpp:1611-2060).  Two-pass design:

  PASS 1 (sequential, minimal): the optimization loop -- correspondence
  search, plane fits, GN assembly, degeneracy analysis, degenerate-system
  solve, manifold update, convergence test -- runs in a ``lax.while_loop``
  whose carry is just the pose + a (max_iter,) pose history.  Nothing else
  crosses iterations, so the loop body is as small as the math allows
  (sequential latency is the TPU cost driver here, not flops).

  PASS 2 (batched, optional): the full per-iteration telemetry
  (IterationLogData, utils.hpp:174-249 -- spectra, conds, masks, errors,
  preconditioner, PCG stats) is *recomputed from the recorded pose history*
  as a batched map over iterations.  Same numbers the reference logs inline
  (the pose -> log-row map is deterministic), but the per-iteration
  analyses run as grouped batched programs instead of sequential tails
  inside the loop.

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
from ..utils import precise


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
    full_telemetry: bool = True   # False skips pass 2 entirely (speed runs)
    telemetry_iter_group: int = 4  # iterations analyzed per pass-2 map step


class IterationLog(NamedTuple):
    """Stacked per-iteration telemetry; row k valid iff executed[k]."""
    executed: jax.Array            # (I,) bool
    effective_points: jax.Array    # (I,) int32
    corr_num: jax.Array            # (I,) int32 (utils.hpp:179; == effective
    #   points for the SO3/Euler engines, the ternary detector's
    #   highly-contributing-rotation count for XICP, icp_test_runner.cpp:3121)
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
    H: jax.Array                   # (I, 6, 6) the GN Hessian (replay/pcg.txt)


class ICPResult(NamedTuple):
    R: jax.Array                  # (3, 3) final rotation
    t: jax.Array                  # (3,) final translation
    converged: jax.Array          # () bool
    aborted: jax.Array            # () bool (too few points / non-finite dx)
    iterations: jax.Array         # () int32 (final_iterations_)
    covariance: jax.Array         # (6, 6) repaired H^-1 (:2014-2037)
    log: IterationLog


def log_from_buffer(buf) -> IterationLog:
    """Reconstruct the structured IterationLog from a packed buffer (used by
    the engines that still log inline through ``logpack``: XICP, O3D)."""
    from . import logpack
    return IterationLog(**{name: logpack.unpack(buf, name)
                           for name in IterationLog._fields})


def _empty_log(I, dtype):
    f = functools.partial(jnp.full, dtype=dtype)
    return IterationLog(
        executed=jnp.zeros(I, bool),
        effective_points=jnp.zeros(I, jnp.int32),
        corr_num=jnp.zeros(I, jnp.int32),
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
        H=f((I, 6, 6), jnp.nan),
    )


class Hist(NamedTuple):
    """Per-iteration minimal state recorded by pass 1 (the loop): the
    6x6 system + scalar stats (47 floats/iter) so the telemetry pass never
    touches the N-point pipeline again.  Leading axis = iteration (a batch
    axis may precede it in the batched engine)."""
    R: jax.Array         # (I, 3, 3) pose BEFORE iteration k
    t: jax.Array         # (I, 3)
    H: jax.Array         # (I, 6, 6)
    g: jax.Array         # (I, 6)
    dx: jax.Array        # (I, 6) the APPLIED update (zero on abort)
    num_valid: jax.Array  # (I,) int32
    rmse: jax.Array      # (I,)
    fitness: jax.Array   # (I,)
    objective: jax.Array  # (I,)


def empty_hist(I, dtype, lead=()) -> Hist:
    return Hist(R=jnp.zeros(lead + (I, 3, 3), dtype),
                t=jnp.zeros(lead + (I, 3), dtype),
                H=jnp.zeros(lead + (I, 6, 6), dtype),
                g=jnp.zeros(lead + (I, 6), dtype),
                dx=jnp.zeros(lead + (I, 6), dtype),
                num_valid=jnp.zeros(lead + (I,), jnp.int32),
                rmse=jnp.full(lead + (I,), jnp.nan, dtype),
                fitness=jnp.full(lead + (I,), jnp.nan, dtype),
                objective=jnp.full(lead + (I,), jnp.nan, dtype))


def telemetry_row(h: Hist, executed_k, detection, handling,
                  thresholds, min_effective_points, T_gt) -> IterationLog:
    """Reconstruct one iteration's full IterationLogData equivalent
    (utils.hpp:174-249) from the recorded minimal state -- pure 6x6 work,
    batched over iterations (and lanes) by the callers.

    The reported dx/transform/errors use the RECORDED applied update
    (Hist.dx), so they match the executed solve exactly even on the fast
    engine path; only the spectra and the solver extras (P/W, PCG stats,
    cond_PH) are recomputed here, with the generic solver's branch choice
    -- exactly at cond ~= cond_thresh those extras can reflect a different
    branch than the one executed."""
    analysis = analyze(h.H, detection, thresholds)
    _, sinfo = solve(h.H, h.g, handling, analysis, thresholds,
                     telemetry=True)
    too_few = h.num_valid < min_effective_points
    dx = h.dx
    ana = analysis
    R_new, t_new = se3.boxplus(h.R, h.t, dx)
    T_new = se3.se3_matrix(R_new, t_new)
    te, re = se3.pose_error(T_gt, T_new)
    nanify = lambda x: jnp.where(executed_k, x, jnp.full_like(x, jnp.nan))
    return IterationLog(
        executed=executed_k & ~too_few,
        effective_points=jnp.where(executed_k, h.num_valid, 0
                                   ).astype(jnp.int32),
        corr_num=jnp.where(executed_k, h.num_valid, 0).astype(jnp.int32),
        rmse=nanify(h.rmse), fitness=nanify(h.fitness),
        objective=nanify(h.objective),
        gradient=nanify(-h.g), dx=nanify(dx),
        transform=nanify(T_new),
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


def covariance_from_H(H_last, converged, dtype):
    """Repaired H^-1 covariance when converged, 1e6 I otherwise
    (icp_test_runner.cpp:2014-2037)."""
    w_h, V_h = linalg.symmetric_eigh(H_last)
    invertible = jnp.abs(w_h).min() > 1e-12
    w_inv = 1.0 / jnp.where(jnp.abs(w_h) > 1e-12, w_h, 1.0)
    cov_inv = (V_h * w_inv[None, :]) @ V_h.T
    w_c, V_c = linalg.symmetric_eigh(cov_inv)
    needs_repair = w_c.min() <= 1e-12
    w_rep = jnp.maximum(w_c, 1e-9)
    cov_rep = (V_c * w_rep[None, :]) @ V_c.T
    cov = jnp.where(needs_repair, cov_rep, cov_inv)
    return jnp.where(converged & invertible, cov,
                     1e6 * jnp.eye(6, dtype=dtype))


def icp_point_to_plane_so3(source_xyz, target_xyz, R0, t0,
                           detection: DetectionMethod,
                           handling: HandlingMethod,
                           params: ICPParams = ICPParams(),
                           T_gt=None, target_valid=None, source_valid=None,
                           num_source: int | None = None,
                           grid=None) -> ICPResult:
    """Run the SO(3) point-to-plane ICP to convergence (one jit).

    source_xyz (N, 3) body frame, target_xyz (M, 3) map frame, (R0, t0)
    initial pose.

    When detection/handling are STATIC enums the engine specializes: the
    DCReg pair (SCHUR_CONDITION_NUMBER, PRECONDITIONED_CG) runs the
    latency-lean in-loop path (closed-form 3x3 Schur spectra + Cholesky/PCG,
    no 6x6 eigendecomposition inside the while_loop -- the full spectra are
    reconstructed in the batched telemetry pass).  Traced int codes are also
    accepted; that keeps ONE compilation across the whole method matrix at
    the cost of computing every method's branchless mask/solve in-loop.

    ``grid``: optional prebuilt ``voxel_grid.GridIndex`` over target_xyz
    (see find_correspondences); build once per target, reuse across runs.
    """
    if isinstance(detection, DetectionMethod) and \
            isinstance(handling, HandlingMethod):
        return _icp_so3_impl_static(
            source_xyz, target_xyz, R0, t0, detection, handling, params,
            T_gt, target_valid, source_valid, num_source, grid)
    from ..ops.degeneracy import detection_code, handling_code
    det = jnp.asarray(detection_code(detection), jnp.int32)
    hand = jnp.asarray(handling_code(handling), jnp.int32)
    return _icp_so3_impl(source_xyz, target_xyz, R0, t0, det, hand, params,
                         T_gt, target_valid, source_valid, num_source, grid)


@functools.partial(jax.jit, static_argnames=("detection", "handling",
                                             "params", "num_source"))
@precise
def _icp_so3_impl_static(source_xyz, target_xyz, R0, t0, detection, handling,
                         params, T_gt=None, target_valid=None,
                         source_valid=None, num_source=None, grid=None):
    return _icp_so3_body(source_xyz, target_xyz, R0, t0, detection, handling,
                         params, T_gt, target_valid, source_valid,
                         num_source, grid)


@functools.partial(jax.jit, static_argnames=("params", "num_source"))
@precise
def _icp_so3_impl(source_xyz, target_xyz, R0, t0, detection, handling,
                  params: ICPParams,
                  T_gt=None, target_valid=None, source_valid=None,
                  num_source: int | None = None, grid=None) -> ICPResult:
    return _icp_so3_body(source_xyz, target_xyz, R0, t0, detection, handling,
                         params, T_gt, target_valid, source_valid,
                         num_source, grid)


def _icp_so3_body(source_xyz, target_xyz, R0, t0, detection, handling,
                  params: ICPParams, T_gt, target_valid, source_valid,
                  num_source, grid) -> ICPResult:
    dtype = source_xyz.dtype
    I = params.max_iterations
    if T_gt is None:
        T_gt = jnp.eye(4, dtype=dtype)
    # the in-loop fast path: no 6x6 EVD, closed-form Schur spectra (valid
    # only for the DCReg detection/handling pair, and only when static)
    fast = (detection is DetectionMethod.SCHUR_CONDITION_NUMBER and
            handling is HandlingMethod.PRECONDITIONED_CG)

    def one_iteration(R, t, telemetry):
        corr = find_correspondences(source_xyz, R, t, target_xyz,
                                    target_valid=target_valid,
                                    source_valid=source_valid,
                                    params=params.corr, chunk=params.chunk,
                                    grid=grid)
        sysm = build_system(source_xyz, R, t, corr, num_source=num_source,
                            use_weight_derivative=params.use_weight_derivative,
                            weight_slope=params.corr.weight_slope)
        analysis = analyze(sysm.H, detection, params.thresholds, fast=fast)
        dx, sinfo = solve(sysm.H, sysm.g, handling, analysis,
                          params.thresholds, telemetry=telemetry, fast=fast)
        too_few = sysm.num_valid < params.min_effective_points
        bad_dx = ~jnp.all(jnp.isfinite(dx))
        abort_now = too_few | bad_dx
        dx = jnp.where(abort_now, jnp.zeros_like(dx), dx)
        return corr, sysm, analysis, dx, sinfo, too_few, abort_now

    # ---------------- pass 1: the optimization loop ----------------------
    # Besides the pose trajectory, the loop records the per-iteration 6x6
    # system + scalar stats (47 floats/iter) so pass 2 never has to touch
    # the N-point correspondence pipeline again: the telemetry
    # reconstruction is pure batched 6x6 work.
    def body(state):
        k, R, t, converged, aborted, hist = state
        _, sysm, _, dx, _, too_few, abort_now = one_iteration(R, t, False)
        hist = Hist(R=hist.R.at[k].set(R), t=hist.t.at[k].set(t),
                    H=hist.H.at[k].set(sysm.H), g=hist.g.at[k].set(sysm.g),
                    dx=hist.dx.at[k].set(dx),
                    num_valid=hist.num_valid.at[k].set(
                        sysm.num_valid.astype(jnp.int32)),
                    rmse=hist.rmse.at[k].set(sysm.rmse),
                    fitness=hist.fitness.at[k].set(sysm.fitness),
                    objective=hist.objective.at[k].set(sysm.objective))
        R_new, t_new = se3.boxplus(R, t, dx)
        R_new = jnp.where(abort_now, R, R_new)
        t_new = jnp.where(abort_now, t, t_new)
        # convergence AFTER the update (icp_test_runner.cpp:1998-2002)
        conv = (jnp.linalg.norm(dx[:3]) < params.convergence_thresh_rot) & \
               (jnp.linalg.norm(dx[3:]) < params.convergence_thresh_trans) & \
               ~abort_now
        return (k + 1, R_new, t_new, conv, abort_now, hist)

    def cond(state):
        k, R, t, converged, aborted = state[:5]
        return (k < I) & ~converged & ~aborted

    hist0 = empty_hist(I, dtype)
    init = (jnp.asarray(0, jnp.int32), R0.astype(dtype), t0.astype(dtype),
            jnp.asarray(False), jnp.asarray(False), hist0)
    k, R, t, converged, aborted, hist = \
        jax.lax.while_loop(cond, body, init)
    H_last = hist.H[jnp.maximum(k - 1, 0)]

    # ---------------- pass 2: batched telemetry reconstruction -----------
    if params.full_telemetry:
        executed = jnp.arange(I) < k
        log = jax.vmap(lambda h, e: telemetry_row(
            h, e, detection, handling, params.thresholds,
            params.min_effective_points, T_gt))(hist, executed)
    else:
        log = _empty_log(I, dtype)

    cov = covariance_from_H(H_last, converged, dtype)
    return ICPResult(R=R, t=t, converged=converged, aborted=aborted,
                     iterations=k, covariance=cov, log=log)
