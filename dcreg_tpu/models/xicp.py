"""X-ICP baseline (Tuna et al. localizability-aware ICP).

TPU-native rebuild of the X-ICP subsystem: the engine
``Point2PlaneICP_SO3_tbb_XICP`` (icp_test_runner.cpp:2834-3355) and the
``XICPCore`` detectors/solvers (src/xicp.cpp, 1596 LoC).  Differences from
the main engine: 1-NN correspondences against PRECOMPUTED target normals,
left-perturbation updates, and localizability detection over alignment
statistics instead of Hessian spectra.

Detector map (xicp.cpp:149-172 dispatch):
  * kOptimizedEqualityConstraints -> detectLocalizabilityOptimized
    (:703-779): per 3x3-SVD eigenvector, sum |alignment| over thresholded
    contributions; localizable iff combined >= enough_info or
    high >= insufficient_info.  (The reference early-exits the scan; with
    nonnegative terms the final decision equals the full-sum test, which is
    what we compute branchlessly.)
  * kEquality/kInequalityConstraints -> detectLocalizabilityTernary
    (:782-859): centered cross-products, 3-level decision
    (decideLocalizabilityLevelTernary :1066-1121), partial-constraint value
    from the top-aligned points (solvePartialConstraints :1124-1269; the
    rank selection is a sort + rank mask here -- no dynamic shapes).
  * kSolutionRemapping -> detectLocalizabilitySolutionRemapping (:862-942):
    6x6 spectrum, eigenvalue-threshold projection matrix + per-axis masks.

Solver map:
  * XICP_CONSTRAINT (icp_test_runner.cpp:3162-3180): the reference runs ONE
    Ceres LM iteration over per-point point-to-plane residuals plus weighted
    direction-constraint penalties (xicp.cpp:350-483).  One LM step from
    x = 0 is a damped GN solve: (H + mu D) dx = b with D = diag(H) and
    mu = 1/initial_trust_region_radius (Ceres default 1e4).  Equality
    constraints add w v v^T to H and w c v to b; inequality constraints have
    zero residual AND zero Jacobian at x = 0 (|v.x| < bound branch,
    xicp.cpp:126-133), so -- exactly as in the reference's single-iteration
    setup -- they do not alter the step.
  * XICP_PROJECTION (icp_test_runner.cpp:3184-3234): SVD pseudo-inverse
    solve (threshold 1e-6), then the remapping projection matrix or
    per-direction projections.
"""
from __future__ import annotations
from ..utils import precise_jit

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import XICPParamsConfig
from ..ops import linalg, se3
from ..ops.degeneracy import DetectionMethod, HandlingMethod
from ..ops.knn import nn1
from ..ops.normals import estimate_normals
from . import logpack
from .icp import ICPParams, ICPResult, _empty_log, log_from_buffer


class XICPDetection(NamedTuple):
    loc_rot: jax.Array        # (3,) bool: True = localizable
    loc_trans: jax.Array      # (3,) bool
    constraint_rot: jax.Array    # (3,) constraint values
    constraint_trans: jax.Array  # (3,)
    V_rot: jax.Array          # (3, 3) rotation-subspace directions (columns)
    V_trans: jax.Array        # (3, 3)
    remap_P: jax.Array        # (6, 6) solution-remapping projection matrix
    n_high_rot: jax.Array     # () int32: highly-contributing count of the
    # LAST rotation eigenvector scanned -- the reference keeps one running
    # counter and logs it as corr_num (xicp.cpp:828, icp_test_runner.cpp:3121)


def _eigen_analysis_3x3(H):
    """SVD of the diagonal blocks -> direction bases, descending singular
    values (eigenAnalysis3x3, xicp.cpp:690-700).  For PSD blocks the SVD U
    equals the EVD basis reversed."""
    wr, Vr = linalg.symmetric_eigh(H[:3, :3])
    wt, Vt = linalg.symmetric_eigh(H[3:, 3:])
    return Vr[:, ::-1], Vt[:, ::-1], wr[::-1], wt[::-1]


def _crosses(points, normals, center=None):
    """Cross-product alignment vectors, normalized only when |c| >= 1
    (xicp.cpp:716-722 / :800-807)."""
    p = points if center is None else points - center[None, :]
    c = jnp.cross(p, normals)
    norm = jnp.linalg.norm(c, axis=-1, keepdims=True)
    return jnp.where(norm < 1.0, c, c / jnp.maximum(norm, 1e-30))


def _direction_contributions(align_vecs, direction, mask, cfg: XICPParamsConfig):
    """(combined, high) contribution sums for one direction
    (detectDirectionLocalizability, xicp.cpp:945-973)."""
    import numpy as np
    cos_min = jnp.cos(jnp.deg2rad(cfg.minimal_alignment_angle_deg))
    cos_strong = jnp.cos(jnp.deg2rad(cfg.strong_alignment_angle_deg))
    a = jnp.abs(align_vecs @ direction)
    a = jnp.where(mask, a, 0.0)
    combined = jnp.sum(jnp.where(a >= cos_min, a, 0.0))
    high = jnp.sum(jnp.where(a >= cos_strong, a, 0.0))
    return a, combined, high


def detect_optimized(src_w, normals, H, mask, cfg: XICPParamsConfig):
    """detectLocalizabilityOptimized (xicp.cpp:703-779)."""
    V_rot, V_trans, _, _ = _eigen_analysis_3x3(H)
    crosses = _crosses(src_w, normals)

    def per_dir(v, vecs):
        _, comb, high = _direction_contributions(vecs, v, mask, cfg)
        return (comb >= cfg.enough_info_threshold) | \
               (high >= cfg.insufficient_info_threshold)

    loc_rot = jax.vmap(lambda i: per_dir(V_rot[:, i], crosses))(jnp.arange(3))
    loc_trans = jax.vmap(lambda i: per_dir(V_trans[:, i], normals))(jnp.arange(3))
    return XICPDetection(
        loc_rot=loc_rot, loc_trans=loc_trans,
        constraint_rot=loc_rot.astype(H.dtype),
        constraint_trans=loc_trans.astype(H.dtype),
        V_rot=V_rot, V_trans=V_trans,
        remap_P=jnp.eye(6, dtype=H.dtype),
        n_high_rot=jnp.asarray(0, jnp.int32))


def _ternary_one_subspace(align_vecs, direction, deltas, normals, points,
                          mask, is_rot, inequality, cfg: XICPParamsConfig):
    """detectSubspaceLocalizabilityTernary + decideLocalizabilityLevelTernary
    + solvePartialConstraints for one direction (xicp.cpp:982-1269)."""
    dtype = direction.dtype
    a, combined, high = _direction_contributions(align_vecs, direction, mask,
                                                 cfg)
    cos_min = jnp.cos(jnp.deg2rad(cfg.minimal_alignment_angle_deg))
    cos_strong = jnp.cos(jnp.deg2rad(cfg.strong_alignment_angle_deg))
    n_contrib = jnp.sum(((a >= cos_min) & mask).astype(jnp.int32))
    n_high = jnp.sum(((a >= cos_strong) & mask).astype(jnp.int32))

    # decision levels (:1077-1120)
    fully_loc = (combined >= cfg.high_info_threshold) | \
                (high >= cfg.enough_info_threshold)
    mixed = (~fully_loc) & (combined >= cfg.enough_info_threshold)
    high_only = (~fully_loc) & (~mixed) & \
                (high >= cfg.insufficient_info_threshold)
    insufficient = ~(fully_loc | mixed | high_only)

    # partial-constraint value from the top-aligned points (:1044-1062)
    n_sample_raw = jnp.where(mixed, n_contrib,
                             jnp.where(high_only, n_high, 0))
    n_total = jnp.sum(mask.astype(jnp.int32))
    n_sample = jnp.clip(n_sample_raw,
                        jnp.int32(cfg.insufficient_info_threshold), n_total)
    n_sample = jnp.where(mixed | high_only, n_sample, 0)

    # rank mask over descending alignment
    order = jnp.argsort(jnp.where(mask, -a, jnp.inf))
    rank = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    sampled = (rank < n_sample) & mask

    w = sampled.astype(dtype)
    if is_rot:
        center = jnp.sum(points * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
        avec = _crosses(points, normals, center)
    else:
        avec = normals
    partial_A = jnp.einsum('n,ni,nj->ij', w, avec, avec)
    dot = jnp.sum(deltas * normals, axis=-1)
    partial_b = -jnp.einsum('n,ni,n->i', w, avec, dot)
    # SVD-based solve (the reference's stable path)
    wA, VA = linalg.symmetric_eigh(partial_A)
    inv = jnp.where(jnp.abs(wA) > 1e-9, 1.0 / jnp.where(jnp.abs(wA) > 1e-9, wA, 1.0), 0.0)
    x_partial = (VA * inv[None, :]) @ VA.T @ partial_b
    solved_c = direction @ x_partial

    localizable = fully_loc
    if inequality:
        c_mixed = jnp.minimum(
            cfg.inequality_bound_multiplier * combined / cfg.high_info_threshold, 1.0)
        c_sampled = jnp.minimum(
            jnp.abs(solved_c) * cfg.inequality_bound_multiplier, 1.0)
        c = jnp.where(fully_loc, 1.0,
                      jnp.where(mixed | high_only, c_sampled,
                                jnp.where(insufficient, 0.0, c_mixed)))
    else:
        c = jnp.where(fully_loc, 1.0, 0.0)
    return localizable, c.astype(dtype), n_high


def detect_ternary(src_w, tgt, normals, H, mask, inequality,
                   cfg: XICPParamsConfig):
    """detectLocalizabilityTernary (xicp.cpp:782-859)."""
    dtype = H.dtype
    V_rot, V_trans, _, _ = _eigen_analysis_3x3(H)
    w = mask.astype(dtype)
    center = jnp.sum(src_w * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
    crosses = _crosses(src_w, normals, center)
    deltas = src_w - tgt

    loc_r, c_r, loc_t, c_t = [], [], [], []
    n_high_rot = jnp.asarray(0, jnp.int32)
    for i in range(3):
        lr, cr, nh = _ternary_one_subspace(crosses, V_rot[:, i], deltas,
                                           normals, src_w, mask, True,
                                           inequality, cfg)
        n_high_rot = nh    # last rot eigenvector's count (xicp.cpp:828)
        lt, ct, _ = _ternary_one_subspace(normals, V_trans[:, i], deltas,
                                          normals, src_w, mask, False,
                                          inequality, cfg)
        loc_r.append(lr); c_r.append(cr); loc_t.append(lt); c_t.append(ct)
    return XICPDetection(
        loc_rot=jnp.stack(loc_r), loc_trans=jnp.stack(loc_t),
        constraint_rot=jnp.stack(c_r), constraint_trans=jnp.stack(c_t),
        V_rot=V_rot, V_trans=V_trans, remap_P=jnp.eye(6, dtype=dtype),
        n_high_rot=n_high_rot)


def detect_solution_remapping(H, cfg: XICPParamsConfig):
    """detectLocalizabilitySolutionRemapping (xicp.cpp:862-942)."""
    dtype = H.dtype
    w, V = linalg.symmetric_eigh(H)       # ascending
    sv, U = linalg.psd_svd_from_eigh(w, V)  # descending
    keep = sv >= cfg.solution_remapping_threshold
    P = jnp.einsum('j,ij,kj->ik', keep.astype(dtype), U, U)
    P = jnp.where(jnp.linalg.norm(P) < 1e-6, jnp.eye(6, dtype=dtype), P)
    # per-axis masks for dropped directions (:886-930)
    loc_rot = jnp.ones(3, bool)
    loc_trans = jnp.ones(3, bool)
    for i in range(6):
        dropped = ~keep[i]
        vec = U[:, i]
        rot_c, trans_c = vec[:3], vec[3:]
        rot_major = jnp.linalg.norm(rot_c) > 0.5
        rot_axis = jnp.argmax(jnp.abs(rot_c))
        trans_axis = jnp.argmax(jnp.abs(trans_c))
        loc_rot = jnp.where(dropped & rot_major,
                            loc_rot.at[rot_axis].set(False), loc_rot)
        loc_trans = jnp.where(dropped & ~rot_major,
                              loc_trans.at[trans_axis].set(False), loc_trans)
    V_rot, V_trans, _, _ = _eigen_analysis_3x3(H)
    return XICPDetection(
        loc_rot=loc_rot, loc_trans=loc_trans,
        constraint_rot=loc_rot.astype(dtype),
        constraint_trans=loc_trans.astype(dtype),
        V_rot=V_rot, V_trans=V_trans, remap_P=P,
        n_high_rot=jnp.asarray(0, jnp.int32))


def _solve_constraint(H, b, det: XICPDetection, inequality,
                      cfg: XICPParamsConfig):
    """One Ceres-LM-equivalent step (see module docstring)."""
    dtype = H.dtype
    H_aug, b_aug = H, b
    if not inequality:
        # equality penalties: w v v^T  /  w c v  (xicp.cpp:414-425, 449-461)
        for i in range(3):
            for (loc, c_all, V, sl) in ((det.loc_rot, det.constraint_rot,
                                         det.V_rot, slice(0, 3)),
                                        (det.loc_trans, det.constraint_trans,
                                         det.V_trans, slice(3, 6))):
                active = ~loc[i]
                c = c_all[i]
                wgt = cfg.inequality_bound_multiplier * (1.0 - c)
                v6 = jnp.zeros(6, dtype).at[sl].set(V[:, i])
                H_aug = H_aug + jnp.where(active, wgt, 0.0) * jnp.outer(v6, v6)
                b_aug = b_aug + jnp.where(active, wgt * c, 0.0) * v6
    # LM damping: mu = 1/initial_trust_region_radius (Ceres default 1e4)
    mu = jnp.asarray(1e-4, dtype)
    D = jnp.diag(jnp.diagonal(H_aug))
    dx = linalg.solve_qr_6x6(H_aug + mu * D, b_aug)
    if inequality:
        # Ceres step ACCEPTANCE (TrustRegionMinimizer::IsStepSuccessful).
        # The inequality blocks have zero residual/Jacobian at x = 0, so
        # they don't shape the step -- but Ceres re-evaluates the TRUE cost
        # at x = dx, where max(|v.dx| - bound, 0) activates.  The
        # point-to-plane residuals are exactly linear in delta
        # (xicp.cpp:40-70), so the model decrease b.dx - dx.H.dx/2 is the
        # exact point-cost decrease and the penalty is the only model
        # mismatch: rho = (model_dec - penalty)/model_dec.  A step with
        # rho < min_relative_decrease (Ceres default 1e-3) is REJECTED and,
        # with max_num_iterations = 1, the solve returns x = 0 -- which the
        # engine then reads as convergence (delta norms = 0 < thresholds,
        # icp_test_runner.cpp:3327).  This rejection is what actually
        # terminates the reference's archived XICP run at 9 iterations.
        model_dec = b @ dx - 0.5 * (dx @ H @ dx)
        pen = jnp.asarray(0.0, dtype)
        for i in range(3):
            for (loc, c_all, V, sl) in ((det.loc_rot, det.constraint_rot,
                                         det.V_rot, slice(0, 3)),
                                        (det.loc_trans, det.constraint_trans,
                                         det.V_trans, slice(3, 6))):
                active = ~loc[i]
                c = c_all[i]
                wgt = cfg.inequality_bound_multiplier * (1.0 - c)
                proj = jnp.abs(dx[sl] @ V[:, i])
                over = jnp.maximum(proj - c, 0.0)
                pen = pen + jnp.where(active, 0.5 * wgt * over * over, 0.0)
        rho = (model_dec - pen) / jnp.where(model_dec != 0.0, model_dec, 1.0)
        ok = (model_dec > 0.0) & (rho > 1e-3)
        dx = jnp.where(ok, dx, jnp.zeros_like(dx))
    return dx


def _solve_projection(H, b, det: XICPDetection, use_remap_matrix):
    """SVD pinv + projection (icp_test_runner.cpp:3184-3234)."""
    w, V = linalg.symmetric_eigh(H)
    sv, U = linalg.psd_svd_from_eigh(w, V)
    inv = jnp.where(sv > 1e-6, 1.0 / jnp.where(sv > 1e-6, sv, 1.0), 0.0)
    delta = U @ (inv * (U.T @ b))
    if use_remap_matrix:
        return det.remap_P @ delta
    d_rot, d_trans = delta[:3], delta[3:]
    for i in range(3):
        proj_r = d_rot @ det.V_rot[:, i]
        d_rot = d_rot - jnp.where(det.loc_rot[i], 0.0, proj_r) * det.V_rot[:, i]
        proj_t = d_trans @ det.V_trans[:, i]
        d_trans = d_trans - jnp.where(det.loc_trans[i], 0.0, proj_t) * det.V_trans[:, i]
    return jnp.concatenate([d_rot, d_trans])


@precise_jit(static_argnames=("detection", "handling",
                                             "params", "xicp_cfg",
                                             "num_source", "normal_k"))
def xicp_register(source_xyz, target_xyz, R0, t0,
                  detection: DetectionMethod, handling: HandlingMethod,
                  params: ICPParams = ICPParams(),
                  xicp_cfg: XICPParamsConfig = XICPParamsConfig(),
                  T_gt=None, target_valid=None, source_valid=None,
                  num_source: int | None = None,
                  normal_k: int = 5, grid=None) -> ICPResult:
    """X-ICP registration (engine at icp_test_runner.cpp:2834-3355).

    ``grid``: optional prebuilt ``voxel_grid.GridIndex`` over target_xyz
    (voxel_size >= search_radius); replaces the brute 1-NN scan.  Requires
    ``target_valid`` baked into the index at build time."""
    if grid is not None and target_valid is not None:
        raise ValueError("bake target_valid into the GridIndex instead")
    dtype = source_xyz.dtype
    I = params.max_iterations
    if T_gt is None:
        T_gt = jnp.eye(4, dtype=dtype)

    target_normals = estimate_normals(target_xyz, k=normal_k,
                                      valid=target_valid, chunk=params.chunk)
    inequality = detection == DetectionMethod.XICP_INEQUALITY
    use_remap = detection == DetectionMethod.XICP_SOLUTION_REMAPPING

    def body(state):
        k, R, t, converged, aborted, H_last, buf, cum_cnt, cum_err = state
        src_w = source_xyz @ R.T + t
        if grid is not None:
            from ..ops.voxel_grid import grid_knn
            sq_d, idx = grid_knn(grid, src_w, k=1)
            sq_d, idx = sq_d[:, 0], idx[:, 0]
        else:
            sq_d, idx = nn1(src_w, target_xyz, target_valid,
                            chunk=params.chunk)
        mask = sq_d < params.corr.search_radius ** 2
        if source_valid is not None:
            mask = mask & source_valid
        normals = target_normals[idx]
        tgt = target_xyz[idx]
        w = mask.astype(dtype)

        # H = sum f f^T with f = [p x n; n] (icp_test_runner.cpp:3016-3055)
        crosses = jnp.cross(src_w, normals)
        F = jnp.concatenate([crosses, normals], axis=-1)        # (N, 6)
        Fw = F * w[:, None]
        H = Fw.T @ F
        dot = jnp.sum((src_w - tgt) * normals, axis=-1)
        b = -(Fw.T @ dot)

        n_valid = jnp.sum(mask.astype(jnp.int32))
        err_sum = jnp.sum(w * dot * dot)
        # the reference's XICP engine never resets its correspondence
        # counter / plane-error accumulator across iterations
        # (icp_test_runner.cpp:2903-2904 declared OUTSIDE the loop), so the
        # logged fitness is CUMULATIVE count / cloud size (values > 1) and
        # the logged rmse is the running average -- reproduced for golden
        # parity with iteration_history.csv's archived XICP rows.
        cum_cnt = cum_cnt + n_valid.astype(dtype)
        cum_err = cum_err + err_sum
        rmse = jnp.sqrt(cum_err / jnp.maximum(cum_cnt, 1.0))
        denom = (jnp.asarray(num_source, dtype) if num_source is not None
                 else jnp.asarray(source_xyz.shape[0], dtype))
        fitness = cum_cnt / denom
        objective = 0.5 * err_sum

        if detection == DetectionMethod.XICP_OPTIMIZED_EQUALITY:
            det = detect_optimized(src_w, normals, H, mask, xicp_cfg)
        elif detection in (DetectionMethod.XICP_EQUALITY,
                           DetectionMethod.XICP_INEQUALITY):
            det = detect_ternary(src_w, tgt, normals, H, mask, inequality,
                                 xicp_cfg)
        else:
            det = detect_solution_remapping(H, xicp_cfg)

        if handling == HandlingMethod.XICP_CONSTRAINT:
            dx = _solve_constraint(H, b, det, inequality, xicp_cfg)
        else:
            dx = _solve_projection(H, b, det, use_remap)

        too_few = n_valid < params.min_effective_points
        bad_dx = ~jnp.all(jnp.isfinite(dx))
        abort_now = too_few | bad_dx
        dx = jnp.where(abort_now, jnp.zeros_like(dx), dx)

        R_new, t_new = se3.boxplus_left(R, t, dx)     # left update (:3241)
        R_new = jnp.where(abort_now, R, R_new)
        t_new = jnp.where(abort_now, t, t_new)
        T_new = se3.se3_matrix(R_new, t_new)
        te, re = se3.pose_error(T_gt, T_new)

        mask6 = jnp.concatenate([~det.loc_rot, ~det.loc_trans])
        wf, _ = linalg.symmetric_eigh(H)

        row = logpack.pack_row(
            dtype,
            executed=~too_few, effective_points=n_valid,
            corr_num=det.n_high_rot,
            rmse=rmse, fitness=fitness, objective=objective,
            gradient=-b, dx=dx, transform=T_new,
            trans_error=te, rot_error_deg=re,
            eigenvalues_full=wf,
            singular_values=jnp.abs(wf)[::-1],
            cond_full=linalg.condition_number(wf),
            is_degenerate=jnp.any(mask6),
            degenerate_mask=mask6,
            H=H,
        )
        buf = jax.lax.dynamic_update_slice(buf, row[None, :], (k, jnp.asarray(0, k.dtype)))

        conv = (jnp.linalg.norm(dx[:3]) < params.convergence_thresh_rot) & \
               (jnp.linalg.norm(dx[3:]) < params.convergence_thresh_trans) & \
               ~abort_now
        H_last = jnp.where(abort_now, H_last, H)
        return (k + 1, R_new, t_new, conv, abort_now, H_last, buf,
                cum_cnt, cum_err)

    def cond(state):
        k, converged, aborted = state[0], state[3], state[4]
        return (k < I) & ~converged & ~aborted

    init = (jnp.asarray(0, jnp.int32), R0.astype(dtype), t0.astype(dtype),
            jnp.asarray(False), jnp.asarray(False),
            jnp.eye(6, dtype=dtype), logpack.empty_buffer(I, dtype),
            jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    k, R, t, converged, aborted, H_last, buf, _, _ = jax.lax.while_loop(
        cond, body, init)
    log = log_from_buffer(buf)

    w_h, V_h = linalg.symmetric_eigh(H_last)
    invertible = jnp.abs(w_h).min() > 1e-12
    w_inv = 1.0 / jnp.where(jnp.abs(w_h) > 1e-12, w_h, 1.0)
    cov = (V_h * w_inv[None, :]) @ V_h.T
    cov = jnp.where(converged & invertible, cov,
                    1e6 * jnp.eye(6, dtype=dtype))
    return ICPResult(R=R, t=t, converged=converged, aborted=aborted,
                     iterations=k, covariance=cov, log=log)
