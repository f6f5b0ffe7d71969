"""SuperLoc baseline: quaternion-pose robust point-to-plane registration
with feature-observability analysis.

TPU-native rebuild of the SuperLoc subsystem (``DCReg/src/superloc.cpp``,
858 LoC Ceres).  Structure of the reference (runSuperLocICPFull, :338-543):

  * correspondences: 1-NN gate (first neighbor within radius) + 5-NN plane
    refit with viewpoint-oriented normal and fit-quality weight
    ``max(0.1, 1 - sqrt(msd / (3 * planeRes)))`` (:546-634, planeRes = 0.1);
  * observability histogram: per point, cross = p_w x n; votes go to the
    top-2 of {+-rx, +-ry, +-rz} cross alignments and the top-1 of
    {tx, ty, tz} normal alignments (:637-693);
  * solve: Ceres with TukeyLoss(sqrt(3 * planeRes)) wrapped in ScaledLoss
    (fit quality), quaternion local parameterization, DENSE_QR, 4 inner
    iterations (:400-479).  Here: 4 damped-GN steps with Tukey IRLS weights
    (rho'(s) = (1 - s/a^2)^2 inside the tukey radius, 0 outside) on the
    left-perturbation tangent -- same normal equations Ceres LM builds, with
    the Ceres default trust-region damping mu = 1e-4 * diag;
  * ONE outer iteration (the reference breaks as soon as Ceres reports a
    successful step, :532-538), converged iff rmse < 0.01;
  * uncertainty = 3 * histogram fraction capped at 1 (:751-797); degeneracy
    mask from per-axis uncertainty thresholds 0.2/0.1/0.2 (:800-854);
  * covariance: tangent-space (J^T W J)^-1 of the robust problem, with
    cond_* = sqrt(lambda_max/lambda_min) (:696-748).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import linalg, se3
from ..ops.correspondence import fit_planes
from ..ops.knn import knn
from .icp import ICPParams, ICPResult, _empty_log
from ..utils import precise_jit

PLANE_RESOLUTION = 0.1      # superloc.h:152 default


class SuperLocInfo(NamedTuple):
    uncertainties: jax.Array    # (6,) [x, y, z, roll, pitch, yaw]
    histogram: jax.Array        # (9,) int32
    cond_full: jax.Array
    cond_rot: jax.Array
    cond_trans: jax.Array
    is_degenerate: jax.Array
    degeneracy_mask: jax.Array  # (6,) [wx wy wz | x y z] ordering


def _correspondences(source_xyz, R, t, target_xyz, target_valid, radius,
                     chunk, grid=None):
    """findCorrespondencesWithNormals (superloc.cpp:546-634), fixed shape.

    With ``grid`` (voxel_grid.GridIndex, voxel_size >= radius) the 5-NN
    come from the 27-cell neighborhood; sets whose far neighbors fall
    outside it are marked invalid (the reference's KD-tree would still
    refit such planes -- a deviation only on sparse fringes, where the
    fit-quality weight floors them anyway)."""
    p_w = source_xyz @ R.T + t
    if grid is not None:
        from ..ops.voxel_grid import grid_knn
        sq_d, idx = grid_knn(grid, p_w, k=5)
        idx = jnp.clip(idx, 0, target_xyz.shape[0] - 1)
    else:
        sq_d, idx = knn(p_w, target_xyz, target_valid, k=5, chunk=chunk,
                        refine=10)
    gate = sq_d[:, 0] <= radius * radius     # FIRST-neighbor gate (:580)
    if grid is not None:
        gate = gate & jnp.isfinite(sq_d[:, 4])
    neigh = target_xyz[idx]
    normal, d_off, fit_ok = fit_planes(neigh)
    # orient toward the query point (viewpoint direction = p_w, :603-608)
    flip = jnp.sum(p_w * normal, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    d_off = jnp.where(flip, -d_off, d_off)
    # fit quality (:610-625)
    dev = jnp.einsum('nkj,nj->nk', neigh, normal) + d_off[:, None]
    msd = jnp.mean(dev * dev, axis=-1)
    fit_q = jnp.maximum(0.1, 1.0 - jnp.sqrt(msd / (3.0 * PLANE_RESOLUTION)))
    valid = gate & fit_ok
    return valid, normal, d_off, fit_q, p_w


def _observability_histogram(p_w, normal, valid, R):
    """analyzeFeatureObservabilityDetailed (superloc.cpp:637-693)."""
    axes = R  # columns are rotated x/y/z axes; R @ e_i = R[:, i]
    cross = jnp.cross(p_w, normal)
    # rotation qualities for bins 0..5: [+x, -x, +y, -y, +z, -z]
    rot_align = jnp.abs(cross @ axes)                    # (N, 3)
    rot_q = jnp.stack([rot_align[:, 0], rot_align[:, 0],
                       rot_align[:, 1], rot_align[:, 1],
                       rot_align[:, 2], rot_align[:, 2]], axis=-1)
    # |cross . axis| == |cross . -axis|: the reference's +- pairs tie, and
    # its stable sort picks (+axis, -axis) of the best axis as top-2.
    best_axis = jnp.argmax(rot_align, axis=-1)
    trans_align = jnp.abs(normal @ axes)
    best_trans = jnp.argmax(trans_align, axis=-1)
    v = valid.astype(jnp.int32)
    hist = jnp.zeros(9, jnp.int32)
    for a in range(3):
        sel = (best_axis == a).astype(jnp.int32) * v
        hist = hist.at[2 * a].add(jnp.sum(sel).astype(jnp.int32))
        hist = hist.at[2 * a + 1].add(jnp.sum(sel).astype(jnp.int32))  # tie pair
    for a in range(3):
        sel = (best_trans == a).astype(jnp.int32) * v
        hist = hist.at[6 + a].add(jnp.sum(sel).astype(jnp.int32))
    del rot_q
    return hist


def _tukey_weight(r, a):
    """Ceres TukeyLoss IRLS weight rho'(s), s = r^2."""
    s = r * r
    u = 1.0 - s / (a * a)
    return jnp.where(u > 0.0, u * u, 0.0)


@precise_jit(static_argnames=("params", "num_source",
                                             "inner_iters"))
def superloc_register(source_xyz, target_xyz, R0, t0,
                      params: ICPParams = ICPParams(),
                      T_gt=None, target_valid=None, source_valid=None,
                      num_source: int | None = None,
                      inner_iters: int = 4, grid=None) -> ICPResult:
    """SuperLoc registration; same result interface as the other engines.

    ``grid``: optional GridIndex over target_xyz (see _correspondences)."""
    if grid is not None and target_valid is not None:
        raise ValueError("bake target_valid into the GridIndex instead")
    dtype = source_xyz.dtype
    I = params.max_iterations
    if T_gt is None:
        T_gt = jnp.eye(4, dtype=dtype)
    tukey_a = jnp.sqrt(3.0 * PLANE_RESOLUTION)

    valid, normal, d_off, fit_q, _ = _correspondences(
        source_xyz, R0, t0, target_xyz, target_valid,
        params.corr.search_radius, params.chunk, grid=grid)
    if source_valid is not None:
        valid = valid & source_valid
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # --- 4 damped-GN steps with Tukey IRLS (the Ceres inner solve) ---
    def gn_step(carry, _):
        R, t = carry
        p_w = source_xyz @ R.T + t
        r = jnp.sum(p_w * normal, axis=-1) + d_off
        w = fit_q * _tukey_weight(r, tukey_a) * valid.astype(dtype)
        # left-perturbation rows: dr/d[omega, v] = [(p_w x n)^T, n^T]
        Jw = jnp.cross(p_w, normal)
        J = jnp.concatenate([Jw, normal], axis=-1)
        Jw_ = J * w[:, None]
        H = Jw_.T @ J
        g = -(Jw_.T @ r)
        dx = linalg.solve_qr_6x6(H + 1e-4 * jnp.diag(jnp.diagonal(H)), g)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        R_new, t_new = se3.boxplus_left(R, t, dx)
        return (R_new, t_new), H

    (R_fin, t_fin), H_hist = jax.lax.scan(
        gn_step, (R0.astype(dtype), t0.astype(dtype)), None,
        length=inner_iters)
    H_final = H_hist[-1]

    # --- metrics at the final pose ---
    p_w = source_xyz @ R_fin.T + t_fin
    r = jnp.sum(p_w * normal, axis=-1) + d_off
    r_masked = jnp.where(valid, r, 0.0)
    rmse = jnp.sqrt(jnp.sum(r_masked * r_masked) /
                    jnp.maximum(n_valid, 1).astype(dtype))
    denom = (jnp.asarray(num_source, dtype) if num_source is not None
             else jnp.asarray(source_xyz.shape[0], dtype))
    inliers = jnp.sum((valid & (jnp.abs(r) < 0.3)).astype(jnp.int32))
    fitness = inliers.astype(dtype) / denom

    # --- observability histogram + uncertainties (:751-797) ---
    hist = _observability_histogram(p_w, normal, valid, R_fin)
    histf = hist.astype(dtype)
    tot_t = jnp.maximum(histf[6] + histf[7] + histf[8], 1e-12)
    unc_xyz = jnp.minimum(histf[6:9] / tot_t * 3.0, 1.0)
    tot_r = jnp.maximum(jnp.sum(histf[:6]), 1e-12)
    unc_rpy = jnp.minimum(jnp.stack([
        (histf[0] + histf[1]) / tot_r * 3.0,
        (histf[2] + histf[3]) / tot_r * 3.0,
        (histf[4] + histf[5]) / tot_r * 3.0]), 1.0)
    # degeneracy (:819-853): thresholds (x, y, z) = (0.2, 0.1, 0.2),
    # (roll, pitch, yaw) = (0.2, 0.1, 0.2)
    thr = jnp.asarray([0.2, 0.1, 0.2], dtype)
    mask_trans = unc_xyz < thr
    mask_rot = unc_rpy < thr
    mask6 = jnp.concatenate([mask_rot, mask_trans])
    is_degen = jnp.any(mask6)

    # --- tangent covariance + conds (:696-748) ---
    w_h, V_h = linalg.symmetric_eigh(H_final)
    inv = 1.0 / jnp.maximum(w_h, 1e-10)
    cov = (V_h * inv[None, :]) @ V_h.T
    w_cov, _ = linalg.symmetric_eigh(cov)
    cond_full = jnp.sqrt(jnp.maximum(w_cov[5], 1e-10) /
                         jnp.maximum(w_cov[0], 1e-10))
    w_r, _ = linalg.symmetric_eigh(cov[:3, :3])
    w_t, _ = linalg.symmetric_eigh(cov[3:, 3:])
    cond_rot = jnp.sqrt(jnp.maximum(w_r[2], 1e-10) /
                        jnp.maximum(w_r[0], 1e-10))
    cond_trans = jnp.sqrt(jnp.maximum(w_t[2], 1e-10) /
                          jnp.maximum(w_t[0], 1e-10))

    converged = rmse < 0.01     # superloc.cpp:533
    T_new = se3.se3_matrix(R_fin, t_fin)
    te, re = se3.pose_error(T_gt, T_new)

    log = _empty_log(I, dtype)
    wf, _ = linalg.symmetric_eigh(H_final)
    log = log._replace(
        executed=log.executed.at[0].set(True),
        effective_points=log.effective_points.at[0].set(
            inliers.astype(jnp.int32)),
        rmse=log.rmse.at[0].set(rmse),
        fitness=log.fitness.at[0].set(fitness),
        objective=log.objective.at[0].set(0.5 * jnp.sum(r_masked ** 2)),
        transform=log.transform.at[0].set(T_new),
        trans_error=log.trans_error.at[0].set(te),
        rot_error_deg=log.rot_error_deg.at[0].set(re),
        eigenvalues_full=log.eigenvalues_full.at[0].set(wf),
        singular_values=log.singular_values.at[0].set(jnp.abs(wf)[::-1]),
        cond_full=log.cond_full.at[0].set(linalg.condition_number(wf)),
        is_degenerate=log.is_degenerate.at[0].set(is_degen),
        degenerate_mask=log.degenerate_mask.at[0].set(mask6),
        H=log.H.at[0].set(H_final),
    )

    result = ICPResult(R=R_fin, t=t_fin, converged=converged,
                       aborted=n_valid < params.min_effective_points,
                       iterations=jnp.asarray(1, jnp.int32),
                       covariance=cov, log=log)
    info = SuperLocInfo(
        uncertainties=jnp.concatenate([unc_xyz, unc_rpy]),
        histogram=hist, cond_full=cond_full, cond_rot=cond_rot,
        cond_trans=cond_trans, is_degenerate=is_degen,
        degeneracy_mask=mask6)
    return result, info
