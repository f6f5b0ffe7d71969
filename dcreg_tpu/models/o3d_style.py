"""Open3D-style point-to-plane ICP baseline ("O3D").

Rebuild of ``runOpen3DICP`` (icp_test_runner.cpp:3358-3405), which wraps
open3d::pipelines::registration::RegistrationICP with a point-to-plane
estimator.  Open3D's algorithm: target normals precomputed, 1-NN
correspondences within ``max_correspondence_distance``, unweighted
point-to-plane Gauss-Newton step per iteration, convergence on relative
fitness/RMSE change (default criteria: 1e-6, max 30 iterations).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import linalg, se3
from ..ops.knn import nn1
from ..ops.normals import estimate_normals
from . import logpack
from .icp import ICPParams, ICPResult, _empty_log, log_from_buffer
from ..utils import precise_jit


@precise_jit(static_argnames=("params", "num_source",
                                             "normal_k"))
def o3d_icp(source_xyz, target_xyz, R0, t0, params: ICPParams = ICPParams(),
            T_gt=None, target_valid=None, source_valid=None,
            num_source: int | None = None, normal_k: int = 30,
            grid=None) -> ICPResult:
    """Open3D-equivalent point-to-plane ICP (normal_k=30 matches Open3D's
    common KDTreeSearchParamHybrid default usage).

    ``grid``: optional prebuilt ``voxel_grid.GridIndex`` over target_xyz
    (voxel_size >= search_radius); replaces the brute 1-NN scan.  Requires
    ``target_valid`` baked into the index at build time."""
    if grid is not None and target_valid is not None:
        raise ValueError("bake target_valid into the GridIndex instead")
    dtype = source_xyz.dtype
    I = params.max_iterations
    if T_gt is None:
        T_gt = jnp.eye(4, dtype=dtype)
    normals = estimate_normals(target_xyz, k=normal_k, valid=target_valid,
                               chunk=params.chunk)

    def body(state):
        k, R, t, prev_fit, prev_rmse, converged, aborted, H_last, buf = state
        p_w = source_xyz @ R.T + t
        if grid is not None:
            from ..ops.voxel_grid import grid_knn
            sq_d, idx = grid_knn(grid, p_w, k=1)
            sq_d, idx = sq_d[:, 0], idx[:, 0]
        else:
            sq_d, idx = nn1(p_w, target_xyz, target_valid,
                            chunk=params.chunk)
        mask = sq_d < params.corr.search_radius ** 2
        if source_valid is not None:
            mask = mask & source_valid
        n = normals[idx]
        q = target_xyz[idx]
        w = mask.astype(dtype)
        r = jnp.sum((p_w - q) * n, axis=-1)
        Jw = jnp.cross(p_w, n)
        J = jnp.concatenate([Jw, n], axis=-1) * w[:, None]
        H = J.T @ J
        g = -(J.T @ (w * r))
        dx = linalg.solve_qr_6x6(H + 1e-12 * jnp.eye(6, dtype=dtype), g)

        n_valid = jnp.sum(mask.astype(jnp.int32))
        rmse = jnp.sqrt(jnp.sum(w * sq_d) /
                        jnp.maximum(n_valid, 1).astype(dtype))
        denom = (jnp.asarray(num_source, dtype) if num_source is not None
                 else jnp.asarray(source_xyz.shape[0], dtype))
        fitness = n_valid.astype(dtype) / denom

        too_few = n_valid < params.min_effective_points
        bad = ~jnp.all(jnp.isfinite(dx))
        abort_now = too_few | bad
        dx = jnp.where(abort_now, jnp.zeros_like(dx), dx)
        R_new, t_new = se3.boxplus_left(R, t, dx)
        R_new = jnp.where(abort_now, R, R_new)
        t_new = jnp.where(abort_now, t, t_new)
        T_new = se3.se3_matrix(R_new, t_new)
        te, re = se3.pose_error(T_gt, T_new)

        row = logpack.pack_row(
            dtype,
            executed=~too_few, effective_points=n_valid,
            corr_num=n_valid,
            rmse=rmse, fitness=fitness,
            dx=dx, transform=T_new,
            trans_error=te, rot_error_deg=re,
            H=H,
        )
        buf = jax.lax.dynamic_update_slice(buf, row[None, :], (k, jnp.asarray(0, k.dtype)))

        # Open3D criteria: relative fitness & rmse change < 1e-6
        conv = (jnp.abs(fitness - prev_fit) < 1e-6) & \
               (jnp.abs(rmse - prev_rmse) < 1e-6) & ~abort_now
        H_last = jnp.where(abort_now, H_last, H)
        return (k + 1, R_new, t_new, fitness, rmse, conv, abort_now, H_last,
                buf)

    def cond(state):
        return (state[0] < I) & ~state[5] & ~state[6]

    init = (jnp.asarray(0, jnp.int32), R0.astype(dtype), t0.astype(dtype),
            jnp.asarray(0.0, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False), jnp.asarray(False),
            jnp.eye(6, dtype=dtype), logpack.empty_buffer(I, dtype))
    k, R, t, _, _, converged, aborted, H_last, buf = jax.lax.while_loop(
        cond, body, init)
    log = log_from_buffer(buf)
    w_h, V_h = linalg.symmetric_eigh(H_last)
    inv = 1.0 / jnp.maximum(jnp.abs(w_h), 1e-12)
    cov = (V_h * inv[None, :]) @ V_h.T
    return ICPResult(R=R, t=t, converged=converged, aborted=aborted,
                     iterations=k, covariance=cov, log=log)
