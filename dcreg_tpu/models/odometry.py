"""Scan-to-map odometry: sequential registration of a LiDAR stream against
a prior map -- the workload of the reference's long-duration experiments
(supp.pdf Tables II/III: Stairs/Corridor/Building/Cave/ParkingLot, prior
maps of 53M-241M points, 1-10k points per scan).

The reference's public repo only ships the per-pair test bench; its SLAM
integration (which produced the TUM trajectories under results/) is
unreleased.  This module provides that missing layer TPU-natively:

  * the map is indexed ONCE into a voxel grid (ops/voxel_grid.py) -- the
    analogue of ICPContext::setTargetCloud's KD-tree build;
  * frames stream through one ``lax.scan``; each step runs a fixed-trip
    masked DCReg ICP (Schur detection + targeted PCG) against the map,
    seeded by a constant-velocity motion model;
  * per-frame outputs (pose, iterations, rmse, degeneracy mask, Schur
    conds) stack into trajectory telemetry for the TUM/evo toolchain
    (io/tum.py).

Two engines share the frame-chain orchestration:

  * ``run_odometry`` -- the voxel-grid path (ops/voxel_grid.py), fp64-able,
    used by the CPU golden/parity tests and small maps;
  * ``run_odometry_map`` -- the MAP-SCALE path: the two-level MapIndex +
    slotted-kernel batched engine (models/icp_batch.py) with the B=1
    ``reuse_pair_list`` fast path, run per frame inside the ``lax.scan``.
    This is the production localization loop for the reference's
    53M-241M-point prior maps (supp.pdf Tables II/III).

Scale-out: for maps beyond one chip's HBM, combine with
parallel/sharded.py's map axis (each chip holds a shard of the voxel grid
and the all_gather candidate merge applies unchanged).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from ..ops.correspondence import CorrespondenceParams, fit_planes
from ..ops.degeneracy import (DegeneracyThresholds, analyze, detection_code,
                              handling_code)
from ..ops.gauss_newton import GNSystem
from ..ops.solvers import solve
from ..ops.voxel_grid import VoxelGrid, build_voxel_grid, voxel_knn
from ..utils import precise_jit


class OdometryParams(NamedTuple):
    icp_iterations: int = 8          # fixed-trip masked GN iterations
    convergence_thresh_trans: float = 1e-3
    convergence_thresh_rot: float = 1e-4
    min_effective_points: int = 10
    corr: CorrespondenceParams = CorrespondenceParams()
    thresholds: DegeneracyThresholds = DegeneracyThresholds()
    capacity: int = 32               # voxel bucket capacity per query voxel
    chunk: int = 1024
    use_constant_velocity: bool = True
    use_weight_derivative: bool = True


class OdometryResult(NamedTuple):
    poses: jax.Array            # (F, 4, 4) world_T_body per frame
    iterations: jax.Array       # (F,) int32
    converged: jax.Array        # (F,) bool
    rmse: jax.Array             # (F,)
    fitness: jax.Array          # (F,)
    effective_points: jax.Array  # (F,) int32
    is_degenerate: jax.Array    # (F,) bool
    degenerate_mask: jax.Array  # (F, 6) bool
    cond_schur_rot: jax.Array   # (F,)
    cond_schur_trans: jax.Array  # (F,)
    cond_full: jax.Array        # (F,)


def _register_to_map(scan, scan_valid, grid: VoxelGrid, R0, t0, det, hand,
                     params: OdometryParams):
    """Fixed-trip masked DCReg ICP of one scan against the indexed map."""
    dtype = scan.dtype
    cp = params.corr
    k = cp.k

    def one_iteration(R, t):
        p_w = scan @ R.T + t
        sq_d, idx = voxel_knn(grid, p_w, k=k, capacity=params.capacity,
                              chunk=params.chunk)
        in_radius = sq_d[:, k - 1] < cp.search_radius ** 2
        neigh = grid.points[idx]
        normal, d_off, fit_ok = fit_planes(neigh)
        plane_dist = jnp.einsum("nkj,nj->nk", neigh, normal) + d_off[:, None]
        plane_ok = jnp.max(plane_dist * plane_dist, axis=-1) \
            < cp.max_plane_thickness ** 2
        residual = jnp.einsum("nj,nj->n", p_w, normal) + d_off
        s = jnp.maximum(0.0, 1.0 - cp.weight_slope * jnp.abs(residual))
        valid = (in_radius & fit_ok & plane_ok & (s > cp.min_weight)
                 & scan_valid)
        s = jnp.where(valid, s, 0.0)
        if params.use_weight_derivative:
            on_ramp = (s > 0.0) & (s < 1.0)
            ds_dr = jnp.where(on_ramp,
                              -cp.weight_slope * jnp.sign(residual), 0.0)
            row_scale = jnp.where(valid, s + residual * ds_dr, 0.0)
        else:
            row_scale = s
        nR = normal @ R
        Jw = jnp.cross(scan, nR)
        J = jnp.concatenate([Jw, nR], axis=-1) * row_scale[:, None]
        b = -(s * residual)
        H = J.T @ J
        g = J.T @ b
        n_valid = jnp.sum(valid.astype(jnp.int32))
        raw_sq = jnp.where(valid, residual * residual, 0.0)
        rmse = jnp.sqrt(jnp.sum(raw_sq) /
                        jnp.maximum(n_valid, 1).astype(dtype))
        n_src = jnp.maximum(jnp.sum(scan_valid.astype(jnp.int32)), 1)
        fitness = jnp.sum(in_radius.astype(dtype)) / n_src.astype(dtype)
        return H, g, n_valid, rmse, fitness

    def body(i, carry):
        R, t, active, n_done, _, _, _, ana_last = carry
        H, g, n_valid, rmse, fitness = one_iteration(R, t)
        analysis = analyze(H, det, params.thresholds)
        dx, _ = solve(H, g, hand, analysis, params.thresholds,
                      telemetry=False)
        too_few = n_valid < params.min_effective_points
        ok = active & ~too_few & jnp.all(jnp.isfinite(dx))
        dx = jnp.where(ok, dx, jnp.zeros_like(dx))
        R_new, t_new = se3.boxplus(R, t, dx)
        conv = (jnp.linalg.norm(dx[:3]) < params.convergence_thresh_rot) & \
               (jnp.linalg.norm(dx[3:]) < params.convergence_thresh_trans)
        still = ok & ~conv
        return (R_new, t_new, still, n_done + active.astype(jnp.int32),
                rmse, fitness, n_valid, analysis)

    H0, g0, n0, rmse0, fit0 = one_iteration(R0, t0)
    ana0 = analyze(H0, det, params.thresholds)
    init = (R0, t0, jnp.asarray(True), jnp.asarray(0, jnp.int32),
            rmse0, fit0, n0, ana0)
    R, t, active, n_done, rmse, fitness, n_valid, ana = jax.lax.fori_loop(
        0, params.icp_iterations, body, init)
    return (R, t, ~active, n_done, rmse, fitness, n_valid, ana)


@precise_jit(static_argnames=("params",))
def _odometry_impl(frames, frames_valid, grid: VoxelGrid, T0, det, hand,
                   params: OdometryParams) -> OdometryResult:
    dtype = frames.dtype
    R_init, t_init = T0[:3, :3], T0[:3, 3]

    def step(carry, frame):
        R_prev, t_prev, R_prev2, t_prev2 = carry
        scan, scan_valid = frame
        if params.use_constant_velocity:
            # T_pred = T_prev * (T_prev2^-1 * T_prev); the composition
            # SQUARES rounding-level non-orthonormality every frame, so
            # project back onto SO(3) (see se3.orthonormalize)
            dR = R_prev2.T @ R_prev
            dt = R_prev2.T @ (t_prev - t_prev2)
            R_pred = se3.orthonormalize(R_prev @ dR)
            t_pred = R_prev @ dt + t_prev
        else:
            R_pred, t_pred = R_prev, t_prev
        (R, t, conv, iters, rmse, fitness, n_valid, ana) = _register_to_map(
            scan, scan_valid, grid, R_pred, t_pred, det, hand, params)
        out = (se3.se3_matrix(R, t), iters, conv, rmse, fitness,
               n_valid, ana.is_degenerate, ana.degenerate_mask,
               ana.cond_schur_rot, ana.cond_schur_trans, ana.cond_full)
        return (R, t, R_prev, t_prev), out

    init = (R_init.astype(dtype), t_init.astype(dtype),
            R_init.astype(dtype), t_init.astype(dtype))
    _, outs = jax.lax.scan(step, init, (frames, frames_valid))
    (poses, iters, conv, rmse, fitness, n_valid, is_deg, mask,
     cs_rot, cs_trans, c_full) = outs
    return OdometryResult(poses=poses, iterations=iters, converged=conv,
                          rmse=rmse, fitness=fitness,
                          effective_points=n_valid, is_degenerate=is_deg,
                          degenerate_mask=mask, cond_schur_rot=cs_rot,
                          cond_schur_trans=cs_trans, cond_full=c_full)


def run_odometry(frames, map_xyz, T0=None, detection="SCHUR_CONDITION_NUMBER",
                 handling="PRECONDITIONED_CG",
                 params: OdometryParams = OdometryParams(),
                 frames_valid=None, map_valid=None,
                 voxel_size=None) -> OdometryResult:
    """Register a stream of frames (F, N, 3) against a prior map (M, 3).

    detection / handling accept DetectionMethod/HandlingMethod enums, their
    string names, or int codes.  Returns stacked per-frame telemetry.
    """
    from ..ops.degeneracy import DetectionMethod, HandlingMethod
    if isinstance(detection, str):
        detection = DetectionMethod[
            detection if detection != "SCHUR_CONDITION_NUMBER"
            else "SCHUR_CONDITION_NUMBER"]
    if isinstance(handling, str):
        handling = HandlingMethod[handling]
    det = jnp.asarray(detection_code(detection), jnp.int32)
    hand = jnp.asarray(handling_code(handling), jnp.int32)
    frames = jnp.asarray(frames)
    dtype = frames.dtype
    if T0 is None:
        T0 = jnp.eye(4, dtype=dtype)
    if frames_valid is None:
        frames_valid = jnp.ones(frames.shape[:2], bool)
    if voxel_size is None:
        voxel_size = params.corr.search_radius
    grid = build_voxel_grid(jnp.asarray(map_xyz, dtype), voxel_size,
                            valid=map_valid)
    return _odometry_impl(frames, frames_valid, grid,
                          jnp.asarray(T0, dtype), det, hand, params)


# ---------------------------------------------------------------------------
# Map-scale odometry: the real localization loop over a MapIndex
# ---------------------------------------------------------------------------

class MapOdometryResult(NamedTuple):
    poses: jax.Array             # (F, 4, 4) world_T_body per frame
    iterations: jax.Array        # (F,) int32
    converged: jax.Array         # (F,) bool
    aborted: jax.Array           # (F,) bool
    pair_overflow: jax.Array     # (F,) int32 (cull/reuse-guard breaches)
    is_degenerate: jax.Array     # (F,) bool   (from the final-iteration H)
    degenerate_mask: jax.Array   # (F, 6) bool
    cond_schur_rot: jax.Array    # (F,)
    cond_schur_trans: jax.Array  # (F,)
    cond_full: jax.Array         # (F,)
    rmse: jax.Array              # (F,) final-iteration weighted RMSE
    fitness: jax.Array           # (F,) final-iteration in-radius fraction
    effective_points: jax.Array  # (F,) int32


@functools.partial(jax.jit, static_argnames=(
    "detection", "handling", "params", "num_pairs", "num_supers",
    "max_per_query", "initial_cull_radius", "reuse_margin",
    "use_constant_velocity", "frame_analysis_fast"))
def _odometry_map_impl(frames, map_xyz, mindex, T0, T_prev, detection,
                       handling, params, num_pairs, num_supers,
                       max_per_query, initial_cull_radius, reuse_margin,
                       use_constant_velocity,
                       frame_analysis_fast=True) -> MapOdometryResult:
    from ..ops.degeneracy import analyze as analyze_enum
    from .icp_batch import icp_batch_so3

    R_init = T0[:3, :3].astype(frames.dtype)
    t_init = T0[:3, 3].astype(frames.dtype)
    R_prev_init = T_prev[:3, :3].astype(frames.dtype)
    t_prev_init = T_prev[:3, 3].astype(frames.dtype)

    def step(carry, scan):
        R_prev, t_prev, R_prev2, t_prev2 = carry
        if use_constant_velocity:
            # T_pred = T_prev * (T_prev2^-1 * T_prev); the composition
            # SQUARES rounding-level non-orthonormality every frame, so
            # project back onto SO(3) (see se3.orthonormalize -- without
            # this, det(R) decays to ~0.82 within ~16 f32 frames and the
            # contracted scan wrecks every registration downstream)
            dR = R_prev2.T @ R_prev
            dt = R_prev2.T @ (t_prev - t_prev2)
            R_pred = se3.orthonormalize(R_prev @ dR)
            t_pred = R_prev @ dt + t_prev
        else:
            R_pred, t_pred = R_prev, t_prev
        out = icp_batch_so3(scan, map_xyz, R_pred[None], t_pred[None],
                            detection, handling, params, mindex, num_pairs,
                            num_supers=num_supers,
                            max_per_query=max_per_query,
                            initial_cull_radius=initial_cull_radius,
                            reuse_pair_list=reuse_margin)
        R, t = out.R[0], out.t[0]
        # per-frame degeneracy telemetry from the final H: the fast
        # (closed-form 3x3 Schur) analysis when the detection allows it
        # -- the full 6x6 Jacobi path costs real per-frame latency.
        # frame_analysis_fast=False restores the full spectrum (cond_full
        # etc.) for telemetry-grade runs like the corridor experiment.
        from ..ops.degeneracy import DetectionMethod as _DM
        fast_ok = (frame_analysis_fast
                   and detection is _DM.SCHUR_CONDITION_NUMBER)
        ana = analyze_enum(out.H_last[0], detection, params.thresholds,
                           fast=fast_ok)
        outs = (se3.se3_matrix(R, t), out.iterations[0], out.converged[0],
                out.aborted[0], out.pair_overflow.astype(jnp.int32),
                ana.is_degenerate, ana.degenerate_mask,
                ana.cond_schur_rot, ana.cond_schur_trans, ana.cond_full,
                out.rmse[0], out.fitness[0], out.num_valid[0])
        return (R, t, R_prev, t_prev), outs

    init = (R_init, t_init, R_prev_init, t_prev_init)
    _, outs = jax.lax.scan(step, init, frames)
    (poses, iters, conv, abt, ovf, is_deg, mask, cs_rot, cs_trans,
     c_full, rmse, fitness, n_valid) = outs
    return MapOdometryResult(poses=poses, iterations=iters, converged=conv,
                             aborted=abt, pair_overflow=ovf,
                             is_degenerate=is_deg, degenerate_mask=mask,
                             cond_schur_rot=cs_rot, cond_schur_trans=cs_trans,
                             cond_full=c_full, rmse=rmse, fitness=fitness,
                             effective_points=n_valid)


def estimate_odometry_capacities(mindex, frames, traj_hint, radius,
                                 margin: float = 1.3, sup_margin: int = 2,
                                 stride: int = 1, slot_margin: float = None):
    """Static (num_supers, max_per_query, num_pairs) covering every frame
    of an odometry run: the max of per-frame ``estimate_map_capacities``
    over the hinted trajectory (an approximate prior -- GT, a previous
    odometry pass, or integrated wheel/IMU odometry is all it needs; the
    radius should already include the prediction-error bound)."""
    from .icp_batch import estimate_map_capacities
    S = G = P = 0
    for f in range(0, len(frames), max(1, stride)):
        # sample the frame's hint pose, the previous one (a stalled
        # motion model), AND the constant-velocity PREDICTION from the
        # two previous hints -- the cull runs at the predicted seed, and
        # a pose between two sampled poses is NOT guaranteed inside the
        # union of their relevance sets (observed: ~2% pair-count
        # shortfall at one frame of a 128-frame run)
        T = np.asarray(traj_hint[f], np.float64)
        Tp = np.asarray(traj_hint[max(f - 1, 0)], np.float64)
        Tp2 = np.asarray(traj_hint[max(f - 2, 0)], np.float64)
        Tpred = Tp @ np.linalg.inv(Tp2) @ Tp
        s, g, p = estimate_map_capacities(
            mindex, frames[f],
            [(T[:3, :3], T[:3, 3]), (Tp[:3, :3], Tp[:3, 3]),
             (Tpred[:3, :3], Tpred[:3, 3])], radius,
            margin=margin, sup_margin=sup_margin, include_identity=False,
            slot_margin=slot_margin)
        S, G, P = max(S, s), max(G, g), max(P, p)
    return S, G, P


def run_odometry_map(frames, mindex, map_xyz, T0=None,
                     detection=None, handling=None, icp_params=None,
                     num_supers: int = 0, max_per_query: int = 0,
                     num_pairs: int = 0,
                     initial_cull_radius: float = 0.3,
                     reuse_margin: float = 0.2,
                     use_constant_velocity: bool = True,
                     traj_hint=None, T_prev_init=None,
                     frame_analysis_fast: bool = True) -> MapOdometryResult:
    """The REAL localization loop against a map-scale prior (supp.pdf
    Tables II/III regime): per frame, a constant-velocity motion-model
    seed + one B=1 map-mode DCReg registration (two-level cull + slotted
    kernel + single reused pair list), all inside one ``lax.scan``.

    frames: (F, N, 3) body-frame scans, EACH kd-block-sorted
    (ops/block_sparse.kd_block_order -- use ``prepare_frames``);
    map_xyz: (M, 3) the kd-block-sorted map the MapIndex was built over.
    Capacities (num_supers/max_per_query/num_pairs) must cover every
    frame at radius initial_cull_radius + reuse_margin; pass them from
    ``estimate_odometry_capacities``, or pass ``traj_hint`` (F, 4, 4) to
    have them estimated here.  ``initial_cull_radius`` must upper-bound
    motion-model prediction error + the converged 5th-NN distance (the
    per-frame exactness argument of icp_batch_so3); breaches surface in
    ``pair_overflow``, not silent truncation.  ``T_prev_init`` optionally
    gives the pose one frame BEFORE T0 (known initial velocity), so the
    constant-velocity model seeds frame 1 correctly instead of assuming
    the platform starts at rest.
    """
    from ..ops.degeneracy import DetectionMethod, HandlingMethod
    from .icp import ICPParams
    if detection is None:
        detection = DetectionMethod.SCHUR_CONDITION_NUMBER
    if handling is None:
        handling = HandlingMethod.PRECONDITIONED_CG
    if isinstance(detection, str):
        detection = DetectionMethod[detection]
    if isinstance(handling, str):
        handling = HandlingMethod[handling]
    if icp_params is None:
        icp_params = ICPParams()
    icp_params = icp_params._replace(full_telemetry=False)
    frames = jnp.asarray(frames, jnp.float32)
    map_xyz = jnp.asarray(map_xyz, jnp.float32)
    if T0 is None:
        T0 = jnp.eye(4, dtype=jnp.float32)
    if T_prev_init is None:
        T_prev_init = T0
    if num_supers <= 0 or max_per_query <= 0 or num_pairs <= 0:
        assert traj_hint is not None, \
            "pass capacities or traj_hint for host-side estimation"
        num_supers, max_per_query, num_pairs = estimate_odometry_capacities(
            mindex, np.asarray(frames), traj_hint,
            initial_cull_radius + reuse_margin)
    return _odometry_map_impl(frames, map_xyz, mindex,
                              jnp.asarray(T0, jnp.float32),
                              jnp.asarray(T_prev_init, jnp.float32),
                              detection, handling, icp_params,
                              int(num_pairs),
                              int(num_supers), int(max_per_query),
                              float(initial_cull_radius),
                              float(reuse_margin),
                              bool(use_constant_velocity),
                              bool(frame_analysis_fast))


def prepare_frames(frames, block: int = 128) -> np.ndarray:
    """kd-block-sort each body-frame scan (host, once per sequence)."""
    from ..ops.block_sparse import kd_block_order
    out = np.asarray(frames, np.float32).copy()
    for f in range(out.shape[0]):
        out[f] = out[f][kd_block_order(out[f], block)]
    return out
