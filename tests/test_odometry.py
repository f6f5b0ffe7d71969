"""Scan-to-map odometry + pose-graph + TUM metrics tests (synthetic GT)."""
import jax
import jax.numpy as jnp
import numpy as np

from dcreg_tpu.models.odometry import OdometryParams, run_odometry
from dcreg_tpu.models.pose_graph import (PoseGraphEdges, make_edges,
                                         optimize_pose_graph)
from dcreg_tpu.io.tum import ate, registration_recall, rpe, save_tum, load_tum
from dcreg_tpu.ops import se3


def _make_world(seed=0, m=8000):
    """A structured 'building' world: floor + two walls + bumps."""
    rng = np.random.default_rng(seed)
    floor = np.column_stack([rng.uniform(-15, 15, m // 2),
                             rng.uniform(-15, 15, m // 2),
                             rng.normal(0, 0.01, m // 2)])
    wall1 = np.column_stack([rng.uniform(-15, 15, m // 4),
                             np.full(m // 4, -5.0) + rng.normal(0, 0.01, m // 4),
                             rng.uniform(0, 4, m // 4)])
    wall2 = np.column_stack([np.full(m // 4, 8.0) + rng.normal(0, 0.01, m // 4),
                             rng.uniform(-15, 15, m // 4),
                             rng.uniform(0, 4, m // 4)])
    return np.vstack([floor, wall1, wall2])


def _gt_trajectory(F=6):
    """A gentle arc of F poses."""
    poses = []
    for i in range(F):
        yaw = 0.03 * i
        t = np.array([0.4 * i, 0.1 * i, 0.0])
        R = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.0, yaw])))
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    return np.asarray(poses)


def test_odometry_tracks_ground_truth():
    world = _make_world()
    gt = _gt_trajectory(6)
    rng = np.random.default_rng(1)
    N = 1500
    frames = []
    for T in gt:
        sel = world[rng.choice(world.shape[0], N, replace=False)]
        # body frame scan: p_body = R^T (p_world - t) + noise
        body = (sel - T[:3, 3]) @ T[:3, :3] + rng.normal(0, 0.004, (N, 3))
        frames.append(body)
    frames = jnp.asarray(np.asarray(frames), jnp.float64)

    res = run_odometry(frames, jnp.asarray(world, jnp.float64),
                       T0=jnp.asarray(gt[0], jnp.float64),
                       params=OdometryParams(icp_iterations=8, capacity=64))
    est = np.asarray(res.poses)
    errs = [np.linalg.norm(est[i][:3, 3] - gt[i][:3, 3])
            for i in range(len(gt))]
    assert max(errs) < 0.05, errs
    recall, _ = registration_recall(est, gt)
    assert recall == 1.0
    m = ate(est, gt, align=False)
    assert m["rmse"] < 0.03


def test_odometry_map_mode_matches_voxel_path():
    """run_odometry_map (MapIndex + slotted kernel + reuse_pair_list, the
    production map-scale loop) tracks GT and matches the voxel-grid path
    on the same sequence (VERDICT r4 item 2)."""
    from dcreg_tpu.models.odometry import (estimate_odometry_capacities,
                                           prepare_frames, run_odometry_map)
    from dcreg_tpu.models.icp import ICPParams
    from dcreg_tpu.ops.block_sparse import build_map_index, kd_block_order

    world = _make_world()
    world = world[kd_block_order(world, 128)]
    gt = _gt_trajectory(6)
    rng = np.random.default_rng(1)
    N = 1500
    frames = []
    for T in gt:
        sel = world[rng.choice(world.shape[0], N, replace=False)]
        body = (sel - T[:3, 3]) @ T[:3, :3] + rng.normal(0, 0.004, (N, 3))
        frames.append(body)
    frames = np.asarray(frames, np.float32)

    # voxel-grid reference run (f64)
    res_v = run_odometry(jnp.asarray(frames, jnp.float64),
                         jnp.asarray(world, jnp.float64),
                         T0=jnp.asarray(gt[0], jnp.float64),
                         params=OdometryParams(icp_iterations=8,
                                               capacity=64))

    # map-mode run: frame 1's constant-velocity seed is a full step off
    # (no velocity yet), so the cull radius must cover its d5 and the
    # reuse margin must cover 2x its correction INCLUDING the rotation
    # lever arm (these scans span the whole 15 m world, so the 0.03 rad
    # yaw step contributes ~0.6 m of rigid-motion bound; the in-jit guard
    # reports any breach through pair_overflow)
    mindex = build_map_index(world, tb=128, sb=8)
    frames_s = prepare_frames(frames)
    r0, margin = 0.85, 2.4
    S, G, P = estimate_odometry_capacities(mindex, frames_s, gt, r0 + margin)
    res_m = run_odometry_map(frames_s, mindex, world,
                             T0=jnp.asarray(gt[0], jnp.float32),
                             icp_params=ICPParams(max_iterations=12),
                             num_supers=S, max_per_query=G, num_pairs=P,
                             initial_cull_radius=r0, reuse_margin=margin)
    assert int(np.asarray(res_m.pair_overflow).max()) == 0
    assert bool(np.asarray(res_m.converged).all())
    est_m = np.asarray(res_m.poses)
    est_v = np.asarray(res_v.poses)
    for i in range(len(gt)):
        assert np.linalg.norm(est_m[i][:3, 3] - gt[i][:3, 3]) < 0.05
        assert np.linalg.norm(est_m[i][:3, 3] - est_v[i][:3, 3]) < 0.03
    m = ate(est_m, gt, align=False)
    assert m["rmse"] < 0.03


def test_pose_graph_closes_drift():
    """Odometry chain with drift + one loop-closure edge -> GN pulls the
    trajectory back to GT."""
    F = 10
    gt = _gt_trajectory(F)
    rng = np.random.default_rng(2)
    # noisy odometry edges
    edges_i, edges_j, Zs = [], [], []
    for i in range(F - 1):
        Z = np.linalg.inv(gt[i]) @ gt[i + 1]
        noise = np.asarray(se3.exp_so3(jnp.asarray(
            rng.normal(0, 0.01, 3))))
        Zn = Z.copy()
        Zn[:3, :3] = Z[:3, :3] @ noise
        Zn[:3, 3] = Z[:3, 3] + rng.normal(0, 0.02, 3)
        edges_i.append(i)
        edges_j.append(i + 1)
        Zs.append(Zn)
    # exact loop closure first -> last
    edges_i.append(0)
    edges_j.append(F - 1)
    Zs.append(np.linalg.inv(gt[0]) @ gt[F - 1])

    # integrate noisy odometry as the initial guess
    init = [gt[0]]
    for k in range(F - 1):
        init.append(init[-1] @ Zs[k])
    init = jnp.asarray(np.asarray(init), jnp.float64)
    drift0 = np.linalg.norm(np.asarray(init)[-1][:3, 3] - gt[-1][:3, 3])

    edges = make_edges(np.asarray(edges_i), np.asarray(edges_j),
                       jnp.asarray(np.asarray(Zs), jnp.float64))
    # weight the loop closure strongly
    info = np.ones((len(Zs), 1, 1)) * np.eye(6)
    info[-1] *= 100.0
    edges = edges._replace(info=jnp.asarray(info, jnp.float64))

    res = optimize_pose_graph(init, edges)
    opt = np.asarray(res.poses)
    drift1 = np.linalg.norm(opt[-1][:3, 3] - gt[-1][:3, 3])
    assert drift1 < drift0 * 0.5 + 1e-6, (drift0, drift1)
    assert float(res.final_cost) < 1.0


def test_tum_roundtrip(tmp_path):
    gt = _gt_trajectory(5)
    ts = np.arange(5, dtype=float)
    p = tmp_path / "traj.txt"
    save_tum(p, ts, gt)
    ts2, poses2 = load_tum(p)
    np.testing.assert_allclose(ts2, ts)
    np.testing.assert_allclose(poses2, gt, atol=1e-6)


def test_rpe_known_offsets():
    """RPE on a synthetic drifting trajectory: constant per-frame drift of
    2 cm / 0.5 deg must be recovered exactly at delta=1."""
    import jax.numpy as jnp
    from dcreg_tpu.ops import se3
    F = 12
    gt, est = [], []
    T_gt = np.eye(4)
    T_est = np.eye(4)
    step_gt = np.asarray(se3.pose6d_to_matrix(
        jnp.asarray([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])))
    drift = np.asarray(se3.pose6d_to_matrix(
        jnp.asarray([0.0, 0.0, np.deg2rad(0.5), 0.52, 0.0, 0.0])))
    for _ in range(F):
        gt.append(T_gt.copy()); est.append(T_est.copy())
        T_gt = T_gt @ step_gt
        T_est = T_est @ drift
    rre, rte = rpe(np.asarray(est), np.asarray(gt), delta=1)
    np.testing.assert_allclose(rre, 0.5, atol=1e-6)
    np.testing.assert_allclose(rte, 0.02, atol=1e-6)


def test_evaluate_trajectory_script(tmp_path):
    import os, subprocess, sys, json
    ts = np.arange(10) * 0.1
    poses = np.stack([np.eye(4)] * 10)
    est = poses.copy()
    est[:, 0, 3] += 0.01
    gt_p = str(tmp_path / "gt.tum"); est_p = str(tmp_path / "est.tum")
    save_tum(gt_p, ts, poses)
    save_tum(est_p, ts, est)
    # pin the child to CPU: the script is pure-numpy host tooling and must
    # never pay (or hang on) TPU-backend startup
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "scripts/evaluate_trajectory.py", gt_p, est_p],
        capture_output=True, text=True, cwd=".", env=env, timeout=120)
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout)
    assert out["frames"] == 10
    assert out["registration_recall"] == 1.0
    assert abs(out["ate_raw_rmse_m"] - 0.01) < 1e-6
