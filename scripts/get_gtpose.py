#!/usr/bin/env python
"""Nearest-timestamp GT pose lookup from TUM trajectories.

Rebuild of DCReg/scripts/get_gtpose.py:1-231: given a ground-truth TUM
trajectory and a query timestamp (or an estimated trajectory whose poses
need GT counterparts), find the nearest-in-time GT pose and optionally the
SE(3) alignment transform between the two trajectories (the evo `-a` step
the reference derives its aligned GT from).

Usage:
  python get_gtpose.py GT_TUM TIMESTAMP            # print nearest GT pose
  python get_gtpose.py GT_TUM --align EST_TUM      # print alignment T
"""
import sys

import numpy as np


def nearest_pose(gt_ts, gt_poses, t, max_dt=0.5):
    i = int(np.argmin(np.abs(gt_ts - t)))
    dt = abs(gt_ts[i] - t)
    if dt > max_dt:
        raise ValueError(f"nearest GT is {dt:.3f}s away (> {max_dt}s)")
    return gt_poses[i], gt_ts[i]


def main(argv):
    from dcreg_tpu.io.tum import load_tum, _umeyama_se3
    gt_path = argv[0]
    gt_ts, gt_poses = load_tum(gt_path)
    if len(argv) >= 2 and argv[1] == "--align":
        est_ts, est_poses = load_tum(argv[2])
        # associate by nearest timestamp
        pairs = []
        for t, T in zip(est_ts, est_poses):
            try:
                G, _ = nearest_pose(gt_ts, gt_poses, t)
                pairs.append((T[:3, 3], G[:3, 3]))
            except ValueError:
                continue
        est_t = np.array([p[0] for p in pairs])
        gt_t = np.array([p[1] for p in pairs])
        R, t = _umeyama_se3(est_t, gt_t)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        print("alignment T (gt_T_est):")
        print(np.array2string(T, precision=9, suppress_small=False))
    else:
        t = float(argv[1])
        T, ts = nearest_pose(gt_ts, gt_poses, t)
        print(f"nearest GT at t={ts}:")
        print(np.array2string(T, precision=9))


if __name__ == "__main__":
    main(sys.argv[1:])
