"""evo_ape-equivalent trajectory scoring (reference L8 evaluation loop,
scripts/README.md:5-8): ATE (aligned + raw), RPE, and registration recall
(supp.pdf II-B: RRE < 5 deg AND RTE < 0.2 m) from two TUM files.

Usage: python scripts/evaluate_trajectory.py GT.tum EST.tum [--delta 1]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def associate(ts_gt, ts_est, max_dt=0.02):
    """Nearest-timestamp association (the evo/TUM convention).

    One-to-one: when several est frames share the same nearest GT frame,
    only the closest-in-time est frame keeps the match (evo's unique
    association; many-to-one matches would skew ATE/RPE/recall for
    mismatched-rate trajectories)."""
    best_for_gt = {}           # gt index -> (|dt|, est index)
    for i, t in enumerate(ts_est):
        j = int(np.argmin(np.abs(ts_gt - t)))
        dt = abs(float(ts_gt[j] - t))
        if dt <= max_dt and (j not in best_for_gt or dt < best_for_gt[j][0]):
            best_for_gt[j] = (dt, i)
    pairs = sorted((j, ie) for j, (_, ie) in best_for_gt.items())
    idx_gt = [j for j, _ in pairs]
    idx_est = [ie for _, ie in pairs]
    return np.asarray(idx_gt, int), np.asarray(idx_est, int)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gt")
    ap.add_argument("est")
    ap.add_argument("--delta", type=int, default=1, help="RPE frame delta")
    ap.add_argument("--max-dt", type=float, default=0.02)
    ap.add_argument("--scans", default=None,
                    help="(F, N, 3) .npy of body-frame frames -> adds the "
                         "MapEval-style AC map-accuracy block (needs --map)")
    ap.add_argument("--map", dest="map_path", default=None,
                    help="(M, 3) .npy reference map for --scans")
    args = ap.parse_args()

    from dcreg_tpu.io.tum import (ate, load_tum, map_accuracy,
                                  registration_recall, rpe)

    ts_gt, P_gt = load_tum(args.gt)
    ts_est, P_est = load_tum(args.est)
    ig, ie = associate(ts_gt, ts_est, args.max_dt)
    if len(ig) == 0:
        print(json.dumps({"error": "no associated frames"}))
        return 1
    gt, est = P_gt[ig], P_est[ie]

    a_aligned = ate(est, gt, align=True)
    a_raw = ate(est, gt, align=False)
    rre, rte = rpe(est, gt, delta=args.delta)
    recall, _ = registration_recall(est, gt)
    out = {
        "frames": int(len(ig)),
        "ate_rmse_m": a_aligned["rmse"],
        "ate_mean_m": a_aligned["mean"],
        "ate_max_m": a_aligned["max"],
        "ate_raw_rmse_m": a_raw["rmse"],
        "rpe_rot_mean_deg": float(rre.mean()) if len(rre) else None,
        "rpe_trans_mean_m": float(rte.mean()) if len(rte) else None,
        "registration_recall": recall,
    }
    if args.scans and args.map_path:
        scans = np.load(args.scans)
        map_xyz = np.load(args.map_path)
        out["map_accuracy"] = map_accuracy(scans[ie], P_est[ie], map_xyz)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
