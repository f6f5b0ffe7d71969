#!/usr/bin/env python
"""kappa_target sensitivity sweep (Fig 19 analogue).

Rebuild of results/.../fig19_parameter_analysis/parameter_analysis.py --
but instead of plotting the archived inline data, it RUNS the sweep with
this framework on the cylinder benchmark: trans/rot error, iterations and
PCG iterations vs kappa in [1, 100] (the reference's finding: accuracy is
flat across the whole range, kappa is the single interpretable parameter).

Usage: python plot_parameter_analysis.py [OUT.png]
"""
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

KAPPAS = [1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0]


def main(out_path="parameter_analysis.png"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from dcreg_tpu.io.pcd import load_pcd
    from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
    from dcreg_tpu.ops.degeneracy import (DegeneracyThresholds,
                                          DetectionMethod, HandlingMethod)
    from dcreg_tpu.ops import se3

    sim = "/root/reference/results/simulation/table3_fig9_fig10"
    xyz = load_pcd(os.path.join(sim, "target_clouds.pcd"))["xyz"]
    src = jnp.asarray(xyz, jnp.float64)
    pose = jnp.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                      0.2, 0.8, 0.5])
    T0 = se3.pose6d_to_matrix(pose)

    te, re, iters, pcg_its = [], [], [], []
    for kappa in KAPPAS:
        params = ICPParams(thresholds=DegeneracyThresholds(
            kappa_target=float(kappa)))
        res = icp_point_to_plane_so3(
            src, src, T0[:3, :3], T0[:3, 3],
            DetectionMethod.SCHUR_CONDITION_NUMBER,
            HandlingMethod.PRECONDITIONED_CG, params)
        n = int(res.iterations)
        te.append(float(jnp.linalg.norm(res.t)) * 100)     # cm (GT = I)
        k_log = np.asarray(res.log.pcg_iterations[:n])
        pcg_its.append(float(k_log[k_log >= 0].mean())
                       if (k_log >= 0).any() else 0.0)
        iters.append(n)
        w = np.asarray(se3.log_so3(res.R))
        re.append(float(np.degrees(np.linalg.norm(w))))
        print(f"kappa={kappa:6.1f}: TE {te[-1]:.3f} cm RE {re[-1]:.4f} deg "
              f"iters {n} pcg {pcg_its[-1]:.2f}")

    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6))
    axes[0].semilogx(KAPPAS, te, "-o")
    axes[0].set_ylabel("trans error (cm)")
    axes[1].semilogx(KAPPAS, re, "-o")
    axes[1].set_ylabel("rot error (deg)")
    axes[2].semilogx(KAPPAS, pcg_its, "-o")
    axes[2].set_ylabel("mean PCG iterations")
    for ax in axes:
        ax.set_xlabel(r"$\kappa_{target}$")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
