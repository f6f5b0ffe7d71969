#!/usr/bin/env python
"""PCG conditioning / iteration panels (Fig 18 analogue: DCReg vs DCReg-SR).

Rebuild of results/.../fig18_dcreg vs dcreg-sr/pcg_visulization_with_traj.py
for this framework: runs the DCReg engine on the cylinder benchmark and
plots cond(H) vs cond(PH), PCG iterations, and per-iteration pose error --
the telemetry the reference records in pcg.txt (cond_H, cond_PH,
converged_iterations columns; schema in that figure's README.MD).

Usage: python plot_pcg_analysis.py [OUT.png] [PCG_TXT]

With a PCG_TXT argument (the harness's fig18-schema ``pcg.txt``,
telemetry.PCG_COLUMNS order) a fourth panel plots the replayed
per-solve PCG vs direct-QR times instead of re-running the engine for
them.
"""
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_pcg_txt(ax, path):
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None, :]
    it = np.arange(data.shape[0])
    ax.semilogy(it, np.maximum(data[:, 5], 1e-6), "-o", ms=3,
                label="time_pcg_ms")
    ax.semilogy(it, np.maximum(data[:, 6], 1e-6), "-s", ms=3,
                label="time_qr_direct_ms")
    ax.set_title("6x6 solve time (host replay)")
    ax.legend(fontsize=7)


def main(out_path="pcg_analysis.png", pcg_txt=None):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from dcreg_tpu.io.pcd import load_pcd
    from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
    from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
    from dcreg_tpu.ops import se3

    sim = "/root/reference/results/simulation/table3_fig9_fig10"
    xyz = load_pcd(os.path.join(sim, "target_clouds.pcd"))["xyz"]
    src = jnp.asarray(xyz, jnp.float64)
    pose = jnp.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                      0.2, 0.8, 0.5])
    T0 = se3.pose6d_to_matrix(pose)

    runs = {}
    for name, hand in (("DCReg (PCG)", HandlingMethod.PRECONDITIONED_CG),
                       ("DCReg-SR", HandlingMethod.SOLUTION_REMAPPING)):
        res = icp_point_to_plane_so3(
            src, src, T0[:3, :3], T0[:3, 3],
            DetectionMethod.SCHUR_CONDITION_NUMBER, hand, ICPParams())
        runs[name] = res

    n_panels = 4 if pcg_txt else 3
    fig, axes = plt.subplots(1, n_panels, figsize=(4.3 * n_panels, 3.8))
    if pcg_txt:
        plot_pcg_txt(axes[3], pcg_txt)
    for name, res in runs.items():
        n = int(res.iterations)
        it = np.arange(n)
        axes[0].semilogy(it, np.asarray(res.log.cond_full[:n]),
                         "-o", ms=3, label=f"{name}: cond(H)")
        if "PCG" in name:
            axes[0].semilogy(it, np.asarray(res.log.cond_PH[:n]),
                             "-s", ms=3, label="cond(PH)")
            axes[1].plot(it, np.asarray(res.log.pcg_iterations[:n]),
                         "-o", ms=3, label="PCG iterations")
        axes[2].semilogy(it, np.asarray(res.log.trans_error[:n]),
                         "-o", ms=3, label=f"{name} trans err")
    axes[0].set_title("conditioning"); axes[0].legend(fontsize=7)
    axes[1].set_title("PCG iterations to 1e-6"); axes[1].legend(fontsize=7)
    axes[2].set_title("pose error vs iteration"); axes[2].legend(fontsize=7)
    for ax in axes:
        ax.set_xlabel("ICP iteration")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
