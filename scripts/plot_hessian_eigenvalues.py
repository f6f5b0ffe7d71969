#!/usr/bin/env python
"""Per-iteration Hessian spectra bars (Fig 17 analogue).

Rebuild of results/.../fig17/icp_hessian_eigenvalues_plot.py for this
framework's condition_numbers_detailed.csv (full + Schur spectra columns).

Usage: python plot_hessian_eigenvalues.py RESULTS_DIR [METHOD] [OUT.png]
"""
import csv
import os
import sys
from collections import defaultdict

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main(results_dir, method="Ours", out_path=None):
    path = os.path.join(results_dir, "condition_numbers_detailed.csv")
    rows = []
    with open(path) as f:
        for r in csv.DictReader(f):
            if r["Method"] == method:
                rows.append(r)
    rows.sort(key=lambda r: int(r["Iteration"]))
    its = np.array([int(r["Iteration"]) for r in rows])
    eig = np.array([[float(r[f"Eigenvalues_Full_{i}"]) for i in range(6)]
                    for r in rows])
    s_rot = np.array([[float(r[f"Lambda_Schur_Rot_{i}"]) for i in range(3)]
                      for r in rows])
    s_tr = np.array([[float(r[f"Lambda_Schur_Trans_{i}"]) for i in range(3)]
                     for r in rows])

    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    w = 0.12
    for i in range(6):
        axes[0].bar(its + (i - 2.5) * w, eig[:, i], width=w,
                    label=f"$\\lambda_{i}$")
    axes[0].set_yscale("log")
    axes[0].set_title(f"{method}: full 6x6 spectrum")
    axes[0].set_xlabel("iteration")
    axes[0].legend(fontsize=7, ncol=3)
    for ax, lam, name in ((axes[1], s_rot, "Schur rot $S_R$"),
                          (axes[2], s_tr, "Schur trans $S_t$")):
        for i in range(3):
            ax.bar(its + (i - 1) * 0.25, lam[:, i], width=0.25,
                   label=f"$\\lambda_{i}$")
        ax.set_yscale("log")
        ax.set_title(f"{method}: {name}")
        ax.set_xlabel("iteration")
        ax.legend(fontsize=7)
    fig.tight_layout()
    out = out_path or os.path.join(results_dir,
                                   f"hessian_eigenvalues_{method}.png")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
