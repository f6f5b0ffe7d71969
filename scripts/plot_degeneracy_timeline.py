#!/usr/bin/env python
"""Degeneracy-detection timeline plots (Figs 12-14/16 analogue).

Rebuild of results/long_duration experiments/fig12-14_fig16/
degeneracy_detection_visualization.py for THIS framework's artifacts: reads
condition_numbers_detailed.csv (same schema as the reference writer,
icp_test_runner.cpp:894-993) and renders per-iteration condition numbers +
per-direction degeneracy masks per method.

Usage: python plot_degeneracy_timeline.py RESULTS_DIR [OUT.png]
"""
import csv
import os
import sys
from collections import defaultdict

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def load(results_dir):
    path = os.path.join(results_dir, "condition_numbers_detailed.csv")
    per_method = defaultdict(list)
    with open(path) as f:
        for r in csv.DictReader(f):
            per_method[r["Method"]].append(r)
    return per_method


def main(results_dir, out_path=None):
    per_method = load(results_dir)
    methods = sorted(per_method)
    fig, axes = plt.subplots(2, len(methods), squeeze=False,
                             figsize=(4 * len(methods), 6), sharex="col")
    for c, m in enumerate(methods):
        rows = sorted(per_method[m], key=lambda r: int(r["Iteration"]))
        it = np.array([int(r["Iteration"]) for r in rows])
        ax = axes[0][c]
        for key, label in (("Cond_Schur_Rot", "cond(S_R)"),
                           ("Cond_Schur_Trans", "cond(S_t)"),
                           ("Cond_Full_SVD", "cond(H)")):
            v = np.array([float(r[key]) for r in rows])
            ax.semilogy(it, v, label=label, lw=1.2)
        ax.axhline(10.0, color="k", ls="--", lw=0.8, label="thresh")
        ax.set_title(m)
        if c == 0:
            ax.set_ylabel("condition number")
            ax.legend(fontsize=7)
        ax2 = axes[1][c]
        mask = np.array([[int(r[f"Degenerate_Mask_{d}"]) for d in range(6)]
                         for r in rows]).T
        ax2.imshow(mask, aspect="auto", cmap="Reds", vmin=0, vmax=1,
                   extent=(it.min() - 0.5, it.max() + 0.5, 5.5, -0.5))
        ax2.set_yticks(range(6))
        ax2.set_yticklabels(["wx", "wy", "wz", "x", "y", "z"])
        ax2.set_xlabel("iteration")
        if c == 0:
            ax2.set_ylabel("degenerate direction")
    fig.tight_layout()
    out = out_path or os.path.join(results_dir, "degeneracy_timeline.png")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
