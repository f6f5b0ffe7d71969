"""E57 -> PCD dataset converter (counterpart of the reference's
``DCReg/scripts/e57_to_pcd_converter.py``).

Reads every scan's cartesian points from an E57 file (pye57 when
available, the numpy subset reader otherwise), optionally voxel-
downsamples, and writes a binary PCD compatible with the registration
pipeline.

Usage:
    python scripts/e57_to_pcd.py input.e57 output.pcd [--voxel 0.05]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--voxel", type=float, default=0.0,
                    help="voxel downsample size in meters (0 = off)")
    args = ap.parse_args()

    from dcreg_tpu.io.e57 import read_e57
    from dcreg_tpu.io.pcd import save_pcd

    data = read_e57(args.input)
    xyz = np.asarray(data["xyz"], np.float64)
    print(f"read {xyz.shape[0]} points from {args.input}")
    if args.voxel > 0:
        keys = np.floor(xyz / args.voxel).astype(np.int64)
        _, keep = np.unique(keys, axis=0, return_index=True)
        xyz = xyz[np.sort(keep)]
        print(f"voxel({args.voxel} m) -> {xyz.shape[0]} points")
    save_pcd(args.output, xyz)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
