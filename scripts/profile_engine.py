"""Minimal real-engine timing: telemetry on/off + loop trip count."""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.models.icp_batch import icp_batch_so3, estimate_num_pairs
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.ops.block_sparse import build_block_index, morton_argsort
from dcreg_tpu.ops import se3

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
BATCH = 32


def main():
    dtype = jnp.float32
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    perm = morton_argsort(xyz)
    xyz = xyz[perm]
    source = jnp.asarray(xyz, dtype)
    index = build_block_index(xyz, dtype=dtype, tb=128)
    params = ICPParams()
    rng = np.random.default_rng(0)
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    poses = nominal[None, :] * rng.uniform(0.8, 1.2, (BATCH, 6))
    R0s = jnp.stack([se3.euler_zyx_to_rot(*map(jnp.asarray, p[:3]))
                     for p in poses]).astype(dtype)
    t0s = jnp.asarray(poses[:, 3:], dtype)
    P = estimate_num_pairs(
        index, xyz, [(np.asarray(R0s[i], np.float64), poses[i, 3:])
                     for i in range(BATCH)], params.corr.search_radius)

    for label, p in [("telemetry on ", params),
                     ("telemetry off", params._replace(full_telemetry=False))]:
        def run(a, b, p=p):
            return icp_batch_so3(source, source, a, b,
                                 DetectionMethod.SCHUR_CONDITION_NUMBER,
                                 HandlingMethod.PRECONDITIONED_CG, p,
                                 index, P, T_gt=jnp.eye(4, dtype=dtype))
        out = jax.block_until_ready(run(R0s, t0s))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jax.block_until_ready(run(R0s, t0s))
        dt = (time.perf_counter() - t0) / 5
        iters = np.asarray(out.iterations)
        print(f"{label}: {dt*1e3:8.2f} ms  iters mean {iters.mean():.2f} "
              f"max {iters.max()}  ({BATCH/dt:.1f} reg/s)")


if __name__ == "__main__":
    main()
