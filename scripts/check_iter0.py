"""End-to-end drive: reproduce the reference's first-iteration GN system
on the shifted-cylinder benchmark through the public dcreg_tpu API.

Golden values from
results/simulation/table3_fig9_fig10/{degeneracy_analysis_first_iter.txt,
iteration_details_with_dx.csv, condition_numbers_detailed.csv}:
  eigenvalues 0.629 5.581 16.772 683.235 1993.284 9342.336
  corr_num 197, rmse 0.31669773, fitness 0.05170590, objective 3.71012454
"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.ops import se3
from dcreg_tpu.ops.correspondence import find_correspondences, CorrespondenceParams
from dcreg_tpu.ops.gauss_newton import build_system
from dcreg_tpu.ops.linalg import symmetric_eigh

REF = "/root/reference/results/simulation/table3_fig9_fig10"

target = load_pcd(f"{REF}/target_clouds.pcd")["xyz"].astype(np.float64)
initial = load_pcd(f"{REF}/initial_clouds.pcd")["xyz"].astype(np.float64)
source = target.copy()  # source_pcd == target_pcd in icp.yaml

# initial noise pose recovered from initial_clouds.pcd (Kabsch, exact):
# roll 0.1 deg, pitch 0.1 deg, yaw 2 deg, t = (0.2, 0.8, 0.5); GT = identity
pose = jnp.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                  0.2, 0.8, 0.5])
T0 = se3.pose6d_to_matrix(pose)
R0, t0 = T0[:3, :3], T0[:3, 3]

pred = np.asarray(source @ np.asarray(R0).T + np.asarray(t0))
print("max |T0*source - initial_clouds| =", np.abs(pred - initial).max())

corr = find_correspondences(jnp.asarray(source), R0, t0, jnp.asarray(target),
                            params=CorrespondenceParams())
sysm = build_system(jnp.asarray(source), R0, t0, corr)
print(f"valid: {int(sysm.num_valid)} (golden 197)")
print(f"rmse: {float(sysm.rmse):.8f} (golden 0.31669773)")
print(f"fitness: {float(sysm.fitness):.8f} (golden 0.05170590)")
print(f"objective: {float(sysm.objective):.8f} (golden 3.71012454)")
w, V = symmetric_eigh(sysm.H)
print("eigenvalues:", np.array2string(np.asarray(w), precision=3))
print("golden     : [0.629 5.581 16.772 683.235 1993.284 9342.336]")
print("gradient   :", np.array2string(-np.asarray(sysm.g), precision=4))
print("golden grad: [-11.531 58.0071 10.0009 4.9088 1.8195 0.2805]")
