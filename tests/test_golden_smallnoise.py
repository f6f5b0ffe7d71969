"""Golden parity vs the reference's SECOND archived scenario:
``DCReg/dataset/icp_results/`` -- the same cylinder pair under pure
1 cm translation noise (complete_log.txt: x=y=z=0.01, rpy=0), plain
(non-weight-derivative) Jacobian.  Reverse-engineering check: with
use_weight_derivative=False the iteration-0 gradient reproduces the
archived [-47.1679, 55.5756, 4.9733, 3.8417, 4.9809, -0.2061] to ~1e-4
(with the flag on it differs by ~2%), pinning the archived run's
icp_test_runner.cpp:1691 flag setting.

Note: the archived iteration_details_with_dx.csv carries the reference
writer's column quirk -- Trans_Error_m/Rot_Error_deg hold each other's
values (cross-checked against statistics_summary.txt, which reports
FCN-SR trans 0.017261 m / rot 0.065986 deg); comparisons below use
all_results.csv, which is unambiguous.
"""
import csv
import os

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import requires_reference

from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
from dcreg_tpu.ops.correspondence import find_correspondences
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.ops.gauss_newton import build_system

GOLD = "/root/reference/DCReg/dataset/icp_results"

METHODS = {
    "ME-SR": (DetectionMethod.FULL_EVD_MIN_EIGENVALUE,
              HandlingMethod.SOLUTION_REMAPPING),
    "ME-TSVD": (DetectionMethod.FULL_EVD_MIN_EIGENVALUE,
                HandlingMethod.TRUNCATED_SVD),
    "ME-TReg": (DetectionMethod.FULL_EVD_MIN_EIGENVALUE,
                HandlingMethod.STANDARD_REGULARIZATION),
    "FCN-SR": (DetectionMethod.FULL_SVD_CONDITION,
               HandlingMethod.SOLUTION_REMAPPING),
}


@pytest.fixture(scope="module")
def gold_rows():
    rows = {}
    with open(os.path.join(GOLD, "all_results.csv")) as f:
        for r in csv.DictReader(f):
            rows[r["Method"]] = r
    return rows


@requires_reference
class TestSmallNoiseGolden:
    def test_iteration0_gradient_and_rmse(self, cylinder_clouds):
        _, target, _, _ = cylinder_clouds
        src = jnp.asarray(target)
        R0 = jnp.eye(3, dtype=jnp.float64)
        t0 = jnp.asarray([0.01, 0.01, 0.01], jnp.float64)
        corr = find_correspondences(src, R0, t0, src)
        sysm = build_system(src, R0, t0, corr, use_weight_derivative=False)
        # iteration_details_with_dx.csv FCN-SR row 0 (RMSE + grad_*)
        assert np.isclose(float(sysm.rmse), 0.03335698, atol=2e-6)
        np.testing.assert_allclose(
            -np.asarray(sysm.g),
            [-47.16787056, 55.57558355, 4.97326544,
             3.84171777, 4.98091287, -0.20608970], rtol=2e-4)

    @pytest.mark.parametrize("name", sorted(METHODS))
    def test_trajectory_matches_archive(self, cylinder_clouds, gold_rows,
                                        name):
        _, target, _, _ = cylinder_clouds
        src = jnp.asarray(target)
        det, hand = METHODS[name]
        params = ICPParams(use_weight_derivative=False)
        res = icp_point_to_plane_so3(
            src, src, jnp.eye(3, dtype=jnp.float64),
            jnp.asarray([0.01, 0.01, 0.01], jnp.float64), det, hand,
            params, T_gt=jnp.eye(4, dtype=jnp.float64))
        g = gold_rows[name]
        assert int(res.iterations) == int(g["Iterations"]), name
        last = int(res.iterations) - 1
        te = float(res.log.trans_error[last])
        re = float(res.log.rot_error_deg[last])
        rmse = float(res.log.rmse[last])
        assert np.isclose(te, float(g["Trans_Error_m"]), atol=5e-4), \
            (name, te, g["Trans_Error_m"])
        assert np.isclose(re, float(g["Rot_Error_deg"]), atol=5e-3), \
            (name, re, g["Rot_Error_deg"])
        assert np.isclose(rmse, float(g["ICP_RMSE"]), atol=5e-4), \
            (name, rmse, g["ICP_RMSE"])


    def test_xicp_matches_archive(self, cylinder_clouds, gold_rows):
        """Archived XICP row: essentially exact recovery (TE 3.4e-6 m,
        RE 1.3e-6 deg) in 2 iterations."""
        from dcreg_tpu.models.xicp import xicp_register
        _, target, _, _ = cylinder_clouds
        src = jnp.asarray(target)
        params = ICPParams(use_weight_derivative=False)
        res = xicp_register(
            src, src, jnp.eye(3, dtype=jnp.float64),
            jnp.asarray([0.01, 0.01, 0.01], jnp.float64),
            DetectionMethod.XICP_INEQUALITY, HandlingMethod.XICP_CONSTRAINT,
            params, T_gt=jnp.eye(4, dtype=jnp.float64))
        g = gold_rows["XICP"]
        assert int(res.iterations) <= int(g["Iterations"]) + 1
        last = int(res.iterations) - 1
        te = float(res.log.trans_error[last])
        re = float(res.log.rot_error_deg[last])
        # near-exact recovery like the archive (micro-scale errors)
        assert te < 1e-4, te
        assert re < 1e-3, re
