"""Unit tests for the previously-untested model zoo: Euler/LOAM engine,
SuperLoc, O3D-style ICP, and the voxel-grid fast path through each.

Oracles follow the reference's own cross-implementation strategy
(icp_test_runner.h:66-102: Euler vs SO(3) engines on well-conditioned
data; supp.pdf masks for SuperLoc's observability analysis).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
from dcreg_tpu.models.icp_euler import icp_point_to_plane_euler
from dcreg_tpu.models.o3d_style import o3d_icp
from dcreg_tpu.models.superloc import superloc_register
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.ops.voxel_grid import build_grid_index
from dcreg_tpu.ops import se3

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def terrain():
    """Well-conditioned smooth surface: constrains all six DoF."""
    n = 3200
    x = RNG.uniform(-6, 6, n)
    y = RNG.uniform(-6, 6, n)
    z = 0.8 * np.sin(0.7 * x) + 0.6 * np.cos(0.5 * y) + 0.1 * np.sin(x * y / 5)
    pts = np.stack([x, y, z], axis=1)
    return jnp.asarray(pts, jnp.float64)


@pytest.fixture(scope="module")
def init_pose():
    pose = jnp.asarray([0.004, -0.006, 0.01, 0.05, -0.08, 0.04], jnp.float64)
    T0 = se3.pose6d_to_matrix(pose)
    return T0[:3, :3], T0[:3, 3]


class TestEulerEngine:
    def test_matches_so3_on_well_conditioned(self, terrain, init_pose):
        R0, t0 = init_pose
        params = ICPParams()
        so3 = icp_point_to_plane_so3(
            terrain, terrain, R0, t0, DetectionMethod.NONE,
            HandlingMethod.NONE, params)
        eul = icp_point_to_plane_euler(
            terrain, terrain, R0, t0, DetectionMethod.NONE,
            HandlingMethod.NONE, params)
        assert bool(so3.converged) and bool(eul.converged)
        T_so3 = np.asarray(se3.se3_matrix(so3.R, so3.t))
        T_eul = np.asarray(se3.se3_matrix(eul.R, eul.t))
        te_s, re_s = se3.pose_error(jnp.eye(4, dtype=jnp.float64),
                                    jnp.asarray(T_so3))
        te_e, re_e = se3.pose_error(jnp.eye(4, dtype=jnp.float64),
                                    jnp.asarray(T_eul))
        # both recover GT (identity) on well-conditioned data ...
        assert float(te_s) < 5e-3 and float(re_s) < 0.05
        assert float(te_e) < 5e-3 and float(re_e) < 0.05
        # ... and agree with each other (the reference's oracle)
        np.testing.assert_allclose(T_eul, T_so3, atol=2e-3)

    def test_grid_path_matches_brute(self, terrain, init_pose):
        R0, t0 = init_pose
        params = ICPParams()
        grid = build_grid_index(np.asarray(terrain),
                                params.corr.search_radius,
                                dtype=jnp.float64)
        brute = icp_point_to_plane_euler(
            terrain, terrain, R0, t0, DetectionMethod.NONE,
            HandlingMethod.NONE, params)
        fast = icp_point_to_plane_euler(
            terrain, terrain, R0, t0, DetectionMethod.NONE,
            HandlingMethod.NONE, params, grid=grid)
        np.testing.assert_allclose(np.asarray(fast.t), np.asarray(brute.t),
                                   atol=1e-6)
        assert int(fast.iterations) == int(brute.iterations)


class TestO3DStyle:
    def test_converges_on_well_conditioned(self, terrain, init_pose):
        R0, t0 = init_pose
        res = o3d_icp(terrain, terrain, R0, t0, ICPParams())
        assert bool(res.converged)
        assert int(res.iterations) <= 30
        te, re = se3.pose_error(jnp.eye(4, dtype=jnp.float64),
                                se3.se3_matrix(res.R, res.t))
        assert float(te) < 0.01 and float(re) < 0.1

    def test_grid_path_matches_brute(self, terrain, init_pose):
        R0, t0 = init_pose
        params = ICPParams()
        grid = build_grid_index(np.asarray(terrain),
                                params.corr.search_radius,
                                dtype=jnp.float64)
        brute = o3d_icp(terrain, terrain, R0, t0, params)
        fast = o3d_icp(terrain, terrain, R0, t0, params, grid=grid)
        np.testing.assert_allclose(np.asarray(fast.t), np.asarray(brute.t),
                                   atol=1e-6)


class TestSuperLoc:
    def test_reduces_error_on_well_conditioned(self, terrain, init_pose):
        R0, t0 = init_pose
        res, info = superloc_register(terrain, terrain, R0, t0, ICPParams())
        te0, _ = se3.pose_error(jnp.eye(4, dtype=jnp.float64),
                                se3.se3_matrix(R0, t0))
        te, _ = se3.pose_error(jnp.eye(4, dtype=jnp.float64),
                               se3.se3_matrix(res.R, res.t))
        # one outer iteration (reference behavior: the loop breaks after
        # the first successful Ceres solve, superloc.cpp:532-537) of 4 GN
        # steps must cut the initial error substantially
        assert float(te) < 0.3 * float(te0)
        # z is the best-constrained translation on a height-field surface
        unc = np.asarray(info.uncertainties)    # [x y z roll pitch yaw]
        assert unc[2] >= max(unc[0], unc[1])

    def test_degenerate_plane_masks(self):
        """Single z=0 plane: x/y translation + yaw unobservable
        (superloc.cpp:800-854 threshold semantics)."""
        n = 2500
        pts = np.stack([RNG.uniform(-5, 5, n), RNG.uniform(-5, 5, n),
                        0.002 * RNG.normal(size=n)], axis=1)
        cloud = jnp.asarray(pts, jnp.float64)
        T0 = se3.pose6d_to_matrix(
            jnp.asarray([0.002, -0.002, 0.0, 0.0, 0.0, 0.02], jnp.float64))
        res, info = superloc_register(cloud, cloud, T0[:3, :3], T0[:3, 3],
                                      ICPParams())
        assert bool(info.is_degenerate)
        mask = np.asarray(info.degeneracy_mask)   # [roll pitch yaw | x y z]
        assert bool(mask[2])   # yaw degenerate
        assert bool(mask[3]) and bool(mask[4])   # x, y degenerate
        assert not bool(mask[5])                 # z observable
        unc = np.asarray(info.uncertainties)     # [x y z roll pitch yaw]
        assert unc[2] > 0.5            # z well constrained
        assert unc[0] < 0.2 and unc[1] < 0.2

    def test_grid_path_matches_brute(self, terrain, init_pose):
        R0, t0 = init_pose
        params = ICPParams()
        grid = build_grid_index(np.asarray(terrain),
                                params.corr.search_radius,
                                dtype=jnp.float64)
        brute, _ = superloc_register(terrain, terrain, R0, t0, params)
        fast, _ = superloc_register(terrain, terrain, R0, t0, params,
                                    grid=grid)
        np.testing.assert_allclose(np.asarray(fast.t), np.asarray(brute.t),
                                   atol=1e-5)
