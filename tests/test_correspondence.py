"""Correspondence pipeline tests: KNN vs scipy KD-tree, plane fit vs
numpy lstsq, and the golden first-iteration spectrum of the shifted-cylinder
benchmark (results/simulation/table3_fig9_fig10)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from dcreg_tpu.ops import knn as knn_mod
from dcreg_tpu.ops import se3, linalg
from dcreg_tpu.ops.correspondence import (CorrespondenceParams, fit_planes,
                                          find_correspondences,
                                          householder_lstsq)
from dcreg_tpu.ops.gauss_newton import build_system
from tests.conftest import requires_reference

RNG = np.random.default_rng(3)


class TestKNN:
    def test_vs_kdtree(self):
        target = RNG.normal(size=(500, 3)) * 10
        query = RNG.normal(size=(200, 3)) * 10
        d, i = knn_mod.knn(jnp.asarray(query), jnp.asarray(target), k=5,
                           chunk=128)
        tree = cKDTree(target)
        d_ref, i_ref = tree.query(query, k=5)
        np.testing.assert_array_equal(np.asarray(i), i_ref)
        np.testing.assert_allclose(np.sqrt(np.asarray(d)), d_ref, rtol=1e-10)

    def test_with_refine_f32(self):
        target = (RNG.normal(size=(1000, 3)) * 10 + 100).astype(np.float32)
        query = target[:300] + RNG.normal(size=(300, 3)).astype(np.float32) * 0.01
        d, i = knn_mod.knn(jnp.asarray(query), jnp.asarray(target), k=5,
                           chunk=128, refine=10)
        tree = cKDTree(target.astype(np.float64))
        d_ref, i_ref = tree.query(query.astype(np.float64), k=5)
        # f32 + refinement: index agreement on non-tied neighbors
        agree = (np.asarray(i) == i_ref).mean()
        assert agree > 0.99, agree

    def test_masked_target(self):
        target = RNG.normal(size=(100, 3))
        valid = np.ones(100, bool); valid[:50] = False
        q = target[:10]
        d, i = knn_mod.knn(jnp.asarray(q), jnp.asarray(target),
                           jnp.asarray(valid), k=3, chunk=16)
        assert np.all(np.asarray(i) >= 50)

    def test_nn1(self):
        target = RNG.normal(size=(300, 3))
        query = RNG.normal(size=(40, 3))
        d, i = knn_mod.nn1(jnp.asarray(query), jnp.asarray(target), chunk=16)
        tree = cKDTree(target)
        d_ref, i_ref = tree.query(query, k=1)
        np.testing.assert_array_equal(np.asarray(i), i_ref)


class TestPlaneFit:
    def test_householder_lstsq_vs_numpy(self):
        for _ in range(10):
            A = RNG.normal(size=(5, 3))
            b = RNG.normal(size=5)
            x = np.asarray(householder_lstsq(jnp.asarray(A), jnp.asarray(b)))
            x_np, *_ = np.linalg.lstsq(A, b, rcond=None)
            np.testing.assert_allclose(x, x_np, rtol=1e-8, atol=1e-10)

    def test_batched_lstsq(self):
        A = RNG.normal(size=(12, 5, 3))
        b = RNG.normal(size=(12, 5))
        x = np.asarray(householder_lstsq(jnp.asarray(A), jnp.asarray(b)))
        for i in range(12):
            x_np, *_ = np.linalg.lstsq(A[i], b[i], rcond=None)
            np.testing.assert_allclose(x[i], x_np, rtol=1e-7, atol=1e-9)

    def test_plane_recovery(self):
        """Points exactly on plane n.p + d = 0 recover (n, d) up to sign."""
        n_true = np.array([0.3, -0.5, 0.81])
        n_true /= np.linalg.norm(n_true)
        d_true = 0.7
        # 5 points on the plane
        basis = np.linalg.svd(n_true[None])[2][1:]
        pts = (-d_true * n_true)[None] + RNG.normal(size=(5, 2)) @ basis
        normal, d, ok = fit_planes(jnp.asarray(pts[None]))
        assert bool(ok[0])
        n_est, d_est = np.asarray(normal[0]), float(d[0])
        sign = np.sign(n_est @ n_true)
        np.testing.assert_allclose(sign * n_est, n_true, atol=1e-8)
        np.testing.assert_allclose(sign * d_est, d_true, atol=1e-8)


@requires_reference
class TestGoldenIter0:
    """First GN iteration on the cylinder pair must reproduce the recorded
    spectrum/conds (condition_numbers_detailed.csv row FCN-SR,0 and
    degeneracy_analysis_first_iter.txt)."""

    @pytest.fixture(scope="class")
    def system(self, cylinder_clouds):
        source, target, T0, _ = cylinder_clouds
        R0, t0 = jnp.asarray(T0[:3, :3]), jnp.asarray(T0[:3, 3])
        corr = find_correspondences(jnp.asarray(source), R0, t0,
                                    jnp.asarray(target))
        return build_system(jnp.asarray(source), R0, t0, corr), corr

    def test_effective_points(self, system):
        sysm, corr = system
        # golden: 197 effective points at iteration 0
        assert int(sysm.num_valid) == 197

    def test_rmse_fitness(self, system):
        sysm, _ = system
        assert abs(float(sysm.rmse) - 0.316698) < 1e-5
        assert abs(float(sysm.fitness) - 0.0517059) < 1e-6

    def test_eigenvalues(self, system):
        sysm, _ = system
        w, _ = linalg.symmetric_eigh(sysm.H)
        golden = np.array([0.629297, 5.58111, 16.7715, 683.235, 1993.28, 9342.34])
        np.testing.assert_allclose(np.asarray(w), golden, rtol=1e-4)

    def test_gradient_golden(self, system):
        """iteration_details_with_dx.csv row 0: grad = -J^T b."""
        sysm, _ = system
        golden_grad = np.array([-11.53098942, 58.00713490, 10.00087886,
                                4.90875050, 1.81945118, 0.28048504])
        np.testing.assert_allclose(-np.asarray(sysm.g), golden_grad, rtol=1e-4)

    def test_objective_golden(self, system):
        sysm, _ = system
        assert abs(float(sysm.objective) - 3.71012454) < 1e-4
