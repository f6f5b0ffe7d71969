"""Unit tests for the Jacobi eigensolver and small solvers vs numpy/LAPACK."""
import numpy as np
import jax.numpy as jnp
import pytest

from dcreg_tpu.ops import linalg

RNG = np.random.default_rng(7)


class TestSymmetricEigh:
    def _check(self, A, atol=1e-9):
        w, V = linalg.symmetric_eigh(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        w_np = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(w, w_np, atol=atol * max(1, np.abs(w_np).max()))
        # eigen equation + orthonormality
        np.testing.assert_allclose(A @ V, V * w[None, :],
                                   atol=1e-8 * max(1, np.abs(w_np).max()))
        np.testing.assert_allclose(V.T @ V, np.eye(A.shape[0]), atol=1e-10)
        # ascending order (Eigen SelfAdjointEigenSolver convention)
        assert np.all(np.diff(w) >= -1e-12)

    def test_random_6x6(self):
        for _ in range(10):
            A = RNG.normal(size=(6, 6)); A = A + A.T
            self._check(A)

    def test_random_3x3(self):
        for _ in range(10):
            A = RNG.normal(size=(3, 3)); A = A + A.T
            self._check(A)

    def test_psd_gn_like(self):
        """Spread resembling the benchmark Hessian (cond ~ 1.5e4)."""
        Q, _ = np.linalg.qr(RNG.normal(size=(6, 6)))
        lam = np.array([0.63, 5.6, 16.9, 683.0, 1993.0, 9342.0])
        A = Q @ np.diag(lam) @ Q.T
        w, _ = linalg.symmetric_eigh(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(w), np.sort(lam), rtol=1e-10)

    def test_diagonal_input(self):
        A = np.diag([3.0, -1.0, 2.0, 0.0, 5.0, 4.0])
        self._check(A)

    def test_near_converged_tiny_offdiag(self):
        """Regression: huge tau must not overflow (hypot path)."""
        A = np.diag([3.0, 3.6, 1.0, 2.0, 5.0, 4.0])
        A[0, 1] = A[1, 0] = 1e-21
        self._check(A)

    def test_batched(self):
        A = RNG.normal(size=(4, 6, 6)); A = A + np.swapaxes(A, -1, -2)
        w, V = linalg.symmetric_eigh(jnp.asarray(A))
        for i in range(4):
            np.testing.assert_allclose(np.asarray(w[i]), np.linalg.eigvalsh(A[i]),
                                       atol=1e-9)

    def test_float32(self):
        A = RNG.normal(size=(6, 6)).astype(np.float32); A = A + A.T
        w, _ = linalg.symmetric_eigh(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(A),
                                   atol=1e-4)


class TestPsdSvd:
    def test_matches_svd(self):
        A = RNG.normal(size=(6, 6)); A = A @ A.T  # PSD
        w, V = linalg.symmetric_eigh(jnp.asarray(A))
        sv, U = linalg.psd_svd_from_eigh(w, V)
        sv_np = np.linalg.svd(A, compute_uv=False)
        np.testing.assert_allclose(np.asarray(sv), sv_np, rtol=1e-9)
        # descending
        assert np.all(np.diff(np.asarray(sv)) <= 1e-12)


class TestSolvers:
    def test_solve_6x6(self):
        A = RNG.normal(size=(6, 6)); A = A @ A.T + np.eye(6)
        b = RNG.normal(size=6)
        x = np.asarray(linalg.solve_qr_6x6(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9)

    def test_inv_3x3(self):
        A = RNG.normal(size=(3, 3)) + 2 * np.eye(3)
        inv, det = linalg.inv_3x3(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(A), rtol=1e-10)
        np.testing.assert_allclose(float(det), np.linalg.det(A), rtol=1e-10)

    def test_lstsq_normal(self):
        A = RNG.normal(size=(5, 3))
        b = RNG.normal(size=5)
        x, _ = linalg.solve_lstsq_normal(jnp.asarray(A), jnp.asarray(b))
        x_np, *_ = np.linalg.lstsq(A, b, rcond=None)
        np.testing.assert_allclose(np.asarray(x), x_np, rtol=1e-8)

    def test_condition_number(self):
        w = jnp.asarray([0.5, 2.0, 10.0])
        assert np.isclose(float(linalg.condition_number(w)), 20.0)
        w0 = jnp.asarray([0.0, 2.0, 10.0])
        assert float(linalg.condition_number(w0)) > 1e12


class TestEigh3Closed:
    def _check(self, A, atol=1e-10):
        w, V = linalg.eigh3_closed(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        scale = max(1.0, np.abs(A).max())
        np.testing.assert_allclose(w, np.linalg.eigvalsh(A), atol=atol * scale)
        np.testing.assert_allclose(A @ V, V * w[None, :], atol=5e-9 * scale)
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-10)
        assert np.all(np.diff(w) >= -1e-12 * scale)

    def test_random(self):
        for _ in range(50):
            A = RNG.normal(size=(3, 3)); A = A + A.T
            self._check(A)

    def test_schur_like_spectrum(self):
        Q, _ = np.linalg.qr(RNG.normal(size=(3, 3)))
        A = Q @ np.diag([0.63, 5.60, 16.87]) @ Q.T
        self._check(A)

    def test_repeated_eigenvalues(self):
        self._check(np.eye(3) * 4.2)
        Q, _ = np.linalg.qr(RNG.normal(size=(3, 3)))
        self._check(Q @ np.diag([2.0, 2.0, 7.0]) @ Q.T)
        self._check(Q @ np.diag([2.0, 7.0, 7.0]) @ Q.T)
        self._check(np.zeros((3, 3)))

    def test_near_repeated(self):
        Q, _ = np.linalg.qr(RNG.normal(size=(3, 3)))
        self._check(Q @ np.diag([1.0, 1.0 + 1e-9, 5.0]) @ Q.T)

    def test_batched(self):
        A = RNG.normal(size=(17, 3, 3)); A = A + np.swapaxes(A, -1, -2)
        w, V = map(np.asarray, linalg.eigh3_closed(jnp.asarray(A)))
        for i in range(17):
            np.testing.assert_allclose(w[i], np.linalg.eigvalsh(A[i]), atol=1e-9)
            np.testing.assert_allclose(A[i] @ V[i], V[i] * w[i][None, :], atol=1e-8)


class TestCholeskySolve6x6:
    def test_spd_solve(self):
        for _ in range(20):
            J = RNG.normal(size=(40, 6))
            H = J.T @ J + 1e-3 * np.eye(6)
            g = RNG.normal(size=6)
            x, ok = linalg.cholesky_solve_6x6(jnp.asarray(H), jnp.asarray(g))
            assert bool(ok)
            np.testing.assert_allclose(np.asarray(x), np.linalg.solve(H, g),
                                       rtol=1e-8, atol=1e-10)

    def test_not_pd_flagged(self):
        H = -np.eye(6)
        _, ok = linalg.cholesky_solve_6x6(jnp.asarray(H), jnp.ones(6))
        assert not bool(ok)

    def test_batched(self):
        J = RNG.normal(size=(8, 40, 6))
        H = np.einsum('bij,bik->bjk', J, J) + 1e-3 * np.eye(6)
        g = RNG.normal(size=(8, 6))
        x, ok = linalg.cholesky_solve_6x6(jnp.asarray(H), jnp.asarray(g))
        for i in range(8):
            np.testing.assert_allclose(np.asarray(x[i]),
                                       np.linalg.solve(H[i], g[i]), rtol=1e-7)
