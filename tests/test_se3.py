"""Unit tests for the SO(3)/SE(3) math core against closed-form identities
and finite differences (SURVEY.md section 4: math kernels vs closed form)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcreg_tpu.ops import se3

RNG = np.random.default_rng(42)


def rand_omega(scale=1.0, n=None):
    if n is None:
        return jnp.asarray(RNG.normal(scale=scale, size=3))
    return jnp.asarray(RNG.normal(scale=scale, size=(n, 3)))


class TestSkewExpLog:
    def test_skew_antisymmetric(self):
        v = rand_omega()
        S = se3.skew(v)
        np.testing.assert_allclose(np.asarray(S), -np.asarray(S).T, atol=1e-15)

    def test_skew_cross(self):
        v, w = rand_omega(), rand_omega()
        np.testing.assert_allclose(np.asarray(se3.skew(v) @ w),
                                   np.cross(np.asarray(v), np.asarray(w)),
                                   atol=1e-14)

    def test_exp_orthogonal(self):
        R = se3.exp_so3(rand_omega())
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(np.asarray(R)), 1.0)

    def test_exp_log_roundtrip(self):
        for scale in [1e-12, 1e-6, 0.1, 1.0, 2.0]:
            w = rand_omega(scale)
            w2 = se3.log_so3(se3.exp_so3(w))
            np.testing.assert_allclose(np.asarray(w2), np.asarray(w),
                                       atol=1e-9, rtol=1e-7)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        for theta in [np.pi - 1e-4, np.pi - 1e-7]:
            w = jnp.asarray(axis * theta)
            w2 = np.asarray(se3.log_so3(se3.exp_so3(w)))
            np.testing.assert_allclose(w2, axis * theta, atol=1e-5)

    def test_exp_small_angle(self):
        w = rand_omega(1e-11)
        R = np.asarray(se3.exp_so3(w))
        np.testing.assert_allclose(R, np.eye(3) + np.asarray(se3.skew(w)),
                                   atol=1e-20)

    def test_batched(self):
        ws = rand_omega(n=7)
        Rs = se3.exp_so3(ws)
        assert Rs.shape == (7, 3, 3)
        for i in range(7):
            np.testing.assert_allclose(np.asarray(Rs[i]),
                                       np.asarray(se3.exp_so3(ws[i])), atol=1e-14)


class TestJacobians:
    def test_right_jacobian_finite_diff(self):
        """Defining identity: exp(w + dw) ~ exp(w) exp(Jr(w) dw)."""
        w = rand_omega()
        Jr = np.asarray(se3.right_jacobian_so3(w))
        eps = 1e-7
        for k in range(3):
            dw = np.zeros(3); dw[k] = eps
            R1 = np.asarray(se3.exp_so3(jnp.asarray(np.asarray(w) + dw)))
            R2 = np.asarray(se3.exp_so3(w) @ se3.exp_so3(jnp.asarray(Jr @ dw)))
            np.testing.assert_allclose(R1, R2, atol=1e-12)

    def test_right_jacobian_inverse(self):
        w = rand_omega()
        J = np.asarray(se3.right_jacobian_so3(w))
        Jinv = np.asarray(se3.right_jacobian_inv_so3(w))
        np.testing.assert_allclose(J @ Jinv, np.eye(3), atol=1e-10)

    def test_right_jacobian_small_angle(self):
        w = rand_omega(1e-11)
        J = np.asarray(se3.right_jacobian_so3(w))
        np.testing.assert_allclose(J, np.eye(3) - 0.5 * np.asarray(se3.skew(w)),
                                   atol=1e-18)

    def test_point_to_plane_jacobian_autodiff(self):
        """Analytic row matches d/d(delta) of n.(R exp(w)(p) + t + R v) at 0."""
        p = rand_omega()
        n = rand_omega(); n = n / jnp.linalg.norm(n)
        R = se3.exp_so3(rand_omega())
        t = rand_omega()

        def resid(delta):
            R2, t2 = se3.boxplus(R, t, delta)
            return jnp.dot(n, R2 @ p + t2)

        J_auto = np.asarray(jax.grad(resid)(jnp.zeros(6)))
        J_analytic = np.asarray(se3.point_to_plane_jacobian(p, n, R))
        np.testing.assert_allclose(J_analytic, J_auto, atol=1e-10)

    def test_euler_to_lie_jacobian_identity_at_zero(self):
        J = np.asarray(se3.euler_to_lie_jacobian(
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0)))
        np.testing.assert_allclose(J, np.eye(3), atol=1e-14)

    def test_euler_to_lie_gimbal_guard(self):
        J = np.asarray(se3.euler_to_lie_jacobian(
            jnp.asarray(0.3), jnp.asarray(np.pi / 2), jnp.asarray(0.1)))
        np.testing.assert_allclose(J, np.eye(3), atol=1e-12)


class TestSE3:
    def test_boxplus_zero(self):
        R = se3.exp_so3(rand_omega())
        t = rand_omega()
        R2, t2 = se3.boxplus(R, t, jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-15)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-15)

    def test_boxplus_right_convention(self):
        """boxplus(delta) == (R exp(w), t + R v) -- math_utils.hpp:158-166."""
        R = se3.exp_so3(rand_omega())
        t = rand_omega()
        delta = jnp.asarray(RNG.normal(size=6) * 0.1)
        R2, t2 = se3.boxplus(R, t, delta)
        np.testing.assert_allclose(np.asarray(R2),
                                   np.asarray(R @ se3.exp_so3(delta[:3])), atol=1e-14)
        np.testing.assert_allclose(np.asarray(t2),
                                   np.asarray(t + R @ delta[3:]), atol=1e-14)

    def test_boxplus_left_convention(self):
        R = se3.exp_so3(rand_omega())
        t = rand_omega()
        delta = jnp.asarray(RNG.normal(size=6) * 0.1)
        R2, t2 = se3.boxplus_left(R, t, delta)
        dR = se3.exp_so3(delta[:3])
        np.testing.assert_allclose(np.asarray(R2), np.asarray(dR @ R), atol=1e-14)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(dR @ t + delta[3:]),
                                   atol=1e-14)

    def test_adjoint_structure(self):
        R = se3.exp_so3(rand_omega())
        t = rand_omega()
        Ad = np.asarray(se3.adjoint(R, t))
        np.testing.assert_allclose(Ad[:3, :3], np.asarray(R), atol=1e-15)
        np.testing.assert_allclose(Ad[3:, 3:], np.asarray(R), atol=1e-15)
        np.testing.assert_allclose(Ad[:3, 3:],
                                   np.asarray(se3.skew(t) @ R), atol=1e-14)
        np.testing.assert_allclose(Ad[3:, :3], 0, atol=1e-15)


class TestEulerPose:
    def test_pose_matrix_roundtrip(self):
        pose = jnp.asarray([0.1, -0.2, 0.5, 1.0, -2.0, 3.0])
        T = se3.pose6d_to_matrix(pose)
        pose2 = se3.matrix_to_pose6d(T)
        np.testing.assert_allclose(np.asarray(pose2), np.asarray(pose), atol=1e-12)

    def test_zyx_composition(self):
        """R = Rz Ry Rx (utils.hpp:452-460)."""
        r, p, y = 0.3, -0.4, 1.2
        def rx(a): return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
        def ry(a): return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
        def rz(a): return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        expected = rz(y) @ ry(p) @ rx(r)
        got = np.asarray(se3.euler_zyx_to_rot(jnp.asarray(r), jnp.asarray(p), jnp.asarray(y)))
        np.testing.assert_allclose(got, expected, atol=1e-14)

    def test_quat_roundtrip(self):
        for _ in range(20):
            R = np.asarray(se3.exp_so3(rand_omega(2.0)))
            q = se3.rot_to_quat(jnp.asarray(R))
            R2 = np.asarray(se3.quat_to_rot(q))
            np.testing.assert_allclose(R2, R, atol=1e-12)


class TestPoseError:
    def test_identity(self):
        T = np.asarray(se3.pose6d_to_matrix(jnp.asarray([0.1, 0.2, 0.3, 1, 2, 3.])))
        te, re = se3.pose_error(jnp.asarray(T), jnp.asarray(T))
        assert float(te) < 1e-12 and float(re) < 1e-5

    def test_known_offset(self):
        """trans error = ||t_delta|| in gt frame; rot error = angle."""
        T_gt = np.eye(4)
        pose = jnp.asarray([0.0, 0.0, np.deg2rad(2.0), 0.2, 0.8, 0.5])
        T = se3.pose6d_to_matrix(pose)
        te, re = se3.pose_error(jnp.asarray(T_gt), T)
        np.testing.assert_allclose(float(te), np.sqrt(0.2**2 + 0.8**2 + 0.5**2), rtol=1e-9)
        np.testing.assert_allclose(float(re), 2.0, rtol=1e-9)


class TestOrthonormalize:
    def test_restores_rotation(self):
        """Perturbed rotations (scale + shear, the motion-model compounding
        defect) project back to SO(3); exact rotations are fixed points."""
        rng = np.random.default_rng(3)
        for _ in range(5):
            R = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 1.0, 3))))
            Ro = np.asarray(se3.orthonormalize(jnp.asarray(R)))
            np.testing.assert_allclose(Ro, R, atol=1e-12)
            E = rng.normal(0, 1e-3, (3, 3))
            Rp = R * (1.0 - 2e-3) + E            # scale + shear defect
            Ro = np.asarray(se3.orthonormalize(jnp.asarray(Rp)))
            np.testing.assert_allclose(Ro @ Ro.T, np.eye(3), atol=1e-12)
            np.testing.assert_allclose(np.linalg.det(Ro), 1.0, atol=1e-12)
            assert np.abs(Ro - R).max() < 5e-3

    def test_chain_compounding_regression(self):
        """The constant-velocity composition R1 @ (R2^T @ R1) run for 40
        steps in f32: WITHOUT projection det(R) drifts off 1, WITH it the
        defect stays at rounding level (the corridor-chain bug)."""
        rng = np.random.default_rng(5)
        step = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.0, 0.03])),
                          np.float32)
        for project in (False, True):
            R2 = np.eye(3, dtype=np.float32)
            R1 = step.copy()
            defects = []
            for _ in range(40):
                pred = (R1 @ (R2.T @ R1)).astype(np.float32)
                if project:
                    pred = np.asarray(
                        se3.orthonormalize(jnp.asarray(pred)), np.float32)
                # the registration right-multiplies a small exact rotation
                upd = np.asarray(se3.exp_so3(
                    jnp.asarray(rng.normal(0, 1e-4, 3))), np.float32)
                R2, R1 = R1, (pred @ upd).astype(np.float32)
                defects.append(abs(np.linalg.det(R1.astype(np.float64))
                                   - 1.0))
            if project:
                assert max(defects) < 1e-5, max(defects)
            else:
                assert max(defects) > 1e-5   # the defect the fix removes
