"""Autodiff Jacobian oracles.

The reference triangulates its hand-derived Jacobians against Ceres
AutoDiff/NumericDiff (icp_test_runner.cpp:3164-3177, superloc.cpp:418-424,
README.md:61).  JAX makes the same cross-check nearly free: differentiate
the point-to-plane residual through the engine's own retraction and compare
against the hand-rolled rows.  Catches sign/frame/convention bugs that the
golden cylinder pair (nearly axis-aligned, small angles) cannot.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcreg_tpu.ops import se3
from dcreg_tpu.ops.correspondence import Correspondences
from dcreg_tpu.ops.gauss_newton import build_system


def _random_scene(n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-4, 4, (n, 3)))
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = jnp.asarray(normals)
    d_off = jnp.asarray(rng.uniform(-1, 1, n))
    R = jnp.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.7, 3))))
    t = jnp.asarray(rng.uniform(-2, 2, 3))
    return pts, normals, d_off, R, t


def test_so3_rows_match_right_perturbation_autodiff():
    """gauss_newton.build_system rows [p x (R^T n), R^T n] must equal
    d/d(delta) of n . (R exp(w) p + t + R v) at delta = 0 -- the right
    boxplus (se3.boxplus) the SO3 engine applies."""
    pts, normals, d_off, R, t = _random_scene()

    def residual(delta, p, n, d):
        Rn, tn = se3.boxplus(R, t, delta)
        return n @ (Rn @ p + tn) + d

    J_auto = jax.vmap(
        lambda p, n, d: jax.grad(residual)(jnp.zeros(6), p, n, d)
    )(pts, normals, d_off)

    # hand-rolled rows via build_system with unit weights, no ramp term
    corr = Correspondences(
        valid=jnp.ones(len(pts), bool), in_radius=jnp.ones(len(pts), bool),
        normal=normals,
        residual=jnp.einsum('nj,nj->n', pts @ R.T + t, normals) + d_off,
        weight=jnp.ones(len(pts)), nn_idx=jnp.zeros((len(pts), 5), jnp.int32))
    nR = normals @ R
    J_hand = jnp.concatenate([jnp.cross(pts, nR), nR], axis=-1)
    np.testing.assert_allclose(np.asarray(J_hand), np.asarray(J_auto),
                               rtol=1e-9, atol=1e-10)

    # and the full build_system H must equal J^T J of the autodiff rows
    sysm = build_system(pts, R, t, corr, use_weight_derivative=False)
    np.testing.assert_allclose(np.asarray(sysm.H),
                               np.asarray(J_auto.T @ J_auto),
                               rtol=1e-8, atol=1e-9)


def test_euler_rows_match_pose_autodiff():
    """icp_euler._euler_jacobian_rows (the LOAM trig Jacobian with its axis
    swap, icp_test_runner.cpp:2299-2344) must equal d/d(pose) of
    s*n . (R(pose) p + t(pose)) under the engine's own pose6d_to_matrix
    (ZYX) convention -- the additive Euler update's true linearization."""
    from dcreg_tpu.models.icp_euler import _euler_jacobian_rows

    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-4, 4, (64, 3)))
    wn = jnp.asarray(rng.normal(size=(64, 3)) * 0.7)   # weighted normals
    pose = jnp.asarray(rng.uniform(-0.5, 0.5, 6))

    def residual(pose_, p, n):
        T = se3.pose6d_to_matrix(pose_)
        return n @ (T[:3, :3] @ p + T[:3, 3])

    J_auto = jax.vmap(
        lambda p, n: jax.grad(residual)(pose, p, n))(pts, wn)
    J_hand = _euler_jacobian_rows(pts, wn, pose)
    np.testing.assert_allclose(np.asarray(J_hand), np.asarray(J_auto),
                               rtol=1e-7, atol=1e-9)


def test_xicp_rows_match_left_perturbation_autodiff():
    """The XICP engine's F rows [p_w x n, n] (xicp.py body; reference
    icp_test_runner.cpp:3016-3055) must equal d/d(delta) of
    n . (exp(w)(R p + t) + v - q) at 0 -- the LEFT boxplus
    (se3.boxplus_left) that engine applies."""
    pts, normals, d_off, R, t = _random_scene(seed=2)
    tgt = pts @ R.T + t - 0.1 * normals    # arbitrary matched targets

    def residual(delta, p, n, q):
        Rn, tn = se3.boxplus_left(R, t, delta)
        return n @ (Rn @ p + tn - q)

    J_auto = jax.vmap(
        lambda p, n, q: jax.grad(residual)(jnp.zeros(6), p, n, q)
    )(pts, normals, tgt)

    src_w = pts @ R.T + t
    J_hand = jnp.concatenate(
        [jnp.cross(src_w, normals), normals], axis=-1)
    np.testing.assert_allclose(np.asarray(J_hand), np.asarray(J_auto),
                               rtol=1e-9, atol=1e-10)


def test_weight_derivative_rows_match_full_autodiff():
    """use_weight_derivative=True scales rows by (s + r ds/dr) -- the
    product-rule derivative of the WEIGHTED residual s(r) * r
    (icp_test_runner.cpp:1891-1898).  Check against autodiff of
    s(r(delta)) * r(delta) through the right retraction."""
    pts, normals, d_off, R, t = _random_scene(seed=3)
    slope = 0.9

    def wres(delta, p, n, d):
        Rn, tn = se3.boxplus(R, t, delta)
        r = n @ (Rn @ p + tn) + d
        s = jnp.maximum(0.0, 1.0 - slope * jnp.abs(r))
        return s * r

    J_auto = jax.vmap(
        lambda p, n, d: jax.grad(wres)(jnp.zeros(6), p, n, d)
    )(pts, normals, d_off)

    r = jnp.einsum('nj,nj->n', pts @ R.T + t, normals) + d_off
    s = jnp.maximum(0.0, 1.0 - slope * jnp.abs(r))
    on_ramp = (s > 0.0) & (s < 1.0)
    ds_dr = jnp.where(on_ramp, -slope * jnp.sign(r), 0.0)
    nR = normals @ R
    J_r = jnp.concatenate([jnp.cross(pts, nR), nR], axis=-1)
    J_hand = J_r * (s + r * ds_dr)[:, None]
    np.testing.assert_allclose(np.asarray(J_hand), np.asarray(J_auto),
                               rtol=1e-9, atol=1e-10)
