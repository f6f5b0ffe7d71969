"""SO(3)/SE(3) manifold math core (L0).

TPU-native rebuild of the reference math layer
(``DCReg/include/math_utils.hpp:11-197`` and the Euler pose helpers at
``DCReg/include/utils.hpp:452-486``).  Everything here is pure ``jnp``:
batched via ``vmap``, differentiable, and shape-static so it fuses under
``jit`` on TPU.  All small-angle branches use ``jnp.where`` (branchless) with
Taylor fallbacks so the functions are safe under vmap/jit and have finite
gradients at theta == 0.

Conventions (identical to the reference):
  * state tangent ordering is ``[omega(3), v(3)]`` -- rotation first.
  * ``boxplus`` is the *right* retraction ``(R exp(w), t + R v)``
    (math_utils.hpp:158-166); ``boxplus_left`` is the left one
    (math_utils.hpp:169-178).
  * Euler poses compose as Z * Y * X (utils.hpp:452-460).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-10


def skew(v):
    """Skew-symmetric matrix of a 3-vector (math_utils.hpp:11-17)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


def _safe_theta(theta2):
    """(small_mask, theta_safe, theta2_safe): sqrt with a NaN-free gradient
    at theta == 0 (the where-guard must sit INSIDE the sqrt)."""
    small = theta2 < 1e-10
    theta2_safe = jnp.where(small, 1.0, theta2)
    return small, jnp.sqrt(theta2_safe), theta2_safe


def exp_so3(omega):
    """Exponential map so(3) -> SO(3), Rodrigues (math_utils.hpp:20-33)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    small, theta, theta2_safe = _safe_theta(theta2)
    K = skew(omega)  # = theta * skew(axis)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def log_so3(R):
    """Logarithm map SO(3) -> so(3) (math_utils.hpp:36-46).

    Uses the antisymmetric-part formula away from theta ~ {0, pi}; near pi it
    falls back to the diagonal-based axis extraction for stability.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # generic branch: theta / (2 sin theta) * (R - R^T)
    sin_t = jnp.sin(theta)
    small = theta < 1e-6
    near_pi = theta > jnp.pi - 1e-3
    factor_generic = jnp.where(small | near_pi, 0.5,
                               theta / (2.0 * jnp.where(small | near_pi, 1.0, sin_t)))
    w_generic = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1) * factor_generic[..., None]
    # near-pi branch: axis from diagonal of (R + I)/2 = aa^T approx
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag + 1.0) * 0.5, 0.0)
    axis = jnp.sqrt(axis_sq)
    # fix signs from off-diagonals
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] < 0, -1.0, 1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] < 0, -1.0, 1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] < 0, -1.0, 1.0)
    # near pi the off-diagonal sums give relative signs; use largest component
    # positive convention seeded by the dominant axis.
    s12 = R[..., 1, 0] + R[..., 0, 1]
    s13 = R[..., 2, 0] + R[..., 0, 2]
    s23 = R[..., 2, 1] + R[..., 1, 2]
    ax = axis[..., 0]
    ay = jnp.where(s12 < 0, -axis[..., 1], axis[..., 1])
    az = jnp.where(s13 < 0, -axis[..., 2], axis[..., 2])
    axis_pi = jnp.stack([ax, ay, az], axis=-1)
    del sx, sy, sz, s23
    w_pi = axis_pi * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def right_jacobian_so3(omega):
    """Right Jacobian of SO(3) (math_utils.hpp:66-78).

    J_r = I - (1-cos t)/t * K_hat + (t - sin t)/t * K_hat^2  with K_hat =
    skew(axis).  Rewritten in terms of K = skew(omega):
    J_r = I - (1-cos t)/t^2 * K + (t - sin t)/t^3 * K^2.
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    small, theta, t2 = _safe_theta(theta2)
    K = skew(omega)
    t3 = t2 * theta
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / t3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye - b[..., None, None] * K + c[..., None, None] * (K @ K)


def right_jacobian_inv_so3(omega):
    """Inverse right Jacobian of SO(3) (math_utils.hpp:81-95)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    small, theta, t2 = _safe_theta(theta2)
    K = skew(omega)
    half = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / t2) - 0.5 * jnp.cos(half) / (theta * jnp.sin(jnp.where(small, 0.5, half))),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + 0.5 * K + cot_term[..., None, None] * (K @ K)


def point_to_plane_jacobian(point_body, normal, R):
    """1x6 point-to-plane Jacobian row [-n^T R [p]x, n^T R].

    Right-perturbation SE(3) parameterization (math_utils.hpp:102-121).
    Batched: point_body (..., 3), normal (..., 3), R (..., 3, 3) -> (..., 6).
    """
    nR = jnp.einsum('...i,...ij->...j', normal, R)  # n^T R
    # -n^T R [p]x == (n^T R) x p  (row-vector times skew == cross product)
    Jw = -jnp.einsum('...j,...jk->...k', nR, skew(point_body))
    return jnp.concatenate([Jw, nR], axis=-1)


def euler_to_lie_jacobian(roll, pitch, yaw):
    """Euler-rate -> angular-velocity covariance Jacobian
    (math_utils.hpp:125-136), with the same gimbal-lock guard."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    J = jnp.stack([
        jnp.stack([jnp.ones_like(roll), jnp.zeros_like(roll), sp], axis=-1),
        jnp.stack([jnp.zeros_like(roll), cr, -sr * cp], axis=-1),
        jnp.stack([jnp.zeros_like(roll), sr, cr * cp], axis=-1),
    ], axis=-2)
    # closed-form 3x3 inverse (TPU-safe in all dtypes, unlike LAPACK inv)
    from .linalg import inv_3x3
    Jinv, _ = inv_3x3(J)
    gimbal = jnp.abs(cp) < 1e-6
    return jnp.where(gimbal[..., None, None], jnp.eye(3, dtype=J.dtype), Jinv)


# ---------------------------------------------------------------------------
# SE(3) state operations.  A "state" is the pair (R, t) carried as a pytree
# tuple -- functional analogue of SE3State (math_utils.hpp:140-197).
# ---------------------------------------------------------------------------

def se3_matrix(R, t):
    """4x4 homogeneous matrix from (R, t)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]


def boxplus(R, t, delta):
    """Right retraction: (R exp(w), t + R v) (math_utils.hpp:158-166)."""
    omega, v = delta[..., :3], delta[..., 3:]
    R_new = R @ exp_so3(omega)
    t_new = t + jnp.einsum('...ij,...j->...i', R, v)
    return R_new, t_new


def boxplus_left(R, t, delta):
    """Left retraction: (exp(w) R, exp(w) t + v) (math_utils.hpp:169-178)."""
    omega, v = delta[..., :3], delta[..., 3:]
    dR = exp_so3(omega)
    R_new = dR @ R
    t_new = jnp.einsum('...ij,...j->...i', dR, t) + v
    return R_new, t_new


def orthonormalize(R):
    """Project a nearly-orthonormal matrix back onto SO(3) (Gram-Schmidt
    on rows; batched over leading axes).

    Rotation CHAINS need this: a constant-velocity motion model composes
    R_prev @ R_prev2^T @ R_prev every frame, which SQUARES any scale /
    shear error in the carried matrix, while boxplus only ever
    right-multiplies by exact rotations -- nothing restores
    orthonormality.  Starting from f32 rounding (~1e-7) the defect
    compounds to det(R) ~ 0.82 within ~16 frames (measured on the
    corridor chain: a 10 m scan contracted by ~30 cm, wrecking every
    registration downstream).  One Gram-Schmidt per prediction pins the
    defect at rounding level.  The reference never hits this because its
    per-pair runs compose only a handful of f64 rotations."""
    r0 = R[..., 0, :]
    r0 = r0 / jnp.linalg.norm(r0, axis=-1, keepdims=True)
    r1 = R[..., 1, :]
    r1 = r1 - jnp.sum(r0 * r1, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=-2)


def adjoint(R, t):
    """Adjoint Ad(T) = [[R, [t]x R],[0, R]] (math_utils.hpp:181-196)."""
    tx = skew(t)
    top = jnp.concatenate([R, tx @ R], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Euler pose (roll, pitch, yaw, x, y, z) helpers -- ZYX composition, matching
# Pose6D2Matrix / MatrixToPose6D (utils.hpp:452-486).
# ---------------------------------------------------------------------------

def euler_zyx_to_rot(roll, pitch, yaw):
    """R = Rz(yaw) Ry(pitch) Rx(roll) (utils.hpp:452-460)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([
        jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
        jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
        jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
    ], axis=-2)


def pose6d_to_matrix(pose):
    """pose = (..., 6) as [roll, pitch, yaw, x, y, z] -> 4x4 matrix."""
    R = euler_zyx_to_rot(pose[..., 0], pose[..., 1], pose[..., 2])
    return se3_matrix(R, pose[..., 3:6])


def rot_to_euler_zyx(R):
    """Rotation matrix -> (roll, pitch, yaw) via quaternion, mirroring
    MatrixToPose6D (utils.hpp:462-486)."""
    q = rot_to_quat(R)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    return roll, pitch, yaw


def matrix_to_pose6d(T):
    roll, pitch, yaw = rot_to_euler_zyx(T[..., :3, :3])
    return jnp.stack([roll, pitch, yaw,
                      T[..., 0, 3], T[..., 1, 3], T[..., 2, 3]], axis=-1)


def rot_to_quat(R):
    """Rotation matrix -> quaternion (w, x, y, z), branchless Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best via argmax
    qw_0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    d0 = jnp.maximum(1.0 + tr, 1e-30)
    q0 = jnp.stack([qw_0,
                    (m21 - m12) / (4.0 * jnp.maximum(qw_0, 1e-15)),
                    (m02 - m20) / (4.0 * jnp.maximum(qw_0, 1e-15)),
                    (m10 - m01) / (4.0 * jnp.maximum(qw_0, 1e-15))], axis=-1)
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-30))
    q1 = jnp.stack([(m21 - m12) / (2.0 * sx), 0.5 * sx,
                    (m01 + m10) / (2.0 * sx), (m02 + m20) / (2.0 * sx)], axis=-1)
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-30))
    q2 = jnp.stack([(m02 - m20) / (2.0 * sy), (m01 + m10) / (2.0 * sy),
                    0.5 * sy, (m12 + m21) / (2.0 * sy)], axis=-1)
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-30))
    q3 = jnp.stack([(m10 - m01) / (2.0 * sz), (m02 + m20) / (2.0 * sz),
                    (m12 + m21) / (2.0 * sz), 0.5 * sz], axis=-1)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    choice = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, choice[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    del d0
    # normalize; fix sign so w >= 0
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_to_rot(q):
    """Quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def pose_error(T_gt, T_est, degrees: bool = True):
    """Translation / rotation error of T_est vs T_gt
    (calculatePoseError, utils.hpp:497-535): error = T_gt^-1 T_est; trans
    error is the norm of its translation, rot error the angle-axis angle."""
    R_gt, t_gt = se3_from_matrix(T_gt)
    R_est, t_est = se3_from_matrix(T_est)
    R_err = jnp.swapaxes(R_gt, -1, -2) @ R_est
    t_err = jnp.einsum('...ji,...j->...i', R_gt, t_est - t_gt)
    trans_error = jnp.linalg.norm(t_err, axis=-1)
    trace = R_err[..., 0, 0] + R_err[..., 1, 1] + R_err[..., 2, 2]
    cos_a = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    ang = jnp.abs(jnp.arccos(cos_a))
    if degrees:
        ang = ang * (180.0 / jnp.pi)
    return trans_error, ang
