"""Gauss-Newton system assembly: J, H = J^T J, g = J^T b on the MXU.

Rebuild of the Jacobian/Hessian build at
``DCReg/src/icp_test_runner.cpp:1862-1915`` (SO3 engine) and the TBB
reduction idea in ``DCReg/include/hessian_computer.h:11-130``.  Instead of a
row loop + parallel_reduce, rows are built batched and the 6x6 reduction is a
single (6, N) @ (N, 6) matmul -- exactly the shape the MXU wants.  Masked
(invalid) rows carry zero weight so they contribute nothing; no compaction.

The per-point Jacobian uses the right-perturbation SE(3) row
[-n^T R [p]x, n^T R] from math_utils.hpp:102-121.  Row scaling supports both
of the reference's modes (icp_test_runner.cpp:1691, :1894-1898):

  * ``use_weight_derivative=True`` (default): J = (s + r * ds/dr) * J_r with
    ds/dr = -0.9 * sign(r) on the active ramp 0 < s < 1.  Numerical
    reverse-engineering of the archived artifacts shows the recorded
    benchmark runs used this mode -- it reproduces the golden iteration-0
    spectrum {0.6293, 5.5811, 16.77, 683.2, 1993.3, 9342.3} and gradient to
    ~7 significant digits, while the plain mode does not.
  * ``use_weight_derivative=False``: J = s * J_r (the flag value currently
    hard-coded in the public source).

In both modes b = -s * r (the weighted residual), matching the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .correspondence import Correspondences


class GNSystem(NamedTuple):
    H: jax.Array            # (6, 6) J^T J
    g: jax.Array            # (6,)  J^T b  with b = -s r  (so H dx = g)
    num_valid: jax.Array    # () int32: effective correspondence count
    rmse: jax.Array         # () sqrt(mean raw residual^2 over valid)
    fitness: jax.Array      # () fraction of source points with 5NN in radius
    objective: jax.Array    # () 0.5 * || s r ||^2 (icp_test_runner.cpp:1919)


def build_system(source_xyz, R, t, corr: Correspondences,
                 num_source=None, use_weight_derivative: bool = True,
                 weight_slope: float = 0.9) -> GNSystem:
    """Assemble the 6x6 GN system from a correspondence set.

    source_xyz: (N, 3) body-frame points; (R, t): pose at which J was
    linearized; corr: output of find_correspondences.
    num_source: true (unpadded) source count for the fitness denominator.
    """
    dtype = source_xyz.dtype
    s = jnp.where(corr.valid, corr.weight, 0.0).astype(dtype)

    if use_weight_derivative:
        # ds/dr = -slope * sign(r) on the active ramp (0 < s < 1)
        on_ramp = (s > 0.0) & (s < 1.0)
        ds_dr = jnp.where(on_ramp, -weight_slope * jnp.sign(corr.residual), 0.0)
        row_scale = s + corr.residual * ds_dr
    else:
        row_scale = s
    row_scale = jnp.where(corr.valid, row_scale, 0.0)

    # J_r rows: [ (n^T R) x p  form ] == [-n^T R [p]x, n^T R]
    nR = corr.normal @ R                      # (N, 3) row vectors n^T R
    Jw = jnp.cross(source_xyz, nR)            # -n^T R [p]x == p x (n^T R)
    J = jnp.concatenate([Jw, nR], axis=-1) * row_scale[:, None]    # (N, 6)
    b = -(s * corr.residual)                  # (N,)

    H = J.T @ J
    g = J.T @ b

    n_valid = jnp.sum(corr.valid.astype(jnp.int32))
    raw_sq = jnp.where(corr.valid, corr.residual * corr.residual, 0.0)
    rmse = jnp.sqrt(jnp.sum(raw_sq) / jnp.maximum(n_valid, 1).astype(dtype))
    denom = (jnp.asarray(num_source, dtype)
             if num_source is not None else jnp.asarray(source_xyz.shape[0], dtype))
    fitness = jnp.sum(corr.in_radius.astype(dtype)) / denom
    objective = 0.5 * jnp.sum(b * b)
    return GNSystem(H=H, g=g, num_valid=n_valid, rmse=rmse,
                    fitness=fitness, objective=objective)
