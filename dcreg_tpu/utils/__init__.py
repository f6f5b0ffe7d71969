"""Cross-cutting utilities: precision control, timing.

TPU f32 matmuls default to bf16 MXU passes (8-bit mantissa).  At LiDAR
coordinate magnitudes (~1e2) that injects ~tens-of-m^2 error into the
|q|^2+|t|^2-2q.t distance expansion and ~1e1 absolute error into 6x6
Hessian products -- enough to divert the k-NN search and the Jacobi
eigensolver entirely (observed: DCReg diverging to 28 m translation error
on TPU while bit-happy on CPU).  Every numerically sensitive jitted entry
point therefore traces under ``jax.default_matmul_precision("float32")``.
The reference has no analogue (Eigen is always full fp64,
DCReg/include/math_utils.hpp); this is the TPU-native equivalent of that
guarantee at f32 cost instead of f64.
"""
from __future__ import annotations

import functools

import jax


def precise(fn):
    """Trace ``fn`` with f32 (not bf16) matmul precision on the MXU.

    Compose UNDER jit: ``jit(precise(fn))`` -- the context manager is active
    during tracing, which is when the precision of each dot is bound.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapper


def precise_jit(**jit_kwargs):
    """``@precise_jit(static_argnames=(...))`` == jit(precise(fn), ...)."""
    def deco(fn):
        return jax.jit(precise(fn), **jit_kwargs)
    return deco
