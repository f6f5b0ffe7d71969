"""Degenerate-system handlers: the solve step of each method.

Rebuild of ``DCReg::solveDegenerateSystem`` (dcreg.hpp:168-264) plus the
stubbed PRECONDITIONED_CG path (dcreg.hpp:279-287, icp_test_runner.cpp:
2551-2555) reconstructed from the README theory (README.md:176-190) and the
recorded PCG telemetry (fig18 pcg.txt: ~7 iterations, cond(H)~366 ->
cond(PH)~43 with kappa_target=10).

All handlers are branchless fixed-shape jnp; the handling method is a static
enum resolved at trace time.  Each returns (dx, extras) where extras carries
solver telemetry (PCG iterations, preconditioner) for the log pipeline.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import linalg
from .degeneracy import (DegeneracyAnalysis, DegeneracyThresholds,
                         HandlingMethod, adaptive_regularizer,
                         targeted_preconditioner)

_EPS_SV = 1e-9   # singular-value floor used by SR/TSVD (dcreg.hpp:232, :2562)


class SolveInfo(NamedTuple):
    P_preconditioner: jax.Array   # (6, 6) (identity unless PCG)
    W_adaptive: jax.Array         # (6, 6) (zero unless AReg)
    pcg_iterations: jax.Array     # () int32 (-1 unless PCG)
    pcg_residual: jax.Array       # () final |r| (nan unless PCG)
    cond_PH: jax.Array            # () cond of preconditioned system (nan unless PCG)


def _default_info(dtype):
    return SolveInfo(P_preconditioner=jnp.eye(6, dtype=dtype),
                     W_adaptive=jnp.zeros((6, 6), dtype),
                     pcg_iterations=jnp.asarray(-1, jnp.int32),
                     pcg_residual=jnp.asarray(jnp.nan, dtype),
                     cond_PH=jnp.asarray(jnp.nan, dtype))


def _svd_pinv_solve(analysis: DegeneracyAnalysis, g, mask=None):
    """x = V Sigma'^-1 U^T g over the PSD SVD, optionally dropping masked
    directions.  ``mask`` is in eigen-index-ascending order; the SVD order is
    descending, so it is flipped here."""
    sv = analysis.singular_values                 # descending
    U = analysis.eigenvectors_full[:, ::-1]       # columns matching sv
    keep = sv > _EPS_SV
    if mask is not None:
        keep = keep & ~mask[::-1]
    inv = jnp.where(keep, 1.0 / jnp.where(keep, sv, 1.0), 0.0)
    return U @ (inv * (U.T @ g))


def solve_none(H, g):
    """Plain dense solve (dcreg.hpp:250-253)."""
    return linalg.solve_qr_6x6(H, g)


def solve_solution_remapping(H, g, analysis: DegeneracyAnalysis):
    """LOAM solution remapping (dcreg.hpp:195-221): plain solve, then project
    the update onto the non-degenerate eigenvector span.  (The Euler engine's
    inline variant at icp_test_runner.cpp:2556-2580 uses an SVD pinv for the
    initial solve; the SO3 engine -- which produced the archived goldens --
    routes through dcreg.hpp's plain-solve version.)"""
    x = linalg.solve_qr_6x6(H, g)
    V = analysis.eigenvectors_full
    keep = ~analysis.degenerate_mask
    # P_projector = sum_i keep_i v_i v_i^T ; x <- P x  (zero if none kept)
    coeffs = (V.T @ x) * keep
    x_proj = V @ coeffs
    x_out = jnp.where(analysis.is_degenerate, x_proj, x)
    any_kept = jnp.any(keep)
    return jnp.where(analysis.is_degenerate & ~any_kept,
                     jnp.zeros_like(x), x_out)


def solve_truncated_svd(H, g, analysis: DegeneracyAnalysis):
    """Truncated SVD pseudo-inverse dropping masked/small singular values
    (dcreg.hpp:223-248).

    Behavioral note: the reference indexes ``degenerate_mask`` (computed over
    eigenvalues sorted ASCENDING) directly into the DESCENDING singular-value
    array (dcreg.hpp:232).  For the ME mask 1 1 1 0 0 0 this drops the three
    LARGEST directions and keeps the smallest -- which is exactly what makes
    ME-TSVD's recorded trajectory differ from ME-SR (otherwise the two are
    algebraically identical for symmetric PSD H).  We reproduce that
    index-space convention; don't "fix" it."""
    sv = analysis.singular_values                 # descending
    U = analysis.eigenvectors_full[:, ::-1]       # columns matching sv
    keep = (sv > _EPS_SV) & ~analysis.degenerate_mask
    inv = jnp.where(keep, 1.0 / jnp.where(keep, sv, 1.0), 0.0)
    x = U @ (inv * (U.T @ g))
    return jnp.where(jnp.any(keep), x, jnp.zeros_like(x))


def solve_standard_regularization(H, g, analysis: DegeneracyAnalysis,
                                  gamma: float):
    """Tikhonov H + gamma I when degenerate (dcreg.hpp:177-184)."""
    H_reg = H + jnp.where(analysis.is_degenerate, gamma, 0.0) * jnp.eye(
        6, dtype=H.dtype)
    return linalg.solve_qr_6x6(H_reg, g)


def solve_adaptive_regularization(H, g, analysis: DegeneracyAnalysis,
                                  alpha: float):
    """ME-AReg ablation: H + W_adaptive with the targeted regularizer."""
    W = adaptive_regularizer(analysis, alpha)
    W = jnp.where(analysis.is_degenerate, W, jnp.zeros_like(W))
    return linalg.solve_qr_6x6(H + W, g), W


def pcg(H, g, P, max_iter: int, tol: float):
    """Preconditioned conjugate gradient on H dx = g (stub solvePCG,
    dcreg.hpp:279-287; max_iter=10, tol=1e-6 from config/icp.yaml:73-76).

    P is the (SPD) preconditioner operator approximating H^-1.  Runs a
    fixed-shape while_loop with an `active` flag so converged systems stop
    updating -- matching a host loop's early exit semantics bit-for-bit
    while staying jittable.  Returns (x, iterations, final residual norm).
    """
    dtype = H.dtype
    x0 = jnp.zeros(6, dtype)
    r0 = g
    z0 = P @ r0
    p0 = z0
    rz0 = r0 @ z0
    # reference tolerance semantics: iterate until |r| <= tol * |g|
    g_norm = jnp.linalg.norm(g)
    thresh = tol * jnp.maximum(g_norm, 1e-30)

    def cond_fn(state):
        k, x, r, z, p, rz, done = state
        return (k < max_iter) & ~done

    def body_fn(state):
        k, x, r, z, p, rz, done = state
        Hp = H @ p
        pHp = p @ Hp
        safe = jnp.abs(pHp) > 1e-30
        alpha = jnp.where(safe, rz / jnp.where(safe, pHp, 1.0), 0.0)
        x_new = x + alpha * p
        r_new = r - alpha * Hp
        z_new = P @ r_new
        rz_new = r_new @ z_new
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / jnp.where(jnp.abs(rz) > 1e-30, rz, 1.0), 0.0)
        p_new = z_new + beta * p
        done_new = (jnp.linalg.norm(r_new) <= thresh) | ~safe
        return (k + 1, x_new, r_new, z_new, p_new, rz_new, done_new)

    k, x, r, z, p, rz, done = jax.lax.while_loop(
        cond_fn, body_fn, (jnp.asarray(0, jnp.int32), x0, r0, z0, p0, rz0,
                           jnp.asarray(False)))
    return x, k, jnp.linalg.norm(r)


def solve_preconditioned_cg(H, g, analysis: DegeneracyAnalysis,
                            thresholds: DegeneracyThresholds):
    """DCReg's solve: targeted preconditioner + PCG when degenerate, plain
    dense solve otherwise (dcreg.hpp:186-193 structure).

    Also returns cond(P^1/2 H P^1/2) telemetry (the pcg.txt "cond_PH"
    column): computed via the similar matrix P H whose spectrum matches the
    symmetric preconditioned operator."""
    dtype = H.dtype
    P = targeted_preconditioner(analysis, thresholds.kappa_target)
    x_pcg, iters, resid = pcg(H, g, P, thresholds.pcg_max_iter,
                              thresholds.pcg_tolerance)
    x_direct = linalg.solve_qr_6x6(H, g)
    use_pcg = analysis.is_degenerate
    x = jnp.where(use_pcg, x_pcg, x_direct)
    # telemetry: eigenvalues of PH (similar to symmetric preconditioned op)
    PH = P @ H
    # PH is similar to P^{1/2} H P^{1/2} (symmetric PSD): use symmetric form
    # S = L^T H L would need a factor of P; cheaper equivalent for telemetry:
    # eigh of (PH + (PH)^T)/2 is NOT similar -- instead use the symmetric
    # product in the P-inner-product via two-sided: sqrt via eigh of P.
    wp, Vp = linalg.symmetric_eigh(P)
    sqrtP = (Vp * jnp.sqrt(jnp.maximum(wp, 0.0))[None, :]) @ Vp.T
    M = sqrtP @ H @ sqrtP
    wm, _ = linalg.symmetric_eigh(M)
    cond_PH = linalg.condition_number(wm)
    info = SolveInfo(
        P_preconditioner=P,
        W_adaptive=jnp.zeros((6, 6), dtype),
        pcg_iterations=jnp.where(use_pcg, iters, jnp.asarray(-1, jnp.int32)),
        pcg_residual=jnp.where(use_pcg, resid, jnp.asarray(jnp.nan, dtype)),
        cond_PH=cond_PH)
    return x, info


def solve(H, g, method: HandlingMethod, analysis: DegeneracyAnalysis,
          thresholds: DegeneracyThresholds = DegeneracyThresholds()):
    """Unified dispatch.  Returns (dx, SolveInfo).

    ``method`` may be a static HandlingMethod enum or a traced int code
    (see degeneracy.handling_code).  Every handler is a handful of 6x6 ops,
    so all candidates are computed and the result selected -- one compile
    covers the entire method matrix, and a future vmap over method codes
    runs all methods concurrently on one chip.
    """
    from .degeneracy import handling_code
    dtype = H.dtype
    info = _default_info(dtype)
    code = handling_code(method)

    x_none = solve_none(H, g)
    x_sr = solve_solution_remapping(H, g, analysis)
    x_tsvd = solve_truncated_svd(H, g, analysis)
    x_treg = solve_standard_regularization(H, g, analysis,
                                           thresholds.std_reg_gamma)
    x_areg, W = solve_adaptive_regularization(H, g, analysis,
                                              thresholds.adaptive_reg_alpha)
    x_pcg, pcg_info = solve_preconditioned_cg(H, g, analysis, thresholds)

    xs = jnp.stack([x_none, x_sr, x_tsvd, x_treg, x_areg, x_pcg])
    x = xs[code]
    is_areg = code == 4
    is_pcg = code == 5
    info = SolveInfo(
        P_preconditioner=jnp.where(is_pcg, pcg_info.P_preconditioner,
                                   info.P_preconditioner),
        W_adaptive=jnp.where(is_areg, W, info.W_adaptive),
        pcg_iterations=jnp.where(is_pcg, pcg_info.pcg_iterations,
                                 info.pcg_iterations),
        pcg_residual=jnp.where(is_pcg, pcg_info.pcg_residual,
                               info.pcg_residual),
        cond_PH=jnp.where(is_pcg, pcg_info.cond_PH, info.cond_PH))
    return x, info
