"""Degenerate-system handlers: the solve step of each method.

Rebuild of ``DCReg::solveDegenerateSystem`` (dcreg.hpp:168-264) plus the
stubbed PRECONDITIONED_CG path (dcreg.hpp:279-287, icp_test_runner.cpp:
2551-2555) reconstructed from the README theory (README.md:176-190) and the
recorded PCG telemetry (fig18 pcg.txt: ~7 iterations, cond(H)~366 ->
cond(PH)~43 with kappa_target=10).

TPU latency design: every handler REUSES the 6x6 EVD already computed by
``degeneracy.analyze`` -- the whole solve dispatch performs at most ONE
additional 6x6 eigendecomposition (the cond(PH) telemetry, skippable via
``telemetry=False``), and the PCG loop is fully unrolled with a convergence
mask (a ``while_loop`` would serialize host-visible trips; unrolled stages
fuse).  H + gamma*I and the spectral pseudo-inverses share H's eigenbasis,
so direct/SR/TSVD/TReg solves are pure (6,) vector arithmetic on the
existing spectrum.

All handlers are branchless fixed-shape jnp; the handling method may be a
static enum or a traced int code.  Each returns (dx, SolveInfo extras).
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


def _spectral_solve(w, V, g):
    """x = V diag(1/w) V^T g -- the shared-eigenbasis direct solve.

    Exact-arithmetic equivalent of the reference's colPivHouseholderQr on a
    symmetric H (dcreg.hpp:250-253); near-singular inputs produce a
    large-magnitude solution, mirroring QR's behavior."""
    safe = jnp.abs(w) > 1e-300
    inv_w = jnp.where(safe, 1.0 / jnp.where(safe, w, 1.0), 0.0)
    return V @ (inv_w * (jnp.swapaxes(V, -1, -2) @ g[..., None])[..., 0])


def solve_none(analysis: DegeneracyAnalysis, g):
    """Plain dense solve (dcreg.hpp:250-253) on the cached spectrum."""
    return _spectral_solve(analysis.eigenvalues_full,
                           analysis.eigenvectors_full, g)


def solve_solution_remapping(analysis: DegeneracyAnalysis, g):
    """LOAM solution remapping (dcreg.hpp:195-221): plain solve, then project
    the update onto the non-degenerate eigenvector span.  (The Euler engine's
    inline variant at icp_test_runner.cpp:2556-2580 uses an SVD pinv for the
    initial solve; the SO3 engine -- which produced the archived goldens --
    routes through dcreg.hpp's plain-solve version.)"""
    x = solve_none(analysis, g)
    V = analysis.eigenvectors_full
    keep = ~analysis.degenerate_mask
    # P_projector = sum_i keep_i v_i v_i^T ; x <- P x  (zero if none kept)
    coeffs = (V.T @ x) * keep
    x_proj = V @ coeffs
    x_out = jnp.where(analysis.is_degenerate, x_proj, x)
    any_kept = jnp.any(keep)
    return jnp.where(analysis.is_degenerate & ~any_kept,
                     jnp.zeros_like(x), x_out)


def solve_truncated_svd(analysis: DegeneracyAnalysis, g):
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


def solve_standard_regularization(analysis: DegeneracyAnalysis, g,
                                  gamma: float):
    """Tikhonov H + gamma I when degenerate (dcreg.hpp:177-184).  H + gamma I
    shares H's eigenvectors, so this is the same spectral solve with a
    shifted spectrum."""
    shift = jnp.where(analysis.is_degenerate, gamma, 0.0)
    return _spectral_solve(analysis.eigenvalues_full + shift,
                           analysis.eigenvectors_full, g)


def pcg_unrolled(H, g, P, max_iter: int, tol: float, x_extra=None):
    """Preconditioned conjugate gradient on H dx = g (stub solvePCG,
    dcreg.hpp:279-287; max_iter=10, tol=1e-6 from config/icp.yaml:73-76).

    Fully unrolled with a ``done`` mask: converged systems stop updating --
    matching a host loop's early-exit semantics bit-for-bit while compiling
    to ``max_iter`` fused stages instead of a serialized while_loop.
    Returns (x, iterations, final residual norm)."""
    dtype = H.dtype
    x = jnp.zeros(6, dtype)
    r = g
    z = P @ r
    p = z
    rz = r @ z
    # reference tolerance semantics: iterate until |r| <= tol * |g|
    thresh = tol * jnp.maximum(jnp.linalg.norm(g), 1e-30)
    done = jnp.asarray(False)
    iters = jnp.asarray(0, jnp.int32)
    for _ in range(max_iter):
        Hp = H @ p
        pHp = p @ Hp
        safe = jnp.abs(pHp) > 1e-30
        alpha = jnp.where(safe & ~done,
                          rz / jnp.where(safe, pHp, 1.0), 0.0)
        x = x + alpha * p
        r_new = r - alpha * Hp
        z_new = P @ r_new
        rz_new = r_new @ z_new
        beta = jnp.where(jnp.abs(rz) > 1e-30,
                         rz_new / jnp.where(jnp.abs(rz) > 1e-30, rz, 1.0),
                         0.0)
        p_new = z_new + beta * p
        step_done = (jnp.linalg.norm(r_new) <= thresh) | ~safe
        iters = iters + jnp.where(done, 0, 1)
        r = jnp.where(done, r, r_new)
        z = jnp.where(done, z, z_new)
        p = jnp.where(done, p, p_new)
        rz = jnp.where(done, rz, rz_new)
        done = done | step_done
    return x, iters, jnp.linalg.norm(r)


# backwards-compatible alias (tests / external callers)
def pcg(H, g, P, max_iter: int, tol: float):
    return pcg_unrolled(H, g, P, max_iter, tol)


def _schur_sqrt_precond(analysis: DegeneracyAnalysis, kappa_target: float):
    """P^(1/2) in closed form from the Schur EVDs (no extra eigensolve):
    sqrtP = blockdiag(V diag(1/sqrt(clamp(lam))) V^T) per 3x3 subspace."""
    dtype = analysis.eigenvalues_full.dtype

    def block(lam, V):
        lam_c = jnp.maximum(lam, lam[2] / kappa_target)
        return (V * (1.0 / jnp.sqrt(jnp.maximum(lam_c, 1e-30)))[None, :]) @ V.T

    S_rot = block(analysis.lambda_schur_rot, analysis.V_schur_rot)
    S_trans = block(analysis.lambda_schur_trans, analysis.V_schur_trans)
    Z = jnp.zeros((3, 3), dtype)
    S = jnp.block([[S_rot, Z], [Z, S_trans]])
    return jnp.where(analysis.schur_valid & jnp.all(jnp.isfinite(S)),
                     S, jnp.eye(6, dtype=dtype))


def solve_pcg_fast(H, g, analysis: DegeneracyAnalysis,
                   thresholds: DegeneracyThresholds):
    """Latency-lean PRECONDITIONED_CG solve for the in-loop fast path.

    Reads ONLY the Schur fields of ``analysis`` (valid under
    ``analyze(..., fast=True)``): targeted preconditioner from the Schur
    spectra, unrolled PCG when degenerate, unrolled 6x6 Cholesky otherwise
    (the reference's plain QR branch, dcreg.hpp:186-193 -- H is SPD and
    well-conditioned whenever the Schur test passes).  No 6x6
    eigendecomposition anywhere.  Returns (dx, SolveInfo)."""
    dtype = H.dtype
    P = targeted_preconditioner(analysis, thresholds.kappa_target)
    x_pcg, pcg_iters, pcg_resid = pcg_unrolled(
        H, g, P, thresholds.pcg_max_iter, thresholds.pcg_tolerance)
    x_chol, chol_ok = linalg.cholesky_solve_6x6(H, g)
    use_pcg = analysis.is_degenerate | ~chol_ok
    x = jnp.where(use_pcg, x_pcg, x_chol)
    info = SolveInfo(
        P_preconditioner=P,
        W_adaptive=jnp.zeros((6, 6), dtype),
        pcg_iterations=jnp.where(use_pcg, pcg_iters,
                                 jnp.asarray(-1, jnp.int32)),
        pcg_residual=jnp.where(use_pcg, pcg_resid,
                               jnp.asarray(jnp.nan, dtype)),
        cond_PH=jnp.asarray(jnp.nan, dtype))
    return x, info


def _solve_static(H, g, method: HandlingMethod,
                  analysis: DegeneracyAnalysis,
                  thresholds: DegeneracyThresholds, telemetry: bool):
    """Single-handler solve for a statically-known method (see solve())."""
    dtype = H.dtype
    eye = jnp.eye(6, dtype=dtype)
    zero6 = jnp.zeros((6, 6), dtype)
    no_iters = jnp.asarray(-1, jnp.int32)
    nan = jnp.asarray(jnp.nan, dtype)
    info = SolveInfo(P_preconditioner=eye, W_adaptive=zero6,
                     pcg_iterations=no_iters, pcg_residual=nan, cond_PH=nan)
    if method is HandlingMethod.NONE:
        return solve_none(analysis, g), info
    if method is HandlingMethod.SOLUTION_REMAPPING:
        return solve_solution_remapping(analysis, g), info
    if method is HandlingMethod.TRUNCATED_SVD:
        return solve_truncated_svd(analysis, g), info
    if method is HandlingMethod.STANDARD_REGULARIZATION:
        return solve_standard_regularization(
            analysis, g, thresholds.std_reg_gamma), info
    P = targeted_preconditioner(analysis, thresholds.kappa_target)
    if method is HandlingMethod.ADAPTIVE_REGULARIZATION:
        W = adaptive_regularizer(analysis, thresholds.adaptive_reg_alpha)
        W = jnp.where(analysis.is_degenerate, W, jnp.zeros_like(W))
        x, _, _ = pcg_unrolled(H + W, g, P, 2 * thresholds.pcg_max_iter,
                               thresholds.pcg_tolerance)
        return x, info._replace(W_adaptive=W)
    if method is not HandlingMethod.PRECONDITIONED_CG:
        # engine-level methods (XICP_*, SUPERLOC, O3D) fall back to the
        # plain solve, matching handling_code's default code 0
        return solve_none(analysis, g), info
    x_raw, pcg_iters, pcg_resid = pcg_unrolled(
        H, g, P, thresholds.pcg_max_iter, thresholds.pcg_tolerance)
    use_pcg = analysis.is_degenerate
    x = jnp.where(use_pcg, x_raw, solve_none(analysis, g))
    if telemetry:
        sqrtP = _schur_sqrt_precond(analysis, thresholds.kappa_target)
        wm, _ = linalg.symmetric_eigh(sqrtP @ H @ sqrtP)
        cond_PH = linalg.condition_number(wm)
    else:
        cond_PH = nan
    return x, SolveInfo(
        P_preconditioner=P, W_adaptive=zero6,
        pcg_iterations=jnp.where(use_pcg, pcg_iters, no_iters),
        pcg_residual=jnp.where(use_pcg, pcg_resid, nan),
        cond_PH=cond_PH)


def solve(H, g, method: HandlingMethod, analysis: DegeneracyAnalysis,
          thresholds: DegeneracyThresholds = DegeneracyThresholds(),
          telemetry: bool = True, fast: bool = False):
    """Unified dispatch.  Returns (dx, SolveInfo).

    ``method`` may be a static HandlingMethod enum or a traced int code
    (see degeneracy.handling_code).  Every handler reduces to vector
    arithmetic on the cached spectrum (plus the unrolled PCG stages), so all
    candidates are computed and the result selected -- one compile covers
    the entire method matrix, and vmap over method codes runs all methods
    concurrently on one chip.

    ``telemetry=False`` (static) skips the cond(PH) eigendecomposition --
    the only remaining non-essential 6x6 EVD on the iteration path.
    """
    if fast and method is HandlingMethod.PRECONDITIONED_CG:
        return solve_pcg_fast(H, g, analysis, thresholds)
    if isinstance(method, HandlingMethod):
        # static dispatch: compute ONLY the selected handler (the traced-
        # code path below evaluates every candidate so one compile can
        # cover the whole method matrix -- wasteful when the method is
        # known, e.g. the telemetry reconstruction pass)
        return _solve_static(H, g, method, analysis, thresholds, telemetry)
    from .degeneracy import handling_code
    dtype = H.dtype
    code = handling_code(method)

    x_none = solve_none(analysis, g)
    x_sr = solve_solution_remapping(analysis, g)
    x_tsvd = solve_truncated_svd(analysis, g)
    x_treg = solve_standard_regularization(analysis, g,
                                           thresholds.std_reg_gamma)

    # ME-AReg ablation: (H + W) x = g.  W is built in the Schur eigenbases,
    # so H + W shares no basis with H; solve with the (clamped) targeted
    # preconditioner via unrolled PCG -- P approximates (H + W)^-1 by
    # construction, so convergence is fast and no extra EVD is needed.
    W = adaptive_regularizer(analysis, thresholds.adaptive_reg_alpha)
    W = jnp.where(analysis.is_degenerate, W, jnp.zeros_like(W))
    P = targeted_preconditioner(analysis, thresholds.kappa_target)
    x_areg, _, _ = pcg_unrolled(H + W, g, P, 2 * thresholds.pcg_max_iter,
                                thresholds.pcg_tolerance)

    # DCReg proper: targeted preconditioner + PCG when degenerate, plain
    # dense solve otherwise (dcreg.hpp:186-193 structure).
    x_pcg_raw, pcg_iters, pcg_resid = pcg_unrolled(
        H, g, P, thresholds.pcg_max_iter, thresholds.pcg_tolerance)
    use_pcg = analysis.is_degenerate
    x_pcg = jnp.where(use_pcg, x_pcg_raw, x_none)

    if telemetry:
        # cond(P^1/2 H P^1/2) -- the pcg.txt "cond_PH" column -- via the
        # symmetric preconditioned operator (sqrtP in closed form).
        sqrtP = _schur_sqrt_precond(analysis, thresholds.kappa_target)
        wm, _ = linalg.symmetric_eigh(sqrtP @ H @ sqrtP)
        cond_PH = linalg.condition_number(wm)
    else:
        cond_PH = jnp.asarray(jnp.nan, dtype)

    xs = jnp.stack([x_none, x_sr, x_tsvd, x_treg, x_areg, x_pcg])
    x = xs[code]
    is_areg = code == 4
    is_pcg = code == 5
    info = SolveInfo(
        P_preconditioner=jnp.where(is_pcg, P, jnp.eye(6, dtype=dtype)),
        W_adaptive=jnp.where(is_areg, W, jnp.zeros((6, 6), dtype)),
        pcg_iterations=jnp.where(is_pcg & use_pcg, pcg_iters,
                                 jnp.asarray(-1, jnp.int32)),
        pcg_residual=jnp.where(is_pcg & use_pcg, pcg_resid,
                               jnp.asarray(jnp.nan, dtype)),
        cond_PH=jnp.where(is_pcg, cond_PH, jnp.asarray(jnp.nan, dtype)))
    return x, info
