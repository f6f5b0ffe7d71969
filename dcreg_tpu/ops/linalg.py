"""Small dense linear algebra for the 6x6 / 3x3 spectral analysis path.

The reference leans on Eigen (SelfAdjointEigenSolver, JacobiSVD, QR solves --
``DCReg/src/icp_test_runner.cpp:2379-2469``, ``DCReg/include/dcreg.hpp:62-89``).
On TPU we avoid LAPACK callbacks entirely: a fixed-sweep cyclic Jacobi
eigensolver in pure jnp handles every symmetric spectral decomposition the
framework needs (3x3 diagonal blocks, 3x3 Schur complements, 6x6 full
Hessian).  The matrices are tiny, so a handful of unrolled Givens rotations is
both exact (to fp precision) and essentially free next to the per-point work;
crucially it is jit-compatible, batched via vmap, and deterministic.

For a symmetric PSD Gauss-Newton Hessian H = J^T J, the SVD follows from the
EVD (singular values = |eigenvalues|, U = V = eigenvectors), the fact the
reference itself relies on (icp_test_runner.cpp:2411-2415) -- so no separate
SVD kernel is needed anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from ..utils import precise_jit

# Number of cyclic Jacobi sweeps.  Jacobi converges quadratically; 8 sweeps on
# a 6x6 drives off-diagonal mass to ~eps * ||A|| even for cond ~ 1e12.
_SWEEPS = {3: 6, 6: 8}

# Tournament (round-robin) rotation schedules: each ROUND is a set of
# DISJOINT index pairs whose Givens rotations commute, so one round applies
# as a single orthogonal 6x6 (or 3x3) matrix -- 5 sequential stages per 6x6
# sweep instead of 15.  Latency, not flops, is what tiny ops cost on TPU.
_SCHEDULES = {
    3: [[(0, 1)], [(0, 2)], [(1, 2)]],
    6: [
        [(0, 5), (1, 4), (2, 3)],
        [(0, 4), (3, 5), (1, 2)],
        [(0, 3), (2, 4), (1, 5)],
        [(0, 2), (1, 3), (4, 5)],
        [(0, 1), (2, 5), (3, 4)],
    ],
}


@functools.lru_cache(maxsize=None)
def _round_constants(n: int, pairs, dtype_name: str):
    """Compile-time basis matrices for a tournament round: G is assembled
    from these by broadcast-multiply-add, so NO scatter ops reach XLA (each
    .at[].set on a batched tiny matrix lowers to a full scatter on TPU --
    hundreds of them made the 6x6 eigensolves the latency hotspot).

    Returns plain numpy arrays (cached jnp arrays created under jit would
    be trace-local constants and leak as tracers)."""
    import numpy as np
    dt = np.dtype(dtype_name)
    eye_rest = np.eye(n, dtype=dt)
    diag_basis, skew_basis = [], []
    for (p, q) in pairs:
        eye_rest[p, p] = eye_rest[q, q] = 0.0
        D = np.zeros((n, n), dt); D[p, p] = D[q, q] = 1.0
        S = np.zeros((n, n), dt); S[p, q] = 1.0; S[q, p] = -1.0
        diag_basis.append(D)
        skew_basis.append(S)
    annihilate = np.ones((n, n), dt)
    for (p, q) in pairs:
        annihilate[p, q] = annihilate[q, p] = 0.0
    return eye_rest, diag_basis, skew_basis, annihilate


def _round_rotation(A, V, pairs):
    """Apply one tournament round (disjoint static pairs) of Jacobi
    rotations as a single composite orthogonal transform."""
    n = A.shape[-1]
    eye_rest, diag_basis, skew_basis, annihilate = _round_constants(
        n, tuple(pairs), A.dtype.name)
    G = jnp.broadcast_to(jnp.asarray(eye_rest), A.shape)
    for (p, q), D, S in zip(pairs, diag_basis, skew_basis):
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # Golub & Van Loan 8.4: smaller root of t^2 + 2 tau t - 1 = 0
        nonzero = jnp.abs(apq) > 0.0
        tau = jnp.where(nonzero,
                        (aqq - app) / jnp.where(nonzero, 2.0 * apq, 1.0), 0.0)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.hypot(jnp.ones_like(tau), tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(nonzero, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        G = G + c[..., None, None] * D + s[..., None, None] * S
    A_new = jnp.swapaxes(G, -1, -2) @ A @ G
    # exact annihilation of the rotated pairs kills fp residue
    A_new = A_new * annihilate
    V_new = V @ G
    return A_new, V_new


@precise_jit(static_argnames=("sweeps",))
def symmetric_eigh(A, sweeps: int | None = None):
    """Eigendecomposition of a symmetric matrix via tournament-ordered
    cyclic Jacobi, fully unrolled (static schedule).

    Returns (eigenvalues ascending, eigenvectors as columns), matching the
    ordering convention of Eigen::SelfAdjointEigenSolver that the reference's
    recorded artifacts use (eigenvalues sorted small -> large).

    A: (..., n, n) symmetric, n in {3, 6} (others fall back to an all-pairs
    schedule).  Batched over leading axes -- batch every independent
    decomposition into ONE call: sequential-stage latency is the cost driver
    on TPU, and it is batch-size-independent.
    """
    n = A.shape[-1]
    if sweeps is None:
        sweeps = _SWEEPS.get(n, 10)
    schedule = _SCHEDULES.get(
        n, [[(p, q)] for p in range(n - 1) for q in range(p + 1, n)])
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    for _ in range(sweeps):
        for pairs in schedule:
            A, V = _round_rotation(A, V, pairs)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w_sorted, V_sorted


def psd_svd_from_eigh(w_asc, V):
    """Singular values (descending) + U=V columns for a symmetric PSD matrix,
    from its ascending EVD.  Mirrors the identity the reference notes at
    icp_test_runner.cpp:2411-2415."""
    sv = jnp.abs(w_asc)[..., ::-1]
    U = V[..., ::-1]
    return sv, U


def solve_qr_6x6(A, b):
    """Dense solve of A x = b for the 6x6 GN system.

    The reference uses colPivHouseholderQr (dcreg.hpp:250-253).  Every system
    this framework solves is symmetric (GN Hessians, optionally Tikhonov- or
    LM-damped), so the spectral solve x = V diag(1/w) V^T b is exact-arithmetic
    equivalent -- and unlike LAPACK LU/QR it lowers cleanly on TPU in every
    dtype (XLA:TPU's LuDecomposition custom call is F32-only).  Near-singular
    inputs produce a large-magnitude solution, mirroring QR's behavior; the
    degenerate-aware methods never reach this path with a singular H.
    """
    w, V = symmetric_eigh(A)
    safe = jnp.abs(w) > 1e-300
    inv_w = jnp.where(safe, 1.0 / jnp.where(safe, w, 1.0), 0.0)
    return V @ (inv_w * (jnp.swapaxes(V, -1, -2) @ b[..., None])[..., 0])


def inv_3x3(A):
    """Closed-form 3x3 inverse (adjugate / det) -- branchless, batched."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None], det


def solve_lstsq_normal(A, b, reg: float = 0.0):
    """Least-squares solve via normal equations for tall skinny systems
    (the 5x3 plane fits).  x = (A^T A + reg I)^-1 A^T b, closed form 3x3."""
    AtA = jnp.einsum('...ij,...ik->...jk', A, A)
    if reg:
        AtA = AtA + reg * jnp.eye(A.shape[-1], dtype=A.dtype)
    Atb = jnp.einsum('...ij,...i->...j', A, b)
    inv, det = inv_3x3(AtA)
    x = jnp.einsum('...ij,...j->...i', inv, Atb)
    return x, det


def eigh3_closed(A):
    """Closed-form eigendecomposition of symmetric 3x3 matrices (batched).

    Eigenvalues by the trigonometric (Cardano) method, eigenvectors by the
    largest cross product of rows of (A - lambda I), orthonormalized --
    ~60 flat elementwise ops with NO sequential Jacobi sweeps.  This is the
    latency-critical path of the per-iteration Schur analysis
    (icp_test_runner.cpp:2443-2469): a Jacobi sweep chain serializes ~20
    dependent stages per solve, which dominates the ICP inner loop on TPU;
    the closed form collapses to a handful of fused kernels.

    Returns (eigenvalues ascending (..., 3), eigenvectors (..., 3, 3)
    columns).  Accuracy: ~1e-6 relative in f32, ~3e-13 in f64 for the
    well-separated spectra the Schur blocks carry; repeated eigenvalues fall
    back to a stable orthonormal completion.
    """
    dtype = A.dtype
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    tiny = p <= jnp.asarray(1e-30, dtype)
    p_safe = jnp.where(tiny, 1.0, p)
    # r = det(B/p)/2, clamped into acos domain
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detB / (2.0 * p_safe * p_safe * p_safe), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = jnp.asarray(2.0943951023931953, dtype)
    w2 = q + 2.0 * p * jnp.cos(phi)                 # largest
    w0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)      # smallest
    w1 = 3.0 * q - w2 - w0
    w0 = jnp.where(tiny, q, w0)
    w1 = jnp.where(tiny, q, w1)
    w2 = jnp.where(tiny, q, w2)

    def best_null_vector(lam):
        """Unit vector spanning null(A - lam I): the largest pairwise cross
        product of its rows (rows span the orthogonal complement)."""
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        c = jnp.where((n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
                      jnp.where((n02 >= n12)[..., None], c02, c12))
        nrm2 = jnp.sum(c * c, axis=-1, keepdims=True)
        ok = nrm2 > 1e-60
        v = c / jnp.sqrt(jnp.where(ok, nrm2, 1.0))
        return v, ok[..., 0]

    # eigenvector of the MOST isolated extreme eigenvalue is best conditioned
    gap_hi = w2 - w1
    gap_lo = w1 - w0
    hi_first = gap_hi >= gap_lo
    lam_a = jnp.where(hi_first, w2, w0)
    lam_b = jnp.where(hi_first, w0, w2)
    va, ok_a = best_null_vector(lam_a)
    vb_raw, ok_b = best_null_vector(lam_b)
    # fallbacks for (near-)spherical A: arbitrary orthonormal axes
    e0 = jnp.zeros_like(va).at[..., 0].set(1.0)
    va = jnp.where(ok_a[..., None], va, e0)
    # orthogonalize vb against va, falling back to a guaranteed-independent
    # axis (the coordinate axis least aligned with va)
    least = jnp.argmin(jnp.abs(va), axis=-1)
    alt = jax.nn.one_hot(least, 3, dtype=dtype)
    vb_raw = jnp.where(ok_b[..., None], vb_raw, alt)
    vb = vb_raw - jnp.sum(vb_raw * va, axis=-1, keepdims=True) * va
    nb2 = jnp.sum(vb * vb, axis=-1, keepdims=True)
    ok_nb = nb2 > 1e-60
    vb = jnp.where(ok_nb, vb / jnp.sqrt(jnp.where(ok_nb, nb2, 1.0)),
                   jnp.cross(va, alt) /
                   jnp.maximum(jnp.linalg.norm(jnp.cross(va, alt),
                                               axis=-1, keepdims=True), 1e-30))
    vm = jnp.cross(va, vb)  # middle eigenvector completes the basis

    v2 = jnp.where(hi_first[..., None], va, vb)
    v0 = jnp.where(hi_first[..., None], vb, va)
    w = jnp.stack([w0, w1, w2], axis=-1)
    V = jnp.stack([v0, vm, v2], axis=-1)
    return w, V


def cholesky_solve_6x6(H, g, jitter: float = 0.0):
    """Unrolled Cholesky solve of the SPD 6x6 GN system H x = g.

    ~70 flat ops with a short dependency chain -- the latency-optimal dense
    solve for the non-degenerate branch (the reference's
    colPivHouseholderQr at dcreg.hpp:250-253 on an SPD H).  Returns
    (x, ok) where ok is False if a pivot underflowed (H not PD)."""
    n = 6
    if jitter:
        H = H + jitter * jnp.eye(n, dtype=H.dtype)
    L = [[None] * n for _ in range(n)]
    ok = jnp.asarray(True)
    for j in range(n):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        ok = ok & (s > 1e-30)
        d = jnp.sqrt(jnp.where(s > 1e-30, s, 1.0))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # forward substitution L y = g
    y = [None] * n
    for i in range(n):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1), ok


def condition_number(w_asc, eps: float = 1e-12):
    """max |lambda| / max(min lambda, eps) from ascending eigenvalues,
    the guard convention used throughout the reference
    (icp_test_runner.cpp:2428-2429, 2456-2459)."""
    return w_asc[..., -1] / jnp.maximum(w_asc[..., 0], eps)
