"""Correspondence pipeline: transform -> 5-NN -> plane fit -> robust weight.

TPU-native rebuild of the per-point OpenMP loop at
``DCReg/src/icp_test_runner.cpp:1714-1840`` (SO3 engine; the Euler engine's
loop at :2179-2266 is identical).  Where the reference compacts valid
correspondences into dense vectors, we keep fixed shapes and carry a validity
mask -- compaction is hostile to XLA, masks are free.

Per (transformed) source point p_w the reference:
  1. finds 5 NN in the target; requires all 5 within ``search_radius``
     (icp_test_runner.cpp:1726);
  2. fits a plane through the 5 neighbors by least squares of A x = -1,
     normalizes to n = x/|x|, d = 1/|x| (:1747-1760);
  3. rejects if any neighbor is > 0.2 m off-plane (:1763-1773);
  4. computes residual r = n.p_w + d and robust weight
     s = max(0, 1 - 0.9 |r|), keeping the point only if s > 0.1 (:1774-1790);
  5. stores the weighted normal s*n and weighted residual s*r.

The plane fit here uses a batched Householder-QR least-squares solve (same
algorithm class as Eigen's colPivHouseholderQr on the 5x3 system) so fp32
conditioning matches the reference's QR rather than squared normal equations.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import knn as knn_mod
from ..utils import precise_jit


class Correspondences(NamedTuple):
    """Fixed-shape correspondence set (mask instead of compaction)."""
    valid: jax.Array          # (N,) bool: contributes to the GN system
    in_radius: jax.Array      # (N,) bool: all 5 NN within search radius
    normal: jax.Array         # (N, 3) unit plane normal
    residual: jax.Array       # (N,) raw signed point-to-plane distance
    weight: jax.Array         # (N,) robust weight s (0 where invalid)
    nn_idx: jax.Array         # (N, K) neighbor indices


def householder_lstsq(A, b):
    """Least-squares solve of A x = b for A (..., m, n), m >= n, via n
    Householder reflections.  Batched, branchless, no LAPACK."""
    m, n = A.shape[-2], A.shape[-1]
    R = A
    y = b[..., None] if b.ndim == A.ndim - 1 else b
    for j in range(n):
        x = R[..., j:, j]
        normx = jnp.sqrt(jnp.sum(x * x, axis=-1))
        alpha = -jnp.sign(jnp.where(x[..., 0] == 0, 1.0, x[..., 0])) * normx
        v = x - jnp.concatenate(
            [alpha[..., None], jnp.zeros_like(x[..., 1:])], axis=-1)
        vnorm2 = jnp.sum(v * v, axis=-1)
        safe = vnorm2 > 0
        inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        # apply reflection to trailing block of R and to y
        Rt = R[..., j:, :]
        coef = jnp.einsum('...i,...ij->...j', v, Rt) * inv[..., None]
        Rt = Rt - v[..., :, None] * coef[..., None, :]
        R = jnp.concatenate([R[..., :j, :], Rt], axis=-2)
        yt = y[..., j:, :]
        coef_y = jnp.einsum('...i,...ij->...j', v, yt) * inv[..., None]
        yt = yt - v[..., :, None] * coef_y[..., None, :]
        y = jnp.concatenate([y[..., :j, :], yt], axis=-2)
    # back substitution on the upper-triangular n x n block
    x = jnp.zeros(A.shape[:-2] + (n,), dtype=A.dtype)
    for i in range(n - 1, -1, -1):
        rhs = y[..., i, 0] - jnp.einsum('...j,...j->...', R[..., i, i + 1:], x[..., i + 1:])
        diag = R[..., i, i]
        safe = jnp.abs(diag) > 1e-30
        x = x.at[..., i].set(jnp.where(safe, rhs / jnp.where(safe, diag, 1.0), 0.0))
    return x


def fit_planes(neighbor_xyz):
    """Fit planes n.p + d = 0 through K-neighbor sets.

    neighbor_xyz: (N, K, 3).  Returns (normal (N, 3) unit, d (N,),
    ok (N,) bool for |x| >= 1e-6 as in icp_test_runner.cpp:1750-1755).

    Solves the reference's least-squares system A x = -1
    (icp_test_runner.cpp:1747-1760) in CLOSED FORM via the centered
    normal equations: with c the neighbor centroid and K = B^T B the
    centered scatter (B = A - 1 c^T, so B^T 1 = 0),

        (K + k c c^T) x = -k c      [exactly A^T A x = -A^T 1]

    expanded in K's eigenbasis (closed-form 3x3 EVD) with every 1/lambda
    ratio rescaled by lambda_min so coplanar neighbor sets (K rank-2, the
    common case on simulated geometry) evaluate stably:

        x = -(sum_i a_i r_i v_i) / (lam0/k + sum_i a_i^2 r_i),
        a_i = v_i . c,  r_i = lam0 / lam_i  (r_0 = 1).

    Rank deficiency (e.g. exactly-coplanar ground points whose plane passes
    through the origin, or a zero column after rotation) is handled the way
    Eigen's colPivHouseholderQr handles it: directions with no data support
    -- ||A v_i||^2 = lam_i + K a_i^2 below threshold -- are dropped from the
    solve (their solution component is zero), reproducing the reference's
    rank-revealing basic solution on the golden fixtures.

    This is algebraically identical to the QR solve (same LS minimizer) but
    costs ~90 flat ops with no sequential Householder chain -- the QR path
    (householder_lstsq) serialized ~45 dependent stages of tiny unfusable
    concats, which dominated the correspondence pass on TPU.  f32 accuracy
    is governed by the well-scaled centered scatter instead of cond(A)^2.
    """
    from . import linalg
    dtype = neighbor_xyz.dtype
    K = neighbor_xyz.shape[-2]
    c = jnp.mean(neighbor_xyz, axis=-2)                       # (N, 3)
    Bc = neighbor_xyz - c[..., None, :]                       # centered
    S = jnp.einsum('...ki,...kj->...ij', Bc, Bc)              # (N, 3, 3)
    lam, V = linalg.eigh3_closed(S)                           # ascending
    lam = jnp.maximum(lam, 0.0)
    a = jnp.einsum('...ij,...i->...j', V, c)                  # v_i . c
    # rank detection on A itself: ||A v_i||^2 = lam_i + K a_i^2
    s_dir = lam + K * (a * a)
    eps_rank = 100.0 * jnp.finfo(dtype).eps
    active = s_dir > eps_rank * jnp.max(s_dir, axis=-1, keepdims=True)
    # smallest ACTIVE eigenvalue rescales every 1/lambda ratio
    big = jnp.asarray(jnp.inf, dtype)
    mu = jnp.min(jnp.where(active, lam, big), axis=-1)
    mu = jnp.where(jnp.isfinite(mu), mu, 0.0)
    # r_i = mu / lam_i on active dirs; the 0/0 (coplanar-normal) case -> 1
    lam_ok = lam > 1e-30
    r = jnp.where(lam_ok, mu[..., None] / jnp.where(lam_ok, lam, 1.0), 1.0)
    r = jnp.where(active, r, 0.0)
    num = -jnp.einsum('...j,...ij->...i', a * r, V)           # (N, 3)
    den = mu / K + jnp.sum(a * a * r, axis=-1)
    ok_den = jnp.abs(den) > 1e-30
    x = num / jnp.where(ok_den, den, 1.0)[..., None]
    ps_sq = jnp.sum(x * x, axis=-1)
    ok = ok_den & (ps_sq >= 1e-12)
    ps = jnp.sqrt(jnp.where(ok, ps_sq, 1.0))
    normal = x / ps[..., None]
    d = 1.0 / ps
    return normal, d, ok


class CorrespondenceParams(NamedTuple):
    search_radius: float = 1.0
    max_plane_thickness: float = 0.2     # icp_test_runner.cpp:1772
    weight_slope: float = 0.9            # s = max(0, 1 - 0.9 |r|) (:1776)
    min_weight: float = 0.1              # keep if s > 0.1 (:1785)
    k: int = 5
    num_blocks: int = 16                 # candidate-block cap (block_sparse)


@precise_jit(static_argnames=("params", "chunk"))
def find_correspondences(source_xyz, R, t, target_xyz, target_valid=None,
                         source_valid=None,
                         params: CorrespondenceParams = CorrespondenceParams(),
                         chunk: int = 2048, grid=None) -> Correspondences:
    """Full correspondence pass for one iteration (fixed shapes).

    source_xyz: (N, 3) body-frame points; (R, t): current pose;
    target_xyz: (M, 3) map points.

    ``grid``: optional prebuilt ``voxel_grid.GridIndex`` over target_xyz
    (voxel_size >= search_radius).  Replaces the O(N*M) brute-force scan
    with an exact ~30-candidate neighborhood walk -- build it ONCE per
    target (the reference's KD-tree build, utils.hpp:393-424) and reuse it
    across every iteration and every Monte-Carlo run.
    """
    p_world = source_xyz @ R.T + t
    if grid is not None:
        if target_valid is not None:
            raise ValueError(
                "target_valid is not honored on the grid/BlockIndex path -- "
                "bake validity into the index at build time instead")
        from .block_sparse import BlockIndex, block_knn
        if isinstance(grid, BlockIndex):
            # block-culled search: source_xyz MUST be Morton-sorted and the
            # grid built over the matching sorted target (block_sparse.py)
            sq_d, idx, _ = block_knn(grid, p_world, params.search_radius,
                                     k=params.k,
                                     num_blocks=params.num_blocks)
        else:
            from .voxel_grid import grid_knn
            sq_d, idx = grid_knn(grid, p_world, k=params.k)
    else:
        sq_d, idx = knn_mod.knn(p_world, target_xyz, target_valid,
                                k=params.k, chunk=chunk, refine=2 * params.k)
    neigh = target_xyz[idx]                              # (N, K, 3)
    return correspondence_tail(p_world, sq_d, idx, neigh, params,
                               source_valid)


def correspondence_tail(p_world, sq_d, idx, neigh,
                        params: CorrespondenceParams,
                        source_valid=None) -> Correspondences:
    """Post-search half of the correspondence pass: plane fit, thickness
    gate, robust weight (icp_test_runner.cpp:1747-1790).  Shared by every
    search backend (brute force, grid, block-sparse, batched kernel)."""
    in_radius = sq_d[:, params.k - 1] < params.search_radius ** 2

    normal, d_off, fit_ok = fit_planes(neigh)

    # plane-quality gate: every neighbor within max_plane_thickness of plane
    plane_dist = jnp.einsum('nkj,nj->nk', neigh, normal) + d_off[:, None]
    max_dev_sq = jnp.max(plane_dist * plane_dist, axis=-1)
    plane_ok = max_dev_sq < params.max_plane_thickness ** 2

    residual = jnp.einsum('nj,nj->n', p_world, normal) + d_off
    s = jnp.maximum(0.0, 1.0 - params.weight_slope * jnp.abs(residual))
    weight_ok = s > params.min_weight

    valid = in_radius & fit_ok & plane_ok & weight_ok
    if source_valid is not None:
        valid = valid & source_valid
        in_radius = in_radius & source_valid
    weight = jnp.where(valid, s, 0.0)
    return Correspondences(valid=valid, in_radius=in_radius, normal=normal,
                           residual=residual, weight=weight, nn_idx=idx)
