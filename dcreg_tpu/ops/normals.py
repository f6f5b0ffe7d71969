"""Target-cloud normal estimation (PCL NormalEstimation equivalent).

Rebuild of the precompute in ``ICPContext::setTargetCloud``
(utils.hpp:393-424): per point, take the k nearest neighbors, form the
neighborhood covariance, and use its smallest eigenvector as the normal,
flipped toward the viewpoint (PCL's default viewpoint is the origin).
Batched: one k-NN sweep + one batched 3x3 EVD -- no trees, no loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import knn as knn_mod
from . import linalg
from ..utils import precise_jit


@precise_jit(static_argnames=("k", "chunk", "pcl_compat"))
def estimate_normals(points, k: int = 5, valid=None, viewpoint=None,
                     chunk: int = 2048, pcl_compat: bool = True):
    """Returns (N, 3) unit normals oriented toward `viewpoint` (default 0).

    ``pcl_compat=True`` (default) reproduces PCL's numerics: PCL's
    NormalEstimation accumulates the neighborhood covariance in a SINGLE
    float32 pass (computeMeanAndCovarianceMatrix: E[xx^T] - mu mu^T), whose
    catastrophic cancellation at LiDAR coordinate scale (|x| ~ 10 m,
    spread ~ 0.1 m) perturbs normals by ~1e-3 rad.  The reference's
    XICP/SuperLoc/O3D baselines consume these normals
    (utils.hpp:406-411), and matching the archived trajectories to <1e-3
    requires matching this noise (verified against
    iteration_history.csv's XICP rows).  ``pcl_compat=False`` computes the
    well-conditioned centered two-pass covariance in the input dtype."""
    _, idx = knn_mod.knn(points, points, valid, k=k, chunk=chunk,
                         refine=2 * k)
    neigh = points[idx]                                  # (N, k, 3)
    if pcl_compat:
        n32 = neigh.astype(jnp.float32)
        inv_k = jnp.float32(1.0 / k)
        mu = jnp.sum(n32, axis=1) * inv_k
        sq = jnp.einsum('nki,nkj->nij', n32, n32) * inv_k
        cov = (sq - jnp.einsum('ni,nj->nij', mu, mu)).astype(points.dtype)
    else:
        mean = jnp.mean(neigh, axis=1, keepdims=True)
        centered = neigh - mean
        cov = jnp.einsum('nki,nkj->nij', centered, centered) / k
    w, V = linalg.symmetric_eigh(cov)
    normal = V[..., 0]                                   # smallest eigvec
    if viewpoint is None:
        viewpoint = jnp.zeros(3, dtype=points.dtype)
    to_vp = viewpoint[None, :] - points
    flip = jnp.sum(normal * to_vp, axis=-1) < 0.0
    return jnp.where(flip[:, None], -normal, normal)
