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


@precise_jit(static_argnames=("k", "chunk"))
def estimate_normals(points, k: int = 5, valid=None, viewpoint=None,
                     chunk: int = 2048):
    """Returns (N, 3) unit normals oriented toward `viewpoint` (default 0)."""
    _, idx = knn_mod.knn(points, points, valid, k=k, chunk=chunk,
                         refine=2 * k)
    neigh = points[idx]                                  # (N, k, 3)
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
