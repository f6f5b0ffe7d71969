"""Registration quality metrics: point-to-point RMSE / fitness / Chamfer.

Rebuild of ``calculatePointToPointError`` (utils.hpp:538-589): forward 1-NN
from the aligned cloud to the target gives RMSE over inliers
(dist < error_threshold, but normalized by the FULL cloud size -- the
reference's exact convention), fitness = inlier fraction, and the symmetric
Chamfer distance averages the forward and backward mean NN distances.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import knn as knn_mod
from ..utils import precise_jit


@precise_jit(static_argnames=("chunk",))
def point_to_point_error(aligned_xyz, target_xyz, error_threshold,
                         aligned_valid=None, target_valid=None,
                         chunk: int = 2048):
    """Returns (rmse, fitness, chamfer, valid_correspondences)."""
    dtype = aligned_xyz.dtype
    fwd_sq, _ = knn_mod.nn1(aligned_xyz, target_xyz, target_valid, chunk=chunk)
    fwd = jnp.sqrt(fwd_sq)
    n_aligned = (jnp.sum(aligned_valid.astype(dtype))
                 if aligned_valid is not None
                 else jnp.asarray(aligned_xyz.shape[0], dtype))
    if aligned_valid is not None:
        fwd = jnp.where(aligned_valid, fwd, 0.0)
        fwd_sq = jnp.where(aligned_valid, fwd_sq, 0.0)
    inlier = fwd < error_threshold
    if aligned_valid is not None:
        inlier = inlier & aligned_valid
    valid_corr = jnp.sum(inlier.astype(jnp.int32))
    rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, fwd_sq, 0.0)) / n_aligned)
    fitness = valid_corr.astype(dtype) / n_aligned

    bwd_sq, _ = knn_mod.nn1(target_xyz, aligned_xyz, aligned_valid, chunk=chunk)
    bwd = jnp.sqrt(bwd_sq)
    n_target = (jnp.sum(target_valid.astype(dtype))
                if target_valid is not None
                else jnp.asarray(target_xyz.shape[0], dtype))
    if target_valid is not None:
        bwd = jnp.where(target_valid, bwd, 0.0)
    chamfer = 0.5 * (jnp.sum(fwd) / n_aligned + jnp.sum(bwd) / n_target)
    return rmse, fitness, chamfer, valid_corr
