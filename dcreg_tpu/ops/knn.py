"""Nearest-neighbor search as batched TPU-friendly tensor ops.

The reference uses a pcl::KdTreeFLANN 5-NN query per transformed source point
(``DCReg/include/utils.hpp:393-424`` builds the tree;
``DCReg/src/icp_test_runner.cpp:1722`` queries it).  Pointer-chasing trees do
not map to XLA, so the rebuild expresses k-NN as a tiled distance matmul +
running top-k:

  * distances via the |q|^2 + |t|^2 - 2 q.t expansion -> the q @ t^T term is
    an (chunk x 3) @ (3 x M) matmul that rides the MXU;
  * an optional exact-refinement pass re-ranks the top `refine` candidates
    with directly-computed differences, recovering fp32 accuracy lost to
    cancellation in the expansion (important at |coord| ~ 1e2);
  * masking by +inf keeps padded points out of every top-k.

A Pallas fused kernel (distance tile + running top-k without materializing
the distance matrix) lives in ``pallas_knn.py``; this module is the portable
XLA reference implementation and the fallback on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from ..utils import precise_jit

LARGE = jnp.inf


def _pad_to_multiple(x, multiple, axis, value):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, rem)
    return jnp.pad(x, pad_widths, constant_values=value), n


def _topk_min(d, k, group: int = 128):
    """Exact k smallest per row, two-level extraction.

    ``lax.top_k`` lowers to a full per-row sort (O(M log M) with terrible
    constants on CPU and sort-lane overhead on TPU).  Instead: one full pass
    computes per-group (lane-block) minima; then k cheap rounds pick the best
    group, extract its minimum element, mask it, and patch that single group
    min -- O(M) total full-width work plus k * O(M/group + group).
    d: (C, M) -> (vals (C, k) ascending, idx (C, k)).  Exact (each round
    re-exposes the next element of a group after masking).
    """
    C, M = d.shape
    rem = (-M) % group
    if rem:
        d = jnp.pad(d, ((0, 0), (0, rem)), constant_values=jnp.inf)
    G = d.shape[1] // group
    dg = d.reshape(C, G, group)
    gmin = jnp.min(dg, axis=2)                      # (C, G)
    rows = jnp.arange(C)
    vals, idxs = [], []
    for _ in range(k):
        g = jnp.argmin(gmin, axis=1)                # (C,)
        block = dg[rows, g]                         # (C, group)
        e = jnp.argmin(block, axis=1)
        v = block[rows, e]
        vals.append(v)
        idxs.append(g * group + e)
        block = block.at[rows, e].set(jnp.inf)
        dg = dg.at[rows, g].set(block)
        gmin = gmin.at[rows, g].set(jnp.min(block, axis=1))
    return jnp.stack(vals, 1), jnp.stack(idxs, 1)


@precise_jit(static_argnames=("k", "chunk", "refine"))
def knn(query, target, target_valid=None, k: int = 5, chunk: int = 1024,
        refine: int = 0):
    """k nearest neighbors of each query point in target.

    query: (N, 3); target: (M, 3); target_valid: optional (M,) bool mask.
    Returns (sq_dists (N, k) ascending, indices (N, k)).

    On TPU (f32) this dispatches to the fused Pallas kernel in
    ``pallas_knn.py`` (identical results, ~4x faster: the distance tiles
    never leave VMEM).  This XLA implementation is the portable reference
    path and the CPU / f64 fallback.
    """
    dtype = query.dtype
    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        from . import pallas_knn
        return pallas_knn.knn(query, target, target_valid, k=k,
                              kk=max(k + 3, refine))
    n = query.shape[0]
    q_pad, _ = _pad_to_multiple(query, chunk, 0, 0.0)
    t_sq = jnp.sum(target * target, axis=-1)
    if target_valid is not None:
        t_sq = jnp.where(target_valid, t_sq, LARGE)

    # the |q|^2+|t|^2-2q.t expansion is exact to ~1e-12 relative in f64, so
    # the f32 re-ranking pass is skipped there (halves extraction work)
    if dtype == jnp.float64:
        refine = 0
    kk = max(k, refine)

    def chunk_fn(q):
        q_sq = jnp.sum(q * q, axis=-1)
        d = q_sq[:, None] + t_sq[None, :] - 2.0 * (q @ target.T)
        return _topk_min(d, kk)

    n_chunks = q_pad.shape[0] // chunk
    d_all, i_all = jax.lax.map(chunk_fn, q_pad.reshape(n_chunks, chunk, 3))
    d_all = d_all.reshape(-1, kk)[:n]
    i_all = i_all.reshape(-1, kk)[:n]

    if refine and refine > k:
        # exact re-ranking of the candidate set
        cand = target[i_all]                                # (N, kk, 3)
        diff = cand - query[:, None, :]
        d_exact = jnp.sum(diff * diff, axis=-1).astype(dtype)
        if target_valid is not None:
            d_exact = jnp.where(target_valid[i_all], d_exact, LARGE)
        neg_top, sel = jax.lax.top_k(-d_exact, k)
        return -neg_top, jnp.take_along_axis(i_all, sel, axis=-1)
    # exact distances for the selected k (cheap, fixes expansion error)
    cand = target[i_all[:, :k]]
    diff = cand - query[:, None, :]
    d_exact = jnp.sum(diff * diff, axis=-1).astype(dtype)
    if target_valid is not None:
        d_exact = jnp.where(target_valid[i_all[:, :k]], d_exact, LARGE)
    return d_exact, i_all[:, :k]


@precise_jit(static_argnames=("chunk",))
def nn1(query, target, target_valid=None, chunk: int = 1024):
    """1-NN convenience wrapper returning ((N,) sqdist, (N,) index)."""
    d, i = knn(query, target, target_valid, k=1, chunk=chunk, refine=8)
    return d[:, 0], i[:, 0]
