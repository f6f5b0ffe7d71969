"""Voxel-grid spatial index: XLA-native neighbor search for large maps.

The reference queries a pcl::KdTreeFLANN over the whole map
(utils.hpp:393-424); pointer-chasing trees do not map to XLA, and the
brute-force distance matmul in ``knn.py`` is O(N*M) -- fine for frame-sized
targets (~1e4 points), hopeless for the 53M-241M-point maps of the
long-duration experiments (supp.pdf Tables II/III headers).

This module is the scalable middle path (SURVEY.md section 7 "hard parts"
item 1): a dense voxel grid built ONCE per map (the reference's KD-tree
build is likewise one-time, ICPContext::setTargetCloud):

  build:  voxel id per point -> stable counting-sort by id (argsort) ->
          per-voxel start offsets via searchsorted.  All fixed shapes.
  query:  each query point gathers the 27-neighborhood voxel buckets
          (capacity-bounded), computes exact distances to <= 27*capacity
          candidates, and top-k's them.  With voxel size >= search radius,
          the 27-neighborhood provably covers every within-radius neighbor,
          so results match the KD-tree exactly for gated correspondences
          (validated against brute force in tests/test_voxel_grid.py).

Complexity per query: O(27 * capacity) independent of map size; memory is
one int32 per map point plus the bucket table.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import precise_jit


class VoxelGrid(NamedTuple):
    """Immutable spatial index over a fixed point set."""
    points: jax.Array        # (M, 3) the indexed points (original order)
    sorted_idx: jax.Array    # (M,) point index sorted by voxel id
    voxel_of_sorted: jax.Array  # (M,) voxel id of each sorted point
    origin: jax.Array        # (3,) grid origin (min corner - half pad)
    inv_size: jax.Array      # () 1 / voxel edge length
    dims: jax.Array          # (3,) int32 grid dimensions
    valid: jax.Array         # (M,) bool validity of each original point


def _voxel_id(coords, dims):
    """Linear id = (ix * ny + iy) * nz + iz, clipped into the grid."""
    ix = jnp.clip(coords[..., 0], 0, dims[0] - 1)
    iy = jnp.clip(coords[..., 1], 0, dims[1] - 1)
    iz = jnp.clip(coords[..., 2], 0, dims[2] - 1)
    return (ix * dims[1] + iy) * dims[2] + iz


@precise_jit(static_argnames=())
def build_voxel_grid(points, voxel_size, valid=None) -> VoxelGrid:
    """Index ``points`` (M, 3) into a voxel grid with edge ``voxel_size``.

    For exact k-NN semantics of gated correspondences, pick
    ``voxel_size >= search_radius`` (the 27-neighborhood then covers the
    full search ball)."""
    dtype = points.dtype
    M = points.shape[0]
    if valid is None:
        valid = jnp.ones(M, bool)
    big = jnp.asarray(3.4e38, dtype)
    pts_for_bounds = jnp.where(valid[:, None], points, big)
    lo = jnp.min(pts_for_bounds, axis=0)
    pts_for_bounds = jnp.where(valid[:, None], points, -big)
    hi = jnp.max(pts_for_bounds, axis=0)
    origin = lo - voxel_size * 0.5
    inv = 1.0 / voxel_size
    dims = jnp.maximum(
        jnp.ceil((hi - origin) * inv).astype(jnp.int32) + 1, 1)
    coords = jnp.floor((points - origin) * inv).astype(jnp.int32)
    vid = _voxel_id(coords, dims)
    # invalid points go to a sentinel id past every real voxel
    sentinel = dims[0] * dims[1] * dims[2] + 1
    vid = jnp.where(valid, vid, sentinel)
    order = jnp.argsort(vid, stable=True)
    return VoxelGrid(points=points, sorted_idx=order.astype(jnp.int32),
                     voxel_of_sorted=vid[order], origin=origin,
                     inv_size=jnp.asarray(inv, dtype), dims=dims,
                     valid=valid)


# offsets of the 27-neighborhood, shaped (27, 3)
_NEIGHBORHOOD = jnp.stack(jnp.meshgrid(
    jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
    indexing="ij"), axis=-1).reshape(27, 3)


@precise_jit(static_argnames=("k", "capacity", "chunk"))
def voxel_knn(grid: VoxelGrid, query, k: int = 5, capacity: int = 32,
              chunk: int = 1024):
    """k nearest neighbors of each query point among the indexed points.

    capacity bounds the candidates drawn per neighborhood voxel; candidates
    beyond it are dropped (choose capacity >= expected max points/voxel for
    exactness -- the tests cross-check against brute force).

    Returns (sq_dists (N, k) ascending, indices (N, k) into grid.points);
    missing neighbors carry +inf distance and index 0.
    """
    dtype = query.dtype
    n = query.shape[0]
    pad = (-n) % chunk
    q_pad = jnp.pad(query, ((0, pad), (0, 0)))
    dims = grid.dims

    def chunk_fn(q):
        coords = jnp.floor((q - grid.origin) * grid.inv_size
                           ).astype(jnp.int32)                  # (C, 3)
        neigh = coords[:, None, :] + _NEIGHBORHOOD[None, :, :]  # (C, 27, 3)
        in_grid = jnp.all((neigh >= 0) & (neigh < dims[None, None, :]),
                          axis=-1)                              # (C, 27)
        vids = _voxel_id(neigh, dims)                           # (C, 27)
        # bucket span per voxel id via binary search on the sorted ids
        starts = jnp.searchsorted(grid.voxel_of_sorted, vids, side="left")
        ends = jnp.searchsorted(grid.voxel_of_sorted, vids, side="right")
        counts = jnp.where(in_grid, ends - starts, 0)           # (C, 27)
        # candidate slots: capacity per voxel
        slot = jnp.arange(capacity)
        cand_pos = starts[..., None] + slot[None, None, :]      # (C, 27, cap)
        cand_ok = slot[None, None, :] < jnp.minimum(counts, capacity)[..., None]
        cand_pos = jnp.clip(cand_pos, 0, grid.sorted_idx.shape[0] - 1)
        cand_idx = grid.sorted_idx[cand_pos]                    # (C, 27, cap)
        cand_xyz = grid.points[cand_idx]                        # (C, 27, cap, 3)
        diff = cand_xyz - q[:, None, None, :]
        d = jnp.sum(diff * diff, axis=-1)
        d = jnp.where(cand_ok, d, jnp.inf)
        C = q.shape[0]
        d_flat = d.reshape(C, 27 * capacity)
        i_flat = cand_idx.reshape(C, 27 * capacity)
        neg, sel = jax.lax.top_k(-d_flat, k)
        return -neg, jnp.take_along_axis(i_flat, sel, axis=-1)

    n_chunks = q_pad.shape[0] // chunk
    d_all, i_all = jax.lax.map(
        chunk_fn, q_pad.reshape(n_chunks, chunk, 3))
    d_all = d_all.reshape(-1, k)[:n].astype(dtype)
    i_all = i_all.reshape(-1, k)[:n].astype(jnp.int32)
    i_all = jnp.where(jnp.isfinite(d_all), i_all, 0)
    return d_all, i_all


# ---------------------------------------------------------------------------
# CSR grid index with STATIC dims / candidate cap -- the hot-loop k-NN path.
#
# Unlike ``VoxelGrid`` above (device-built, traced dims, 27 x capacity slots
# per query), this index is built ONCE on the host per target cloud and
# carries its grid dimensions and candidate bound as static metadata.  The
# query then enumerates each point's ACTUAL 27-neighborhood candidates
# (typically ~10-30 for LiDAR frames) through a CSR cumulative-offset walk --
# ~30 gathered candidates per query instead of 27*capacity slots or an
# O(M) brute-force scan.  On the cylinder benchmark this removes ~97% of the
# correspondence-search work per ICP iteration (the reference's KD-tree,
# utils.hpp:393-424, is likewise a one-time build amortized over the run).
#
# Exactness: with voxel_size >= search_radius the 27-neighborhood covers the
# full search ball, and ``cap`` is computed as the exact maximum
# 27-neighborhood occupancy over every possible query cell (dilated grid),
# so no candidate is ever dropped.  k-NN results therefore match brute force
# exactly for every query whose neighbors are all within ``voxel_size``; the
# pipeline's in_radius gate (icp_test_runner.cpp:1726) rejects everything
# farther, so gated correspondences are bit-identical.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("points", "order", "start", "origin"),
    meta_fields=("dims", "voxel_size", "cap"))
@dataclasses.dataclass(frozen=True)
class GridIndex:
    points: jax.Array       # (M, 3) indexed points, original order
    order: jax.Array        # (V,) int32 valid-point indices sorted by cell
    start: jax.Array        # (ncells + 1,) int32 CSR offsets into order
    origin: jax.Array       # (3,) grid min corner
    dims: tuple             # static (nx, ny, nz)
    voxel_size: float       # static edge length
    cap: int                # static exact max 27-neighborhood occupancy


def build_grid_index(points, voxel_size: float, valid=None,
                     dtype=jnp.float32) -> GridIndex:
    """Host-side CSR grid build (numpy; once per target cloud).

    points: (M, 3) array-like; voxel_size: grid edge (>= the search radius
    for exact gated-k-NN semantics); valid: optional (M,) bool mask --
    invalid points are excluded from the index entirely.
    """
    pts = np.asarray(points, np.float64)
    M = pts.shape[0]
    vmask = (np.ones(M, bool) if valid is None
             else np.asarray(valid, bool))
    vp = pts[vmask]
    if vp.shape[0] == 0:
        raise ValueError("grid index needs at least one valid point")
    lo = vp.min(axis=0)
    origin = lo - 0.5 * voxel_size
    inv = 1.0 / voxel_size
    coords = np.floor((vp - origin) * inv).astype(np.int64)
    dims = tuple(int(d) for d in coords.max(axis=0) + 1)
    ncells = dims[0] * dims[1] * dims[2]
    if ncells > 200_000_000:
        raise ValueError(f"grid too large ({ncells} cells); increase "
                         f"voxel_size or crop the cloud")
    flat = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    orig_idx = np.nonzero(vmask)[0].astype(np.int32)
    perm = np.argsort(flat, kind="stable")
    order = orig_idx[perm]
    flat_sorted = flat[perm]
    start = np.searchsorted(flat_sorted, np.arange(ncells + 1)).astype(np.int32)

    # exact candidate bound: max 27-neighborhood occupancy over every cell of
    # the 1-dilated grid (covers any query position, in or out of the box)
    counts = np.zeros(ncells, np.int32)
    np.add.at(counts, flat, 1)
    C3 = counts.reshape(dims)
    Ppad = np.pad(C3, 2)  # pad 2: centers range over the 1-dilated grid
    S = np.zeros(tuple(d + 2 for d in dims), np.int64)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                S += Ppad[dx:dx + dims[0] + 2, dy:dy + dims[1] + 2,
                          dz:dz + dims[2] + 2]
    cap = int(S.max())
    cap = max(8, -(-cap // 8) * 8)  # round up to a multiple of 8, min 8

    return GridIndex(points=jnp.asarray(points, dtype),
                     order=jnp.asarray(order),
                     start=jnp.asarray(start),
                     origin=jnp.asarray(origin, dtype),
                     dims=dims, voxel_size=float(voxel_size), cap=cap)


def _extract_k_smallest_xla(d, idx, k: int):
    """k rounds of packed-key (min, mask) extraction -- no sort, no argmin.
    d: (..., C) >= 0 (inf allowed); idx: (..., C) int32."""
    from .pallas_knn import _extract_k_smallest
    return _extract_k_smallest(d, idx, k)


@precise_jit(static_argnames=("k",))
def grid_knn(grid: GridIndex, query, k: int = 5):
    """Exact k-NN of each query among grid points within the 27-neighborhood.

    query: (N, 3).  Returns (sq_dists (N, k) ascending, indices (N, k) into
    ``grid.points``); a missing j-th neighbor (fewer than j candidates within
    the neighborhood) carries +inf distance.  Neighbors farther than
    ``grid.voxel_size`` may be missed -- by construction callers gate at
    search_radius <= voxel_size, so gated results are exact (validated
    against brute force in tests/test_voxel_grid.py).
    """
    dtype = query.dtype
    n = query.shape[0]
    dims = jnp.asarray(grid.dims, jnp.int32)
    nx, ny, nz = grid.dims
    M = grid.points.shape[0]
    cap = grid.cap

    qc = jnp.floor((query - grid.origin) *
                   jnp.asarray(1.0 / grid.voxel_size, dtype)).astype(jnp.int32)
    nb = qc[:, None, :] + _NEIGHBORHOOD[None, :, :]          # (N, 27, 3)
    in_grid = jnp.all((nb >= 0) & (nb < dims[None, None, :]), axis=-1)
    nbc = jnp.clip(nb, 0, dims[None, None, :] - 1)
    flat = (nbc[..., 0] * ny + nbc[..., 1]) * nz + nbc[..., 2]  # (N, 27)
    s = grid.start[flat]
    cnt = jnp.where(in_grid, grid.start[flat + 1] - s, 0)    # (N, 27)
    cum = jnp.cumsum(cnt, axis=1)                            # (N, 27)
    total = cum[:, -1]

    # slot c -> owning neighborhood bucket b(c) = #{j : cum[j] <= c}
    c = jnp.arange(cap, dtype=jnp.int32)                     # (cap,)
    b = jnp.sum((cum[:, :, None] <= c[None, None, :]).astype(jnp.int32),
                axis=1)                                      # (N, cap)
    bc = jnp.minimum(b, 26)
    prev = jnp.where(b > 0,
                     jnp.take_along_axis(cum, jnp.maximum(b - 1, 0), axis=1),
                     0)
    pos = jnp.take_along_axis(s, bc, axis=1) + (c[None, :] - prev)
    valid_slot = c[None, :] < total[:, None]
    pos = jnp.clip(pos, 0, jnp.maximum(grid.order.shape[0] - 1, 0))
    cand = grid.order[pos]                                   # (N, cap)
    cxyz = grid.points[cand]                                 # (N, cap, 3)
    diff = cxyz - query[:, None, :]
    d = jnp.sum(diff * diff, axis=-1)
    d = jnp.where(valid_slot, d, jnp.inf)
    if dtype == jnp.float64:
        # exact descending-sort selection (CPU/test path)
        neg, sel = jax.lax.top_k(-d, k)
        return -neg, jnp.take_along_axis(cand, sel, axis=-1)
    # f32 TPU path: packed-key extraction (returned distances are the exact
    # f32 values; only near-tie ORDERING is quantized at 2^-18 relative)
    vals, idx = _extract_k_smallest_xla(d, cand, k)
    return vals, idx
