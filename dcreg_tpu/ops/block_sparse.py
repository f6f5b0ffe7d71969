"""Block-sparse neighbor search: TPU-fast exact k-NN via coarse block culling.

The per-query gather patterns of a KD-tree or voxel walk are hostile to TPU
(XLA row gathers cost ~5-10 ns/row; a 7.5k x 27-cell walk costs 100+ ms per
batched ICP iteration, measured).  TPU is instead extremely good at (a)
gathering a few thousand CONTIGUOUS blocks and (b) dense distance tiles.
This module restructures the search accordingly (the TPU-native answer to
the reference's pcl::KdTreeFLANN, ``DCReg/include/utils.hpp:393-424``):

  build (host, once per target cloud):
    Morton-sort the target; partition into blocks of TB=32 consecutive
    (spatially compact) points; precompute per-block bounding boxes over the
    real points.

  query (jit, per ICP iteration):
    The caller keeps the SOURCE Morton-sorted too (a rigid transform
    preserves spatial coherence, so one pre-sort serves every iteration and
    every Monte-Carlo lane).  Queries are viewed as nq blocks of QB=128:
      1. per query block: world bbox (two reductions);
      2. (nq, n_target_blocks) bbox-to-bbox distance matrix -- tiny;
      3. every target block within ``radius`` is relevant; take the nearest
         G (static cap) -> blockmap (nq, G);
      4. ONE coarse gather of (nq, G) contiguous 32-point blocks;
      5. dense (QB, G*32) coordinate-wise distances + packed-key top-k.

  Exactness: for query q in block Q, any target point within ``radius`` of q
  lies in a block whose bbox is within ``radius`` of q and hence of Q's
  bbox, so it is relevant.  If fewer than G blocks are relevant the result
  is EXACT for every neighbor within ``radius`` (the correspondence gate,
  icp_test_runner.cpp:1726, rejects everything farther).  If more than G are
  relevant, only the G nearest-bbox blocks are searched; ``overflow`` counts
  affected query blocks (size G via ``suggest_num_blocks`` so this stays 0).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import precise_jit

TB = 32    # target block size (points)
QB = 128   # query block size (points)


def morton_argsort(points) -> np.ndarray:
    """Spatial (Morton/Z-order) sort permutation of an (M, 3) cloud (host).

    21 bits per dimension interleaved -- consecutive indices are spatially
    close, which is what makes 32-point blocks compact."""
    pts = np.asarray(points, np.float64)
    lo = pts.min(axis=0)
    span = max(float((pts.max(axis=0) - lo).max()), 1e-9)
    q = np.minimum(((pts - lo) / span * ((1 << 21) - 1)).astype(np.uint64),
                   (1 << 21) - 1)

    def spread(x):
        x &= np.uint64(0x1FFFFF)
        x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


BIG = 3.0e38   # sentinel coordinate: any distance to it exceeds every gate


def kd_block_order(points, block: int = 128) -> np.ndarray:
    """Permutation grouping points into spatially COMPACT ``block``-point
    runs via recursive median splits (balanced kd-tree leaves, host).

    A Morton sort keeps most runs compact but any run straddling a
    Z-order seam spans the whole cloud -- and the map-scale kernel's
    slot capacity (and the sharded path's num_blocks) is set by the
    WORST run.  Median splits have no seams: every leaf is a box.
    Splits land on multiples of ``block`` so all leaves except the last
    are exactly ``block`` points (block boundaries stay aligned for
    build_block_index / the QB=128 query view)."""
    pts = np.asarray(points, np.float64)
    n = pts.shape[0]
    out = np.empty(n, np.int64)
    pos = 0
    # explicit stack, left child pushed last -> processed first (DFS),
    # so the single partial leaf lands at the very end
    stack = [np.arange(n)]
    while stack:
        idx = stack.pop()
        if idx.size <= block:
            out[pos:pos + idx.size] = idx
            pos += idx.size
            continue
        p = pts[idx]
        ax = int(np.argmax(p.max(axis=0) - p.min(axis=0)))
        nb = idx.size // block
        k = (nb // 2) * block if nb >= 2 else block
        part = np.argpartition(p[:, ax], k)
        stack.append(idx[part[k:]])
        stack.append(idx[part[:k]])
    return out


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("blocks", "valid", "lo", "hi"),
    meta_fields=("num_blocks", "num_points", "tb"))
@dataclasses.dataclass(frozen=True)
class BlockIndex:
    """Blocked, Morton-sorted target cloud + per-block bounding boxes.

    Indices returned by ``block_knn`` refer to the SORTED target order --
    callers are expected to pre-permute the target cloud they hand to the
    rest of the pipeline (see ``morton_argsort``).

    ``blocks`` carries ONE extra all-sentinel block at index num_blocks
    (the flush target of padding pairs in the batched kernel) and sentinel
    coordinates in padding slots, so consumers never re-mask or re-copy
    the (potentially multi-GB, map-scale) point array per iteration.

    ``blocks`` is stored COORDINATE-MAJOR, (nbt + 1, 3, tb): any layout
    with the coordinate axis minor gets XLA's (8, 128) tiling with the
    minor 3 lane-padded to 128 -- a hidden 42x HBM blowup (25.6 GB for
    a 50M-point map, measured as a compile-time OOM).  With tb = 128 in
    the lane dimension the pad factor is only 8/3 on the tiny coordinate
    axis (50M points -> 1.6 GB)."""
    blocks: jax.Array     # (nbt + 1, 3, tb) sorted target, BIG at padding
    valid: jax.Array      # (nbt, TB) bool, False at padding
    lo: jax.Array         # (nbt, 3) bbox over real points
    hi: jax.Array         # (nbt, 3)
    num_blocks: int
    num_points: int       # real (unpadded) point count
    tb: int = TB          # block size (points per block)


def build_block_index(sorted_points, dtype=jnp.float32,
                      tb: int = TB) -> BlockIndex:
    """Build the block index from an ALREADY spatially-sorted (M, 3) cloud."""
    pts = np.asarray(sorted_points, np.float64)
    M = pts.shape[0]
    nbt = -(-M // tb)
    pad = nbt * tb - M
    big = np.float64(np.finfo(np.float32).max) if dtype == jnp.float32 \
        else BIG
    padded = np.concatenate([pts, np.full((pad, 3), big)])
    blocks = padded.reshape(nbt, tb, 3)
    valid = np.arange(nbt * tb).reshape(nbt, tb) < M
    lo = np.where(valid[..., None], blocks, np.inf).min(axis=1)
    hi = np.where(valid[..., None], blocks, -np.inf).max(axis=1)
    blocks = np.concatenate([blocks, np.full((1, tb, 3), big)])
    blocks = np.ascontiguousarray(blocks.transpose(0, 2, 1))
    return BlockIndex(blocks=jnp.asarray(blocks, dtype),
                      valid=jnp.asarray(valid),
                      lo=jnp.asarray(lo, dtype), hi=jnp.asarray(hi, dtype),
                      num_blocks=int(nbt), num_points=int(M), tb=int(tb))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("block", "sup_lo", "sup_hi", "blk_lo_g", "blk_hi_g"),
    meta_fields=("sb", "num_supers"))
@dataclasses.dataclass(frozen=True)
class MapIndex:
    """Two-level block index for MAP-SCALE targets (millions+ of points).

    Level 0 is the flat ``BlockIndex`` (tb-point Morton blocks + bboxes);
    level 1 groups ``sb`` consecutive blocks into SUPER-blocks with their
    own bboxes.  Culling then goes query-block -> relevant supers ->
    relevant blocks, so nothing ever materializes an
    (n_query_blocks, n_target_blocks) matrix -- the per-iteration cost
    tracks the scan's spatial neighborhood, not the map size.  This is the
    TPU-native shape of the reference's scan-to-map KD-tree queries
    against 53M-241M-point prior maps (supp.pdf Tables II/III;
    icp_test_runner.cpp:1722)."""
    block: BlockIndex
    sup_lo: jax.Array     # (ns, 3) super bbox over real points
    sup_hi: jax.Array     # (ns, 3)
    blk_lo_g: jax.Array   # (ns, sb*3) block bboxes GROUPED BY SUPER:
    #   the level-0 cull gathers each selected super's blocks as ONE
    #   contiguous slab instead of sb independent 12-byte row gathers
    #   from a multi-hundred-k-row array (measured 0.93 ms at 50M
    #   points).  Stored rank-2 with the coordinate axis FOLDED into the
    #   minor dim: an (ns, sb, 3) layout would lane-pad the minor 3 to
    #   128 (the 42x hidden-HBM trap).  Padding rows inf/-inf.
    blk_hi_g: jax.Array   # (ns, sb*3)
    sb: int               # blocks per super
    num_supers: int


def build_map_index(sorted_points, dtype=jnp.float32, tb: int = 128,
                    sb: int = 64) -> MapIndex:
    """Build the two-level index from an already Morton-sorted (M, 3) map."""
    bi = build_block_index(sorted_points, dtype=dtype, tb=tb)
    nbt = bi.num_blocks
    ns = -(-nbt // sb)
    pad = ns * sb - nbt
    lo = np.concatenate([np.asarray(bi.lo, np.float64),
                         np.full((pad, 3), np.inf)])
    hi = np.concatenate([np.asarray(bi.hi, np.float64),
                         np.full((pad, 3), -np.inf)])
    lo_g = lo.reshape(ns, sb, 3)
    hi_g = hi.reshape(ns, sb, 3)
    sup_lo = lo_g.min(axis=1)
    sup_hi = hi_g.max(axis=1)
    return MapIndex(block=bi, sup_lo=jnp.asarray(sup_lo, dtype),
                    sup_hi=jnp.asarray(sup_hi, dtype),
                    blk_lo_g=jnp.asarray(lo_g.reshape(ns, sb * 3), dtype),
                    blk_hi_g=jnp.asarray(hi_g.reshape(ns, sb * 3), dtype),
                    sb=int(sb), num_supers=int(ns))


def suggest_num_blocks(index: BlockIndex, sample_queries, radius: float,
                       margin: int = 4) -> int:
    """Host-side G estimate: max #relevant target blocks over sample query
    blocks (e.g. the initial-pose-transformed sources), plus margin."""
    q = np.asarray(sample_queries, np.float64).reshape(-1, 3)
    n = q.shape[0]
    nq = -(-n // QB)
    qpad = np.concatenate([q, np.repeat(q[-1:], nq * QB - n, axis=0)])
    qb = qpad.reshape(nq, QB, 3)
    qlo, qhi = qb.min(axis=1), qb.max(axis=1)
    tlo, thi = np.asarray(index.lo), np.asarray(index.hi)
    gap = np.maximum(0.0, np.maximum(qlo[:, None] - thi[None, :],
                                     tlo[None, :] - qhi[:, None]))
    rel = (gap * gap).sum(-1) <= radius * radius
    return int(rel.sum(axis=1).max()) + margin


@precise_jit(static_argnames=("k", "num_blocks"))
def block_knn(index: BlockIndex, query, radius: float, k: int = 5,
              num_blocks: int = 16):
    """Exact k-NN within ``radius`` via block culling (see module docstring).

    query: (N, 3), MUST be spatially sorted (same Morton order as the cloud
    it derives from).  Returns (sq_dists (N, k) ascending, idx (N, k) into
    the sorted target, overflow () int32 = #query blocks whose relevant-
    block count exceeded num_blocks).
    """
    dtype = query.dtype
    n = query.shape[0]
    G = min(num_blocks, index.num_blocks)
    nbt = index.num_blocks
    nq = -(-n // QB)
    qpad = jnp.concatenate(
        [query, jnp.broadcast_to(query[-1:], (nq * QB - n, 3))])
    qb = qpad.reshape(nq, QB, 3)
    qlo = jnp.min(qb, axis=1)                                # (nq, 3)
    qhi = jnp.max(qb, axis=1)

    # bbox-to-bbox squared gaps (nq, nbt)
    gap = jnp.maximum(0.0, jnp.maximum(qlo[:, None] - index.hi[None, :],
                                       index.lo[None, :] - qhi[:, None]))
    d_bb = jnp.sum(gap * gap, axis=-1)
    relevant = d_bb <= radius * radius
    n_rel = jnp.sum(relevant.astype(jnp.int32), axis=1)
    overflow = jnp.sum((n_rel > G).astype(jnp.int32))

    # nearest-G relevant blocks per query block
    score = jnp.where(relevant, d_bb, jnp.inf)
    neg, bsel = jax.lax.top_k(-score, G)                     # (nq, G)
    slot_ok = jnp.isfinite(-neg)
    bsel = jnp.where(slot_ok, bsel, 0)

    # ONE coarse gather of contiguous blocks (coordinate-major storage)
    tb = index.tb
    cand = index.blocks[bsel].transpose(0, 1, 3, 2)          # (nq, G, tb, 3)
    cok = index.valid[bsel] & slot_ok[..., None]             # (nq, G, tb)
    cidx = bsel[..., None] * tb + jnp.arange(tb, dtype=jnp.int32)

    C = G * tb
    cand = cand.reshape(nq, C, 3)
    cok = cok.reshape(nq, C)
    cidx = cidx.reshape(nq, C).astype(jnp.int32)

    # dense coordinate-wise distances (exact in f32) + top-k
    diff = qb[:, :, None, :] - cand[:, None, :, :]           # (nq, QB, C, 3)
    d = jnp.sum(diff * diff, axis=-1)
    d = jnp.where(cok[:, None, :], d, jnp.inf)               # (nq, QB, C)
    idxb = jnp.broadcast_to(cidx[:, None, :], d.shape)
    if dtype == jnp.float64:
        negd, sel = jax.lax.top_k(-d, k)
        vals = -negd
        idx = jnp.take_along_axis(idxb, sel, axis=-1)
    else:
        from .pallas_knn import _extract_k_smallest
        vals, idx = _extract_k_smallest(
            d.reshape(nq * QB, C), idxb.reshape(nq * QB, C), k)
        vals = vals.reshape(nq, QB, k)
        idx = idx.reshape(nq, QB, k)
    vals = vals.reshape(nq * QB, k)[:n]
    idx = idx.reshape(nq * QB, k)[:n]
    idx = jnp.clip(idx, 0, index.num_points - 1)
    return vals, idx, overflow
