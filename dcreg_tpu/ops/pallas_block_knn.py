"""Batched ragged block-sparse k-NN Pallas kernel -- the ICP hot loop.

One kernel call answers the 5-NN queries of ALL Monte-Carlo pose lanes for
one ICP iteration.  Work is a ragged PAIR LIST of (query block, target
block) interactions -- only spatially relevant pairs (bbox gap <= radius,
unioned over lanes) are visited, so the cost is the MEAN neighborhood
occupancy instead of the max-padded dense grid or an O(N*M) scan:

  grid = (P,)  one step per pair, pairs sorted by query block;
  scalar-prefetch qid/tid drive the BlockSpec index maps (the MoE-style
  block-sparse pattern), so each step DMAs one 128-point source block and
  one 128-point target block;
  per step, an unrolled loop over the B pose lanes transforms the source
  block with that lane's (R, t) (poses live in SMEM), computes the
  (128 targets x 128 queries) coordinate-wise squared distances on the VPU,
  and merges the per-lane running 5-best lists held in VMEM scratch using
  the packed-key trick (low mantissa bits carry the strip row -> unique
  keys -> extraction is min + compare, no argmin/scatter/sort);
  the running lists are written to the output block every step; Pallas
  flushes them to HBM when qid changes.

Compared against the reference's per-point KD-tree queries
(DCReg/src/icp_test_runner.cpp:1722) this is the TPU-native shape of the
same computation: the KD-tree's log-factor pruning becomes block-level bbox
culling, and the per-point scalar recursion becomes dense 128x128 VPU
tiles.  Returned distances carry the packed-key quantization (relative
2^-15); indices are exact, and the correspondence pipeline re-derives every
residual from exactly-gathered coordinates, so the quantization only
perturbs the search-radius gate by ~1e-5 relative.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_sparse import BlockIndex, QB as _QB

TB = 128    # target block size (sublanes)
QB = 128    # query block size (lanes)
KP = 8      # padded k (sublane granularity)
BIG = 3.0e38

# strip = KP running rows + TB candidate rows; row id packed into low bits
_STRIP = KP + TB
_ROW_BITS = (_STRIP - 1).bit_length()   # 8
_ROW_MASK = (1 << _ROW_BITS) - 1


def _pack(d, rows):
    """Pack integer row ids into the low mantissa bits of positive f32 d."""
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    key = jnp.bitwise_or(jnp.bitwise_and(bits, ~jnp.int32(_ROW_MASK)), rows)
    return jax.lax.bitcast_convert_type(key, jnp.float32)


def _unpack_val(key):
    bits = jax.lax.bitcast_convert_type(key, jnp.int32)
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, ~jnp.int32(_ROW_MASK)), jnp.float32)


def _kernel(qid_ref, tid_ref, src_ref, tgt_ref, pose_ref,
            val_ref, idx_ref, run_val, run_idx, *, n_lanes: int):
    p = pl.program_id(0)
    first = jnp.where(p == 0, True,
                      qid_ref[p] != qid_ref[jnp.maximum(p - 1, 0)])

    @pl.when(first)
    def _init():
        run_val[:] = jnp.full_like(run_val, BIG)
        run_idx[:] = jnp.full_like(run_idx, -1.0)

    src = src_ref[0]                       # (3, QB)
    tgt = tgt_ref[0]                       # (TB, 3)
    # Mosaic's tpu.iota is integer-only: build int32 and convert.
    gidx = (jax.lax.broadcasted_iota(jnp.int32, (TB, QB), 0)
            + tid_ref[p] * TB).astype(jnp.float32)
    cand_rows = jax.lax.broadcasted_iota(jnp.int32, (TB, QB), 0) + KP
    run_rows = jax.lax.broadcasted_iota(jnp.int32, (KP, QB), 0)

    def lane(b, _):
        # world-frame queries for lane b: q = R_b p + t_b (SMEM scalars)
        q = [None] * 3
        for c in range(3):
            q[c] = (pose_ref[b, 3 * c + 0] * src[0:1, :] +
                    pose_ref[b, 3 * c + 1] * src[1:2, :] +
                    pose_ref[b, 3 * c + 2] * src[2:3, :] +
                    pose_ref[b, 9 + c])                  # (1, QB)
        d = jnp.zeros((TB, QB), jnp.float32)
        for c in range(3):
            diff = tgt[:, c:c + 1] - q[c]
            d = d + diff * diff
        # bias keeps keys normal floats (denormals lose their index bits)
        d = jnp.minimum(d, BIG) + jnp.float32(2.0 ** -30)

        prev_val = run_val[pl.ds(b * KP, KP), :]         # (KP, QB)
        prev_idx = run_idx[pl.ds(b * KP, KP), :]
        key = jnp.concatenate(
            [_pack(prev_val, run_rows), _pack(d, cand_rows)], axis=0)
        sidx = jnp.concatenate([prev_idx, gidx], axis=0)  # (_STRIP, QB)

        vals, idxs = [], []
        for _ in range(KP):
            m = jnp.min(key, axis=0, keepdims=True)      # (1, QB)
            sel = key == m
            vals.append(_unpack_val(m))
            idxs.append(jnp.max(jnp.where(sel, sidx, -1.0), axis=0,
                                keepdims=True))
            key = jnp.where(sel, BIG, key)
        run_val[pl.ds(b * KP, KP), :] = jnp.concatenate(vals, axis=0)
        run_idx[pl.ds(b * KP, KP), :] = jnp.concatenate(idxs, axis=0)
        return 0

    jax.lax.fori_loop(0, n_lanes, lane, 0, unroll=False)
    val_ref[0] = run_val[:]
    idx_ref[0] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("num_pairs", "interpret"))
def batched_block_knn(index: BlockIndex, src_blocks, poses, qid, tid,
                      num_pairs: int, covered=None, interpret: bool = False):
    """All-lane 5-NN for one ICP iteration.

    index: BlockIndex with TB=128 blocks (build_block_index_128);
    src_blocks: (nq, 3, QB) Morton-sorted source, blocked and transposed;
    poses: (B, 12) rows [R row-major (9), t (3)];
    qid/tid: (P,) int32 pair list sorted by qid -- padding pairs carry
    qid = nq (trash output row) and tid = nbt (sentinel BIG block);
    covered: optional (nq,) bool, True where the query block appears in at
    least one pair.  The kernel only writes pair-listed output rows, so rows
    of uncovered blocks hold uninitialized device memory -- when ``covered``
    is given those rows are post-masked to (BIG, -1).

    Returns (sq_dists (B, nq*QB, KP) quantized-key values ascending,
    idx (B, nq*QB, KP) int32 into the sorted target, -1 where missing).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    src_blocks = src_blocks.astype(jnp.float32)
    poses = poses.astype(jnp.float32)
    nq = src_blocks.shape[0]
    B = poses.shape[0]
    nbt = index.num_blocks

    # target blocks with a trailing BIG sentinel block (for padding pairs)
    tgt = jnp.concatenate(
        [index.blocks, jnp.full((1, TB, 3), BIG, index.blocks.dtype)], axis=0)
    tgt = jnp.where(jnp.concatenate(
        [index.valid, jnp.zeros((1, TB), bool)], axis=0)[..., None],
        tgt, BIG)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_pairs,),
        in_specs=[
            pl.BlockSpec((1, 3, QB), lambda p, qv, tv: (jnp.minimum(qv[p], nq - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, 3), lambda p, qv, tv: (tv[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B * KP, QB), lambda p, qv, tv: (qv[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B * KP, QB), lambda p, qv, tv: (qv[p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B * KP, QB), jnp.float32),
            pltpu.VMEM((B * KP, QB), jnp.float32),
        ],
    )
    out_val, out_idx = pl.pallas_call(
        functools.partial(_kernel, n_lanes=B),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq + 1, B * KP, QB), jnp.float32),
            jax.ShapeDtypeStruct((nq + 1, B * KP, QB), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=num_pairs * B * TB * QB * 40,
            bytes_accessed=num_pairs * (TB * 3 + 3 * QB) * 4
            + (nq + 1) * B * KP * QB * 8,
            transcendentals=0),
        interpret=interpret,
    )(qid, tid, src_blocks, tgt, poses)

    out_val, out_idx = out_val[:nq], out_idx[:nq]
    if covered is not None:
        cov = covered.reshape(nq, 1, 1)
        out_val = jnp.where(cov, out_val, BIG)
        out_idx = jnp.where(cov, out_idx, -1.0)
    # (nq, B, KP, QB) -> (B, nq, QB, KP) -> (B, N, KP)
    val = out_val.reshape(nq, B, KP, QB).transpose(1, 0, 3, 2)
    idx = out_idx.reshape(nq, B, KP, QB).transpose(1, 0, 3, 2)
    val = val.reshape(B, nq * QB, KP)
    idx = idx.reshape(B, nq * QB, KP).astype(jnp.int32)
    return val, idx


def make_pair_list(rel, num_pairs: int):
    """Flatten a relevance matrix into a padded, qid-sorted pair list.

    rel: (nq, nbt) bool (union over lanes).  Returns (qid (P,), tid (P,),
    overflow () int32).  Padding pairs: qid = nq, tid = nbt.
    """
    nq, nbt = rel.shape
    sentinel = jnp.int32(nq * nbt)
    flat = jnp.arange(nq * nbt, dtype=jnp.int32)
    keys = jnp.where(rel.reshape(-1), flat, sentinel)
    keys = jnp.sort(keys)
    if num_pairs > keys.shape[0]:
        keys = jnp.concatenate([keys, jnp.full(num_pairs - keys.shape[0],
                                               sentinel, jnp.int32)])
    keys = keys[:num_pairs]
    is_pad = keys >= sentinel
    qid = jnp.where(is_pad, nq, keys // nbt).astype(jnp.int32)
    tid = jnp.where(is_pad, nbt, keys % nbt).astype(jnp.int32)
    total = jnp.sum(rel.astype(jnp.int32))
    return qid, tid, jnp.maximum(total - num_pairs, 0)


def lane_relevance(slo, shi, Rs, ts, tlo, thi, radius):
    """Relevance matrix for a batch of poses via interval arithmetic.

    slo/shi: (nq, 3) source block bboxes (body frame); Rs (B, 3, 3),
    ts (B, 3); tlo/thi: (nbt, 3) target block bboxes.  Returns (nq, nbt)
    bool: any lane's transformed query bbox within ``radius``."""
    # transformed bbox: per output coord, sum of per-input-coord term
    # intervals (summing first and then taking min/max would under-cover)
    m = Rs[:, None, :, :] * slo[None, :, None, :]            # (B, nq, 3, 3)
    M = Rs[:, None, :, :] * shi[None, :, None, :]
    qlo = jnp.sum(jnp.minimum(m, M), axis=-1) + ts[:, None, :]
    qhi = jnp.sum(jnp.maximum(m, M), axis=-1) + ts[:, None, :]
    gap = jnp.maximum(0.0,
                      jnp.maximum(qlo[:, :, None, :] - thi[None, None, :, :],
                                  tlo[None, None, :, :] - qhi[:, :, None, :]))
    d2 = jnp.sum(gap * gap, axis=-1)                         # (B, nq, nbt)
    return jnp.any(d2 <= radius * radius, axis=0)
