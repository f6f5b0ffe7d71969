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
  per step, a loop over the B pose lanes transforms the source block with
  that lane's (R, t) (poses live in SMEM), computes the (128 targets x
  128 queries) coordinate-wise squared distances on the VPU, and merges
  them into the per-lane running 5-best lists held in VMEM scratch.

The merge is KEYS-ONLY: each candidate becomes ONE int32 key holding its
squared distance in fixed point (the high 31-IB bits, clamped just above
the search-radius gate) and its GLOBAL target index (the low IB bits).
Keys are globally unique, compare in distance order, and merging top-5
lists is 5 rounds of min / mask-the-winner -- no parallel index array, no
argmin, no scatter, no sort.  Index extraction is a bitwise AND after the
kernel.  The fixed-point step is clamp * 2^(IB-31) ABSOLUTE on the squared
distance (~4e-6 m^2 at radius 1 m, IB 13) -- far below point spacing, and
candidates beyond the clamp are rejected by the radius gate exactly as
they would be with exact distances; every residual downstream is
re-derived from exactly-gathered coordinates.

Padding pairs (qid == nq) and, when a ``lane_mask`` is given, (pair, lane)
combinations no lane needs, are skipped with ``pl.when`` -- the grid stays
static while the work tracks the ACTUAL spatial occupancy, which is what
lets the adaptive search radius (models/icp_batch.py) make late ICP
iterations cheap.

Compared against the reference's per-point KD-tree queries
(DCReg/src/icp_test_runner.cpp:1722) this is the TPU-native shape of the
same computation: the KD-tree's log-factor pruning becomes block-level bbox
culling, and the per-point scalar recursion becomes dense 128x128 VPU
tiles.
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
KP = 8      # padded k (sublane granularity); only the first k rows are live
K = 5       # neighbors actually maintained (params.corr.k)
BIG = 3.0e38
# Candidate-id width cap: ids take IB low key bits, the quantized squared
# distance the remaining 31-IB.  IB is computed per call from the actual
# candidate count, so ordinary scans keep 13-15 bits (quantization
# ~4e-6 m^2 at radius 1).  Sparse wide-FoV scans against dense maps can
# legitimately need >2^15 candidates per query block (a 20 m-wide query
# leaf meeting a 400 pts/m^2 map); up to 2^18 the distance step is still
# ~3e-5 m^2 -- far below point spacing, and every residual downstream is
# re-derived from exactly-gathered coordinates.
MAX_INDEX_BITS = 18


def _index_bits(num_cand: int) -> int:
    """Mantissa bits needed to pack candidate ids 0..num_cand-1.

    ``num_cand`` is the DIRECT-id range: (num target blocks + 1) * TB for
    small maps, or max_per_query * TB when the caller packs slot-local ids
    (the two-level scheme that lifts the map-size cap -- see
    ``batched_block_knn``'s ``slot``/``tid_table`` arguments)."""
    ib = max(1, int(np.ceil(np.log2(max(num_cand, 2)))))
    if ib > MAX_INDEX_BITS:
        raise ValueError(
            f"batched_block_knn packs at most 2^{MAX_INDEX_BITS} candidate "
            f"ids ({num_cand} requested); for map-scale targets pass the "
            "slot/tid_table pair from make_pair_list (max_per_query) so "
            "ids are slot-local; beyond that the scan is too sparse "
            "relative to the map -- split it or densify")
    return ib


INIT_KEY = np.int32(0x7FFFFFFF)


def _kernel(qid_ref, tid_ref, pid_ref, mask_ref, src_ref, tgt_ref, pose_ref,
            key_ref, run_key, *, n_lanes: int, nq: int, index_bits: int,
            scale: float, clamp: float, n_words: int = 1):
    p = pl.program_id(0)
    first = jnp.where(p == 0, True,
                      qid_ref[p] != qid_ref[jnp.maximum(p - 1, 0)])

    @pl.when(first)
    def _init():
        run_key[:] = jnp.full_like(run_key, INIT_KEY)

    @pl.when(qid_ref[p] < nq)
    def _body():
        src = src_ref[0]                       # (3, QB)
        # coordinate-major storage (3, TB) -> one small transpose per
        # step puts targets back in sublanes for the (TB, QB) tiles
        tgt = tgt_ref[0].T                     # (TB, 3)
        # candidate ids, packed into the low key bits: pid is the global
        # target block id (small maps) or the pair's slot within its query
        # block's run (two-level map-scale mode)
        gidx = (jax.lax.broadcasted_iota(jnp.int32, (TB, QB), 0)
                + pid_ref[p] * TB)

        def lane(b, _):
            def merge():
                # world-frame queries for lane b: q = R_b p + t_b (SMEM)
                d = jnp.zeros((TB, QB), jnp.float32)
                for c in range(3):
                    q = (pose_ref[b, 3 * c + 0] * src[0:1, :] +
                         pose_ref[b, 3 * c + 1] * src[1:2, :] +
                         pose_ref[b, 3 * c + 2] * src[2:3, :] +
                         pose_ref[b, 9 + c])                 # (1, QB)
                    diff = tgt[:, c:c + 1] - q
                    d = d + diff * diff
                dq = (jnp.minimum(d, clamp) * scale).astype(jnp.int32)
                cand = jnp.bitwise_or(
                    jax.lax.shift_left(dq, jnp.int32(index_bits)),
                    gidx)                                      # (TB, QB)

                prev = run_key[pl.ds(b * KP, KP), :]           # (KP, QB)
                rows = []
                for _ in range(K):
                    m = jnp.minimum(jnp.min(cand, axis=0, keepdims=True),
                                    jnp.min(prev, axis=0, keepdims=True))
                    rows.append(m)
                    cand = jnp.where(cand == m, INIT_KEY, cand)
                    prev = jnp.where(prev == m, INIT_KEY, prev)
                pad = jnp.full((KP - K, QB), INIT_KEY, jnp.int32)
                run_key[pl.ds(b * KP, KP), :] = jnp.concatenate(
                    rows + [pad], axis=0)

            if mask_ref is None:
                merge()
            else:
                # mask is FLAT (P * n_words,): a 2-D SMEM array would be
                # lane-padded to (P, 128) and blow the ~1 MB SMEM budget
                # for map-scale pair lists
                word = mask_ref[p * n_words + b // 32]
                pl.when(((word >> (b % 32)) & 1) != 0)(merge)
            return 0

        jax.lax.fori_loop(0, n_lanes, lane, 0, unroll=False)

    key_ref[0] = run_key[:]


@functools.partial(jax.jit,
                   static_argnames=("num_pairs", "radius", "layout",
                                    "interpret", "max_per_query"))
def batched_block_knn(index: BlockIndex, src_blocks, poses, qid, tid,
                      num_pairs: int, radius: float = 1.0, covered=None,
                      lane_mask=None, layout: str = "nk",
                      interpret: bool = False, slot=None, tid_table=None,
                      max_per_query: int = 0):
    """All-lane 5-NN for one ICP iteration.

    index: BlockIndex with TB=128 blocks;
    src_blocks: (nq, 3, QB) Morton-sorted source, blocked and transposed;
    poses: (B, 12) rows [R row-major (9), t (3)];
    qid/tid: (P,) int32 pair list sorted by qid -- padding pairs carry
    qid = nq (skipped, flushed to a trash output row) and tid = nbt;
    radius: search radius (static) -- squared distances are exact up to
    the fixed-point step below ~1.1*radius^2 and clamped above it (the
    correspondence gate rejects those regardless);
    covered: optional (nq,) bool, True where the query block appears in at
    least one pair.  The kernel only writes pair-listed output rows, so
    rows of uncovered blocks hold uninitialized device memory -- when
    ``covered`` is given those rows are post-masked to (BIG, -1);
    lane_mask: optional (P, ceil(B/32)) int32 per-lane relevance bit words
    (see ``pack_lane_mask``); lanes whose bit is 0 skip the pair entirely;
    slot/tid_table/max_per_query: two-level MAP-SCALE id mode.  ``slot``
    (P,) int32 is each pair's rank within its query block's run (< the
    static ``max_per_query``); ``tid_table`` (nq, max_per_query) int32
    maps (query block, slot) back to the global target block.  Candidate
    keys then pack slot-local ids (max_per_query * TB of them) instead of
    global ones, so the packed-id range -- and hence the distance
    quantization -- is INDEPENDENT of the map size: any number of target
    blocks is supported (the old hard cap was 2^15 global candidate ids).
    All three must be given together (see ``make_pair_list`` with
    ``max_per_query``).

    Returns (sq_dists ascending, idx int32 into the sorted target, -1
    where missing); rows K..KP-1 are BIG/-1.  ``layout`` picks the output
    shape: "nk" -> (B, nq*QB, KP) (AoS, needs a lane<->sublane transpose);
    "kn" -> (B, KP, nq*QB) (SoA, minor dim preserved -- free; feeds
    ops/soa_tail.batched_tail_system).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    src_blocks = src_blocks.astype(jnp.float32)
    poses = poses.astype(jnp.float32)
    nq = src_blocks.shape[0]
    B = poses.shape[0]
    nbt = index.num_blocks
    slotted = tid_table is not None
    if slotted:
        assert slot is not None and max_per_query > 0
        ib = _index_bits(max_per_query * TB)
        pid = slot
    else:
        ib = _index_bits((nbt + 1) * TB)
        pid = tid
    imask = (1 << ib) - 1
    vmax = (1 << (31 - ib)) - 1
    clamp = 1.1 * float(radius) ** 2
    scale = (vmax - 1) / clamp

    # index.blocks already carries sentinel coords at padding slots and a
    # trailing all-sentinel block (for padding pairs) -- no per-call remask
    # or copy of the (potentially multi-GB) map array
    tgt = index.blocks.astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((1, 3, QB),
                     lambda p, qv, tv, *_: (jnp.minimum(qv[p], nq - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, TB), lambda p, qv, tv, *_: (tv[p], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    num_prefetch = 3
    operands = [qid, tid, pid, src_blocks, tgt, poses]
    n_words = 1
    if lane_mask is not None:
        num_prefetch = 4
        n_words = lane_mask.shape[1]
        operands = [qid, tid, pid, lane_mask.reshape(-1), src_blocks, tgt,
                    poses]

        def _tgt_index(p, qv, tv, mv, nw=n_words, sentinel=nbt):
            # fully-masked pairs fetch the SENTINEL block instead of
            # their real target: consecutive dead steps then repeat the
            # same index and the pipeline skips the re-fetch (the
            # adaptive live mask kills most pairs after iteration 0 --
            # their compute is already skipped, this skips the DMA too)
            live = mv[p * nw]
            for i in range(1, nw):
                live = live | mv[p * nw + i]
            return (jnp.where(live != 0, tv[p], sentinel), 0, 0)

        in_specs[1] = pl.BlockSpec((1, 3, TB),
                                   lambda p, qv, tv, pv, mv:
                                   _tgt_index(p, qv, tv, mv),
                                   memory_space=pltpu.VMEM)

    kw = dict(n_lanes=B, nq=nq, index_bits=ib, scale=scale, clamp=clamp,
              n_words=n_words)

    def make_kernel(with_mask):
        if with_mask:
            return functools.partial(_kernel, **kw)
        return functools.partial(
            lambda q, t, pi, s, g, po, k, r, **kw2:
                _kernel(q, t, pi, None, s, g, po, k, r, **kw2),
            **kw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(num_pairs,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, B * KP, QB),
                         lambda p, qv, tv, *_: (qv[p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B * KP, QB), jnp.int32),
        ],
    )
    (out_key,) = pl.pallas_call(
        make_kernel(lane_mask is not None),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq + 1, B * KP, QB), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=num_pairs * B * TB * QB * 18,
            bytes_accessed=num_pairs * (TB * 3 + 3 * QB) * 4
            + (nq + 1) * B * KP * QB * 4,
            transcendentals=0),
        interpret=interpret,
    )(*operands)

    out_key = out_key[:nq]
    missing = out_key >= (vmax << ib)
    if slotted:
        # two-level decode: slot-local id -> (slot, offset) -> global id
        # via the (nq, max_per_query) slot->target-block table
        local = jnp.bitwise_and(out_key, imask)              # (nq, B*KP, QB)
        s_of = jnp.where(missing, 0, local // TB)
        off = local % TB
        t_of = jnp.take_along_axis(
            tid_table, s_of.reshape(nq, -1), axis=1).reshape(s_of.shape)
        out_idx = jnp.where(missing, -1,
                            jnp.minimum(t_of * TB + off,
                                        index.num_points - 1))
    else:
        out_idx = jnp.where(missing, -1,
                            jnp.minimum(jnp.bitwise_and(out_key, imask),
                                        index.num_points - 1))
    out_val = jnp.where(
        missing, BIG,
        jax.lax.shift_right_logical(out_key, jnp.int32(ib))
        .astype(jnp.float32)
        * jnp.float32(1.0 / scale))
    if covered is not None:
        cov = covered.reshape(nq, 1, 1)
        out_val = jnp.where(cov, out_val, BIG)
        out_idx = jnp.where(cov, out_idx, -1)
    out_val = out_val.reshape(nq, B, KP, QB)
    out_idx = out_idx.reshape(nq, B, KP, QB)
    if layout == "kn":
        # (nq, B, KP, QB) -> (B, KP, nq, QB) -> (B, KP, N): QB stays minor
        val = out_val.transpose(1, 2, 0, 3).reshape(B, KP, nq * QB)
        idx = out_idx.transpose(1, 2, 0, 3).reshape(B, KP, nq * QB)
        return val, idx
    # (nq, B, KP, QB) -> (B, nq, QB, KP) -> (B, N, KP)
    val = out_val.transpose(1, 0, 3, 2).reshape(B, nq * QB, KP)
    idx = out_idx.transpose(1, 0, 3, 2).reshape(B, nq * QB, KP)
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


def make_pair_list_slotted(rel, num_pairs: int, max_per_query: int,
                           block_ids=None, nbt=None):
    """Slotted pair list for the two-level (map-scale) kernel mode.

    rel: (nq, C) bool relevance over CANDIDATE COLUMNS -- either the full
    target-block axis (C == nbt, block_ids None) or a per-query-block
    gathered candidate set (block_ids (nq, C) int32 gives each column's
    global target block; see ``hier_relevance``).  ``nbt`` is the global
    target block count (defaults to C).

    Returns (qid, tid, slot, col, tid_table, overflow, run_overflow):
      qid/tid (P,) as in ``make_pair_list`` (padding qid=nq, tid=nbt);
      slot (P,) rank of the pair within its query block's run, always
      < max_per_query (pairs beyond that are dropped and counted in
      run_overflow -- size max_per_query via the host estimators so this
      stays 0);
      col (P,) the pair's candidate column (0 for padding);
      tid_table (nq, max_per_query) slot -> global target block.
    """
    nq, C = rel.shape
    if nbt is None:
        nbt = C
    G = max_per_query
    total = jnp.sum(rel.astype(jnp.int32))

    # stage 1: ROW-WISE compaction -- a batch of nq independent length-C
    # sorts is far shallower (and parallel) than one global nq*C sort,
    # and it directly yields the per-run slots and the slot table with
    # no scatter (TPU scatters serialize; measured slower)
    colkey = jnp.where(rel,
                       jax.lax.broadcasted_iota(jnp.int32, (nq, C), 1),
                       jnp.int32(C))
    cols = jnp.sort(colkey, axis=1)[:, :G]                   # (nq, G)
    valid = cols < C
    cols_c = jnp.where(valid, cols, 0)
    if block_ids is None:
        tidm = cols_c
    else:
        tidm = jnp.take_along_axis(block_ids.astype(jnp.int32),
                                   cols_c, axis=1)
    tbl = jnp.where(valid, tidm, 0)                          # (nq, G)
    run_overflow = total - jnp.sum(valid.astype(jnp.int32))

    # stage 2: tiny global compaction of the (nq, G) grid into P slots;
    # ascending flat index == (qid, slot) lexicographic -> runs stay
    # contiguous and qid-sorted
    sentinel = jnp.int32(nq * G)
    flat = jnp.arange(nq * G, dtype=jnp.int32)
    keys = jnp.where(valid.reshape(-1), flat, sentinel)
    keys = jnp.sort(keys)
    if num_pairs > keys.shape[0]:
        keys = jnp.concatenate([keys, jnp.full(num_pairs - keys.shape[0],
                                               sentinel, jnp.int32)])
    keys = keys[:num_pairs]
    is_pad = keys >= sentinel
    keys_c = jnp.minimum(keys, sentinel - 1)
    qid = jnp.where(is_pad, nq, keys_c // G).astype(jnp.int32)
    slot = jnp.where(is_pad, 0, keys_c % G).astype(jnp.int32)
    col = jnp.where(is_pad, 0, cols_c.reshape(-1)[keys_c])
    tid = jnp.where(is_pad, nbt, tidm.reshape(-1)[keys_c])

    kept = jnp.sum(valid.astype(jnp.int32))
    overflow = jnp.maximum(kept - num_pairs, 0)
    return qid, tid, slot, col, tbl, overflow, run_overflow


def exact_qbox(src_q, Rs, ts):
    """Per-lane, per-query-block bboxes of the TRANSFORMED points.

    src_q: (nq, QB, 3) body-frame blocked source; Rs (B, 3, 3), ts
    (B, 3).  Returns (qlo, qhi) each (B, nq, 3).  Transforming the
    points costs B*N*9 flops (the kernel re-transforms them anyway) and
    gives TIGHT boxes; the interval-arithmetic rotation of the body
    bbox is up to ~sqrt(2) fatter per axis at 45-degree yaw, which
    showed up as ~35% more relevant pairs at map scale.  Exactness of
    the cull is unchanged (any target within r of a query point is
    within r of the tight bbox)."""
    pw = jnp.einsum("qpj,bij->bqpi", src_q.astype(jnp.float32),
                    Rs.astype(jnp.float32)) \
        + ts.astype(jnp.float32)[:, None, None, :]
    return pw.min(axis=2), pw.max(axis=2)


def super_candidates(slo, shi, Rs, ts, mindex, r_cull, num_supers: int,
                     active=None, qbox=None):
    """Per-query-block nearest relevant SUPER-blocks (level-1 cull).

    slo/shi: (nq, 3) body-frame source block bboxes; Rs (B, 3, 3), ts
    (B, 3); r_cull as in ``lane_relevance``; active: optional (B,) bool
    lane mask; qbox: optional precomputed exact (qlo, qhi) from
    ``exact_qbox`` (falls back to conservative interval arithmetic).
    Returns (sup_sel (nq, S) int32, sup_ok (nq, S) bool,
    sup_overflow () int32 = #query blocks whose relevant-super count
    exceeded S)."""
    # one gap computation serves both the relevance test and the
    # nearest-S ranking
    if qbox is not None:
        qlo, qhi = qbox
    else:
        m = Rs[:, None, :, :] * slo[None, :, None, :]
        M = Rs[:, None, :, :] * shi[None, :, None, :]
        qlo = jnp.sum(jnp.minimum(m, M), axis=-1) + ts[:, None, :]
        qhi = jnp.sum(jnp.maximum(m, M), axis=-1) + ts[:, None, :]
    gap = jnp.maximum(0.0,
                      jnp.maximum(qlo[:, :, None, :] - mindex.sup_hi,
                                  mindex.sup_lo - qhi[:, :, None, :]))
    d2_l = jnp.sum(gap * gap, axis=-1)                       # (B, nq, ns)
    r = jnp.asarray(r_cull)
    if r.ndim == 1:
        r = r[:, None, None]
    elif r.ndim == 2:
        r = r[:, :, None]
    rel = d2_l <= r * r
    if active is not None:
        rel = rel & active[:, None, None]
    d2 = jnp.min(d2_l, axis=0)                               # (nq, ns)
    any_rel = jnp.any(rel, axis=0)                           # (nq, ns)
    n_rel = jnp.sum(any_rel.astype(jnp.int32), axis=1)
    S = min(num_supers, mindex.num_supers)
    score = jnp.where(any_rel, d2, jnp.inf)
    neg, sup_sel = jax.lax.top_k(-score, S)
    sup_ok = jnp.isfinite(-neg)
    sup_sel = jnp.where(sup_ok, sup_sel, 0).astype(jnp.int32)
    return sup_sel, sup_ok, jnp.sum((n_rel > S).astype(jnp.int32))


def hier_relevance(slo, shi, Rs, ts, mindex, sup_sel, sup_ok, r_cull,
                   qbox=None):
    """Level-0 cull restricted to the selected supers' blocks.

    Returns (rel_l (B, nq, C) bool with C = S*sb, block_ids (nq, C)
    int32 global target-block per column).  Columns of invalid blocks
    (beyond the map or an unselected super slot) are False."""
    nq = slo.shape[0]
    S = sup_sel.shape[1]
    sb = mindex.sb
    bi = mindex.block
    block_ids = (sup_sel[:, :, None] * sb
                 + jnp.arange(sb, dtype=jnp.int32)).reshape(nq, S * sb)
    in_map = (block_ids < bi.num_blocks) & \
        jnp.repeat(sup_ok, sb, axis=1)
    safe_ids = jnp.where(in_map, block_ids, 0)
    # ONE contiguous (sb*3,) slab gather per selected super (padding
    # rows are inf/-inf -> infinite gap, masked by in_map anyway);
    # per-row gathers from the (nbt, 3) arrays were the dominant
    # one-time cull cost at map scale (0.93 ms at 50M points)
    blo = mindex.blk_lo_g[sup_sel].reshape(nq, S * sb, 3)
    bhi = mindex.blk_hi_g[sup_sel].reshape(nq, S * sb, 3)

    if qbox is not None:
        qlo, qhi = qbox
    else:
        m = Rs[:, None, :, :] * slo[None, :, None, :]
        M = Rs[:, None, :, :] * shi[None, :, None, :]
        qlo = jnp.sum(jnp.minimum(m, M), axis=-1) + ts[:, None, :]
        qhi = jnp.sum(jnp.maximum(m, M), axis=-1) + ts[:, None, :]
    gap = jnp.maximum(0.0,
                      jnp.maximum(qlo[:, :, None, :] - bhi[None, :, :, :],
                                  blo[None, :, :, :] - qhi[:, :, None, :]))
    d2 = jnp.sum(gap * gap, axis=-1)                         # (B, nq, C)
    r = jnp.asarray(r_cull)
    if r.ndim == 1:
        r = r[:, None, None]
    elif r.ndim == 2:
        r = r[:, :, None]
    rel = (d2 <= r * r) & in_map[None, :, :]
    return rel, safe_ids


def pack_lane_mask(rel_lanes, qid, tid):
    """Per-pair lane-relevance bit words for the kernel's lane skip.

    rel_lanes: (B, nq, nbt) bool per-lane relevance; qid/tid: (P,) pair
    list (padding pairs qid=nq/tid=nbt get word 0).  Returns
    (P, ceil(B/32)) int32."""
    B, nq, nbt = rel_lanes.shape
    W = -(-B // 32)
    lanes = jnp.arange(B, dtype=jnp.int32)
    shifted = jnp.where(
        rel_lanes, jnp.int32(1) << (lanes % 32)[:, None, None], 0)
    words = jnp.zeros((W, nq, nbt), jnp.int32)
    words = words.at[lanes // 32].add(shifted)        # OR via add: bits unique
    pad = qid >= nq
    q = jnp.where(pad, 0, qid)
    t = jnp.where(pad, 0, tid)
    out = words[:, q, t].T                            # (P, W)
    return jnp.where(pad[:, None], 0, out)


def lane_relevance(slo, shi, Rs, ts, tlo, thi, radius, per_lane=False,
                   qbox=None):
    """Relevance matrix for a batch of poses via interval arithmetic.

    slo/shi: (nq, 3) source block bboxes (body frame); Rs (B, 3, 3),
    ts (B, 3); tlo/thi: (nbt, 3) target block bboxes.  ``radius`` is a
    scalar, a per-lane (B,) array, or a per-(lane, query-block) (B, nq)
    array (the adaptive-culling path, models/icp_batch.py).  Returns
    (nq, nbt) bool (any lane within ``radius``), or the per-lane
    (B, nq, nbt) bool when ``per_lane``."""
    # transformed bbox: per output coord, sum of per-input-coord term
    # intervals (summing first and then taking min/max would under-cover);
    # a precomputed exact_qbox replaces the conservative interval form
    if qbox is not None:
        qlo, qhi = qbox
    else:
        m = Rs[:, None, :, :] * slo[None, :, None, :]        # (B, nq, 3, 3)
        M = Rs[:, None, :, :] * shi[None, :, None, :]
        qlo = jnp.sum(jnp.minimum(m, M), axis=-1) + ts[:, None, :]
        qhi = jnp.sum(jnp.maximum(m, M), axis=-1) + ts[:, None, :]
    gap = jnp.maximum(0.0,
                      jnp.maximum(qlo[:, :, None, :] - thi[None, None, :, :],
                                  tlo[None, None, :, :] - qhi[:, :, None, :]))
    d2 = jnp.sum(gap * gap, axis=-1)                         # (B, nq, nbt)
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None, None]
    elif r.ndim == 2:
        r = r[:, :, None]
    rel = d2 <= r * r
    return rel if per_lane else jnp.any(rel, axis=0)
