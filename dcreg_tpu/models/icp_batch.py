"""Batched Monte-Carlo ICP engine: all pose lanes advance in ONE program.

The reference's statistics mode reruns the engine ``num_runs`` times
sequentially (icp_test_runner.cpp:331-466).  ``vmap`` over the single-lane
engine already parallelizes that, but it leaves the correspondence search
as B independent scans.  This engine instead drives the batched ragged
block-sparse kernel (ops/pallas_block_knn.py): per iteration ONE pair list
is built from the union of every lane's relevant (query block, target
block) interactions and ONE kernel call answers all lanes' 5-NN queries --
the dominant cost becomes proportional to the mean spatial neighborhood
occupancy instead of B x O(N*M).

Everything downstream of the search (plane fits, GN assembly, Schur
analysis, PCG solve, boxplus, convergence) is the single-lane math vmapped
over lanes; per-lane early exit matches ``vmap(while_loop)`` semantics
exactly (lanes freeze once converged/aborted, the loop runs until all are
done).  Telemetry reconstruction reuses models/icp.telemetry_row.

Requirements: source/target MUST be Morton-sorted (ops/block_sparse.
morton_argsort) and the BlockIndex built with tb=128 over the sorted
target.  f32 only (the kernel path); use the single-lane engine for f64.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from ..ops.block_sparse import BlockIndex, MapIndex
from ..ops.degeneracy import DetectionMethod, HandlingMethod, analyze
from ..ops.soa_tail import batched_tail_system
from ..ops.pallas_block_knn import (QB, batched_block_knn, exact_qbox,
                                    hier_relevance, lane_relevance,
                                    make_pair_list, make_pair_list_slotted,
                                    pack_lane_mask, super_candidates)
from ..ops.solvers import solve
from ..utils import precise
from .icp import (ICPParams, ICPResult, Hist, empty_hist, _empty_log,
                  covariance_from_H, telemetry_row)


class BatchICPResult(NamedTuple):
    R: jax.Array            # (B, 3, 3)
    t: jax.Array            # (B, 3)
    converged: jax.Array    # (B,)
    aborted: jax.Array      # (B,)
    iterations: jax.Array   # (B,) int32
    covariance: jax.Array   # (B, 6, 6)
    log: object             # IterationLog with (B, I, ...) leaves
    pair_overflow: jax.Array  # () int32: max dropped pairs over iterations
    H_last: jax.Array       # (B, 6, 6) final-iteration GN Hessian (for
    #   downstream degeneracy telemetry without full_telemetry)
    rmse: jax.Array         # (B,) final-iteration weighted residual RMSE
    fitness: jax.Array      # (B,) final-iteration in-radius fraction
    num_valid: jax.Array    # (B,) int32 final-iteration effective points


@functools.partial(jax.jit, static_argnames=("detection", "handling",
                                             "params", "num_pairs",
                                             "num_supers", "max_per_query",
                                             "reuse_pair_list"))
@precise
def icp_batch_so3(source_xyz, target_xyz, R0s, t0s,
                  detection: DetectionMethod, handling: HandlingMethod,
                  params: ICPParams, index,
                  num_pairs: int, T_gt=None, num_supers: int = 0,
                  max_per_query: int = 0,
                  initial_cull_radius=None,
                  reuse_pair_list: float = 0.0) -> BatchICPResult:
    """Run B registrations of one (source, target) pair to convergence.

    source_xyz (N, 3) Morton-sorted body-frame points; target_xyz (M, 3)
    the SAME Morton-sorted cloud the index was built over; R0s (B, 3, 3),
    t0s (B, 3) initial poses; num_pairs: static pair-list capacity (see
    block_sparse.suggest_num_blocks-style host estimation; overflow is
    reported, not silently truncated).

    ``index`` is a BlockIndex for in-chip targets, or a two-level
    ``MapIndex`` for MAP-SCALE targets (millions+ of points -- the
    reference's scan-to-map regime, supp.pdf Tables II/III).  Map mode
    additionally needs the static capacities ``num_supers`` (level-1 cull
    width) and ``max_per_query`` (target blocks per query block fed to
    the slotted kernel); see ``estimate_map_capacities``.

    ``initial_cull_radius``: optional iteration-0 block-cull radius
    (defaults to the full correspondence search radius).  EXACT whenever
    it upper-bounds every query's initial 5th-NN distance -- e.g.
    d5(converged) + initial pose error bound, the same rigid-motion
    argument the adaptive cull uses between iterations.  This is what
    keeps the candidate set small when a scan meets a much denser map
    (the correspondence radius gate downstream is unchanged).

    ``reuse_pair_list`` (map mode, B=1 only): when > 0, the block cull
    and pair list run ONCE at the initial pose with radius
    initial_cull_radius + reuse_pair_list and are reused by every
    iteration.  Exact while 2x the accumulated pose motion stays within
    the margin (a block relevant at iteration k is within
    d5_k <= d5_0 + move of the current query bbox, which is within
    d5_0 + 2*move of the initial one); the guard is checked in-jit and
    a breach is reported through ``pair_overflow``.
    """
    map_mode = isinstance(index, MapIndex)
    mindex = index if map_mode else None
    bi = index.block if map_mode else index
    if map_mode:
        assert num_supers > 0 and max_per_query > 0
    reuse = map_mode and reuse_pair_list > 0 and R0s.shape[0] == 1
    dtype = source_xyz.dtype
    B = R0s.shape[0]
    N = source_xyz.shape[0]
    I = params.max_iterations
    k = params.corr.k
    radius = params.corr.search_radius
    if T_gt is None:
        T_gt = jnp.eye(4, dtype=dtype)
    fast = (detection is DetectionMethod.SCHUR_CONDITION_NUMBER and
            handling is HandlingMethod.PRECONDITIONED_CG)

    # ---- static query-block prep (body frame) ----------------------------
    nq = -(-N // QB)
    src_pad = jnp.concatenate(
        [source_xyz, jnp.broadcast_to(source_xyz[-1:], (nq * QB - N, 3))])
    src_q = src_pad.reshape(nq, QB, 3)
    src_blocks = src_q.transpose(0, 2, 1)                    # (nq, 3, QB)
    slo = jnp.min(src_q, axis=1)
    shi = jnp.max(src_q, axis=1)

    # adaptive-culling exactness bound: a source point moves at most
    # |dw|*pmax + |dv| between iterations (right boxplus), so last
    # iteration's per-(lane, query-block) 5th-NN distance plus that motion
    # bounds this iteration's 5th-NN distance -- blocks can be culled at
    # that radius EXACTLY (every true 5-NN and the radius gate unchanged)
    pmax = jnp.sqrt(jnp.max(jnp.sum(source_xyz * source_xyz, axis=1)))

    if reuse:
        # one-time cull + pair list at the initial pose, inflated radius,
        # EXACT transformed-point bboxes (tight, not interval arithmetic)
        r0v = radius if initial_cull_radius is None else initial_cull_radius
        r_list = jnp.float32(r0v) + jnp.float32(reuse_pair_list)
        qbox0 = exact_qbox(src_q, R0s, t0s)
        sup_sel0, sup_ok0, sup_ovf0 = super_candidates(
            slo, shi, R0s.astype(jnp.float32), t0s.astype(jnp.float32),
            mindex, r_list, num_supers, qbox=qbox0)
        rel_l0, block_ids0 = hier_relevance(
            slo, shi, R0s.astype(jnp.float32), t0s.astype(jnp.float32),
            mindex, sup_sel0, sup_ok0, r_list, qbox=qbox0)
        rel0 = jnp.any(rel_l0, axis=0)
        qid0, tid0, slot0, col0, table0, ovf0, run_ovf0 = \
            make_pair_list_slotted(rel0, num_pairs, max_per_query,
                                   block_ids=block_ids0, nbt=bi.num_blocks)
        static_overflow = ovf0 + run_ovf0 + sup_ovf0
        covered0 = jnp.any(rel0, axis=1)
        # static per-pair target bboxes for the per-iteration LIVE mask:
        # the list is built once at r0 + margin, but iteration k only
        # needs pairs within its adaptive radius r_cull (d5 + motion
        # bound) -- the same exactness argument as the per-iteration
        # cull, evaluated on the static list.  Padding pairs get a huge
        # gap (never live; the kernel skips them by qid anyway).
        pad0 = qid0 >= nq
        tid_safe0 = jnp.where(pad0, 0, tid0)
        p_tlo0 = jnp.where(pad0[:, None], jnp.float32(3e38),
                           bi.lo[tid_safe0].astype(jnp.float32))
        p_thi0 = jnp.where(pad0[:, None], jnp.float32(-3e38),
                           bi.hi[tid_safe0].astype(jnp.float32))
        qid_safe0 = jnp.where(pad0, 0, qid0)

    def one_iteration(Rs, ts, r_cull, active):
        knn_kwargs = {}
        if reuse:
            qid, tid = qid0, tid0
            overflow = jnp.asarray(0, jnp.int32)   # reported once at init
            covered = covered0
            knn_kwargs = dict(slot=slot0, tid_table=table0,
                              max_per_query=max_per_query)
            # LIVE mask: this iteration only needs pairs whose bbox gap
            # at the CURRENT pose is within the adaptive exact radius
            # r_cull (d5 + rigid-motion bound) -- the static list covers
            # r0 + margin, so later (tight-radius) iterations skip most
            # of the kernel's compute steps
            qlo_b, qhi_b = exact_qbox(src_q, Rs, ts)
            qlo, qhi = qlo_b[0], qhi_b[0]
            gap = jnp.maximum(0.0,
                              jnp.maximum(qlo[qid_safe0] - p_thi0,
                                          p_tlo0 - qhi[qid_safe0]))
            d2p = jnp.sum(gap * gap, axis=-1)                # (P,)
            rq = r_cull[0, qid_safe0]
            live = (d2p <= rq * rq) & ~pad0
            lmask = live.astype(jnp.int32)[:, None]          # (P, 1)
        elif map_mode:
            # level-1 cull: nearest relevant supers per query block, then
            # level-0 cull over only their blocks -- no (nq, nbt) matrix
            qbox_i = exact_qbox(src_q, Rs, ts)
            sup_sel, sup_ok, sup_ovf = super_candidates(
                slo, shi, Rs, ts, mindex, r_cull, num_supers, active=active,
                qbox=qbox_i)
            rel_l, block_ids = hier_relevance(slo, shi, Rs, ts, mindex,
                                              sup_sel, sup_ok, r_cull,
                                              qbox=qbox_i)
            rel_l = rel_l & active[:, None, None]            # (B, nq, C)
            rel = jnp.any(rel_l, axis=0)
            qid, tid, slot, col, table, ovf, run_ovf = make_pair_list_slotted(
                rel, num_pairs, max_per_query, block_ids=block_ids,
                nbt=bi.num_blocks)
            overflow = ovf + run_ovf + sup_ovf
            # B=1 (odometry frame chains): every listed pair belongs to
            # the only lane -- skip the mask scatter/gather entirely
            lmask = pack_lane_mask(rel_l, qid, col) if B > 1 else None
            covered = jnp.any(rel, axis=1)
            knn_kwargs = dict(slot=slot, tid_table=table,
                              max_per_query=max_per_query)
        else:
            rel_l = lane_relevance(slo, shi, Rs, ts, bi.lo, bi.hi,
                                   r_cull, per_lane=True,
                                   qbox=exact_qbox(src_q, Rs, ts))
            rel_l = rel_l & active[:, None, None]
            rel = jnp.any(rel_l, axis=0)
            qid, tid, overflow = make_pair_list(rel, num_pairs)
            lmask = pack_lane_mask(rel_l, qid, tid) if B > 1 else None
            covered = jnp.any(rel, axis=1)
        poses12 = jnp.concatenate([Rs.reshape(B, 9), ts], axis=1)
        vals, idx = batched_block_knn(bi, src_blocks,
                                      poses12.astype(jnp.float32),
                                      qid, tid, num_pairs, radius=radius,
                                      covered=covered,
                                      lane_mask=lmask, layout="kn",
                                      **knn_kwargs)
        # exact 5th-NN distance per (lane, query block); BIG where a block
        # was uncovered -> falls back to the full radius below
        d5row = vals[:, k - 1, :]                            # (B, nq*QB)
        d5bm = jnp.sqrt(jnp.max(d5row.reshape(B, nq, QB), axis=2))
        sysm = batched_tail_system(
            source_xyz, target_xyz, Rs, ts,
            sq_d5=d5row[:, :N].astype(dtype), idx_kn=idx[:, :k, :N],
            params=params.corr,
            use_weight_derivative=params.use_weight_derivative,
            weight_slope=params.corr.weight_slope)

        def lane_solve(H, g, num_valid):
            analysis = analyze(H, detection, params.thresholds, fast=fast)
            dx, _ = solve(H, g, handling, analysis, params.thresholds,
                          telemetry=False, fast=fast)
            too_few = num_valid < params.min_effective_points
            bad_dx = ~jnp.all(jnp.isfinite(dx))
            abort_now = too_few | bad_dx
            dx = jnp.where(abort_now, jnp.zeros_like(dx), dx)
            return dx, abort_now

        dx, abort_now = jax.vmap(lane_solve)(sysm.H, sysm.g, sysm.num_valid)
        return sysm, dx, abort_now, overflow, d5bm

    # ---- pass 1: the joint optimization loop -----------------------------
    def body(state):
        it, Rs, ts, conv, abt, iters, hist, ovf, r_cull, cum_move = state
        active = ~(conv | abt)
        sysm, dx, abort_now, overflow, d5bm = \
            one_iteration(Rs, ts, r_cull, active)
        abort_now = abort_now & active
        # record pre-update state for active lanes
        put = lambda dst, val: dst.at[:, it].set(
            jnp.where(jnp.reshape(active, (B,) + (1,) * (val.ndim - 1)),
                      val, dst[:, it]))
        if params.full_telemetry:
            hist = Hist(R=put(hist.R, Rs), t=put(hist.t, ts),
                        H=put(hist.H, sysm.H), g=put(hist.g, sysm.g),
                        dx=put(hist.dx, dx),
                        num_valid=put(hist.num_valid,
                                      sysm.num_valid.astype(jnp.int32)),
                        rmse=put(hist.rmse, sysm.rmse),
                        fitness=put(hist.fitness, sysm.fitness),
                        objective=put(hist.objective, sysm.objective))
        else:
            # speed runs consume only H (final covariance) and the
            # scalar fit summaries; skip the other history writes
            hist = hist._replace(
                H=put(hist.H, sysm.H), rmse=put(hist.rmse, sysm.rmse),
                fitness=put(hist.fitness, sysm.fitness),
                num_valid=put(hist.num_valid,
                              sysm.num_valid.astype(jnp.int32)))
        Rn, tn = jax.vmap(se3.boxplus)(Rs, ts, dx)
        upd = active & ~abort_now
        Rs = jnp.where(upd[:, None, None], Rn, Rs)
        ts = jnp.where(upd[:, None], tn, ts)
        step_conv = (jnp.linalg.norm(dx[:, :3], axis=1)
                     < params.convergence_thresh_rot) & \
                    (jnp.linalg.norm(dx[:, 3:], axis=1)
                     < params.convergence_thresh_trans) & ~abort_now
        conv = conv | (active & step_conv)
        abt = abt | abort_now
        iters = jnp.where(active, it + 1, iters)
        # next iteration's exact cull radius (margins: motion bound slack
        # + fixed-point quantization of d5)
        move = (jnp.linalg.norm(dx[:, :3], axis=1) * pmax
                + jnp.linalg.norm(dx[:, 3:], axis=1))
        r_new = jnp.minimum(jnp.float32(radius),
                            d5bm + (1.05 * move + 0.01)[:, None])
        r_cull = jnp.where(active[:, None], r_new, r_cull)
        cum_move = cum_move + jnp.where(active, move, 0.0)
        return (it + 1, Rs, ts, conv, abt, iters, hist,
                jnp.maximum(ovf, overflow.astype(jnp.int32)), r_cull,
                cum_move)

    def cond(state):
        it, Rs, ts, conv, abt = state[:5]
        return (it < I) & ~jnp.all(conv | abt)

    r0 = radius if initial_cull_radius is None else initial_cull_radius
    ovf_init = static_overflow if reuse else jnp.asarray(0, jnp.int32)
    state0 = (jnp.asarray(0, jnp.int32), R0s.astype(dtype),
              t0s.astype(dtype), jnp.zeros(B, bool), jnp.zeros(B, bool),
              jnp.zeros(B, jnp.int32), empty_hist(I, dtype, lead=(B,)),
              ovf_init.astype(jnp.int32),
              jnp.full((B, nq), jnp.float32(r0), jnp.float32),
              jnp.zeros(B, jnp.float32))
    it, Rs, ts, conv, abt, iters, hist, ovf, _, cum_move = \
        jax.lax.while_loop(cond, body, state0)
    if reuse:
        # exactness guard: the static list covers iteration k only while
        # 2x the accumulated motion stays inside the margin
        breach = jnp.sum((2.0 * cum_move
                          > jnp.float32(reuse_pair_list)).astype(jnp.int32))
        ovf = ovf + breach

    last = jnp.maximum(iters - 1, 0)
    H_last = hist.H[jnp.arange(B), last]
    lane_ix = jnp.arange(B)
    rmse_last = hist.rmse[lane_ix, last]
    fitness_last = hist.fitness[lane_ix, last]
    nvalid_last = hist.num_valid[lane_ix, last]

    # ---- pass 2: telemetry reconstruction (B x I batched) ----------------
    if params.full_telemetry:
        executed = jnp.arange(I)[None, :] < iters[:, None]   # (B, I)
        log = jax.vmap(jax.vmap(lambda h, e: telemetry_row(
            h, e, detection, handling, params.thresholds,
            params.min_effective_points, T_gt)))(hist, executed)
    else:
        log = jax.vmap(lambda _: _empty_log(I, dtype))(jnp.arange(B))

    if params.full_telemetry:
        cov = jax.vmap(lambda H, c: covariance_from_H(H, c, dtype))(
            H_last, conv)
    else:
        # speed runs: plain solve-based H^-1 (the reference's eigenvalue
        # repair only matters for near-singular H, which aborts the lane
        # anyway) -- covariance_from_H costs TWO 6x6 Jacobi EVDs, a
        # measurable per-registration latency tax in the map loop
        eye6 = jnp.eye(6, dtype=dtype)
        inv = jax.vmap(lambda H: jnp.linalg.solve(H, eye6))(H_last)
        ok = conv[:, None, None] & jnp.all(jnp.isfinite(inv),
                                           axis=(1, 2))[:, None, None]
        cov = jnp.where(ok, inv, 1e6 * eye6)
    return BatchICPResult(R=Rs, t=ts, converged=conv, aborted=abt,
                          iterations=iters, covariance=cov, log=log,
                          pair_overflow=ovf, H_last=H_last, rmse=rmse_last,
                          fitness=fitness_last, num_valid=nvalid_last)


def estimate_map_capacities(mindex: MapIndex, source_xyz, poses_Rt,
                            radius: float, margin: float = 1.3,
                            sup_margin: int = 2,
                            include_identity: bool = True,
                            slot_margin: float = None):
    """Host-side static capacities for MAP-SCALE batch registration.

    Returns (num_supers, max_per_query, num_pairs): the level-1 cull
    width, the per-query-block slot capacity, and the pair-list capacity,
    each the max over the given (R, t) pose samples (plus identity unless
    ``include_identity`` is False -- odometry frames are never queried at
    the body-frame origin), with margin.  Chunked over query blocks so
    nothing materializes an (nq, num_target_blocks) matrix for
    multi-hundred-M-point maps."""
    src = np.asarray(source_xyz, np.float64)
    N = src.shape[0]
    nq = -(-N // QB)
    pad = np.concatenate([src, np.repeat(src[-1:], nq * QB - N, axis=0)])
    qb = pad.reshape(nq, QB, 3)
    bi = mindex.block
    tlo = np.asarray(bi.lo, np.float64)
    thi = np.asarray(bi.hi, np.float64)
    slo_s = np.asarray(mindex.sup_lo, np.float64)
    shi_s = np.asarray(mindex.sup_hi, np.float64)
    r2 = radius * radius
    samples = ([(np.eye(3), np.zeros(3))] if include_identity else []) + [
        (np.asarray(R), np.asarray(t)) for R, t in poses_Rt]

    sup_count = np.zeros(nq, np.int64)
    blk_count = np.zeros(nq, np.int64)
    rel_sup = np.zeros((nq, mindex.num_supers), bool)
    rel_blk_cnt = None
    # union relevance over pose samples, super level first.  The engine
    # culls with EXACT transformed-point bboxes (exact_qbox), so the
    # estimate transforms the points the same way -- any mismatch here
    # shows up as silent pair-capacity shortfall at runtime
    qlos, qhis = [], []
    for R, t in samples:
        qw = qb @ R.T + t
        qlos.append(qw.min(axis=1))
        qhis.append(qw.max(axis=1))
    for qlo, qhi in zip(qlos, qhis):
        gap = np.maximum(0.0, np.maximum(qlo[:, None] - shi_s[None],
                                         slo_s[None] - qhi[:, None]))
        rel_sup |= (gap * gap).sum(-1) <= r2
    # block level, restricted to each query block's relevant supers
    total_pairs = 0
    for q in range(nq):
        sups = np.nonzero(rel_sup[q])[0]
        if sups.size == 0:
            continue
        bids = (sups[:, None] * mindex.sb
                + np.arange(mindex.sb)[None, :]).ravel()
        bids = bids[bids < bi.num_blocks]
        rel_b = np.zeros(bids.size, bool)
        for qlo, qhi in zip(qlos, qhis):
            gap = np.maximum(0.0, np.maximum(qlo[q][None] - thi[bids],
                                             tlo[bids] - qhi[q][None]))
            rel_b |= (gap * gap).sum(-1) <= r2
        blk_count[q] = int(rel_b.sum())
        total_pairs += int(rel_b.sum())
    sup_count = rel_sup.sum(axis=1)

    num_supers = int(sup_count.max()) + sup_margin
    # the slot capacity may carry a wider margin than the pair total:
    # the kernel grid size is num_pairs (padding steps cost real time)
    # while an unused slot costs only table width
    sm = margin if slot_margin is None else slot_margin
    max_per_query = int(-(-int(blk_count.max()) * sm // 4) * 4) + 4
    if max_per_query > 2048:
        raise ValueError(
            f"map-scale slot capacity needs {max_per_query} target blocks "
            "per query block (cap 2048 = 2^18 candidate ids / TB, "
            "ops/pallas_block_knn.MAX_INDEX_BITS).  The scan is too "
            f"sparse relative to the map for radius {radius}: tighten "
            "``radius`` to an initial-pose-error bound (icp_batch_so3 "
            "initial_cull_radius), densify the scan region, or fall back "
            "to the single-lane engine with grid=mindex.block "
            "(ops/block_sparse.block_knn has no packed-id cap)")
    num_pairs = max(64, int(-(-total_pairs * margin // 64) * 64))
    return num_supers, max_per_query, num_pairs


def estimate_num_pairs(index: BlockIndex, source_xyz, poses_Rt,
                       radius: float, margin: float = 1.3) -> int:
    """Host-side pair-list capacity estimate: union relevance over the given
    (R, t) pose samples plus identity, x margin (rounded up to 64)."""
    src = np.asarray(source_xyz, np.float64)
    N = src.shape[0]
    nq = -(-N // QB)
    pad = np.concatenate([src, np.repeat(src[-1:], nq * QB - N, axis=0)])
    qb = pad.reshape(nq, QB, 3)
    tlo, thi = np.asarray(index.lo, np.float64), np.asarray(index.hi,
                                                            np.float64)
    rel = np.zeros((nq, tlo.shape[0]), bool)
    samples = [(np.eye(3), np.zeros(3))] + list(poses_Rt)
    for R, t in samples:
        qw = qb @ np.asarray(R).T + np.asarray(t)
        qlo, qhi = qw.min(axis=1), qw.max(axis=1)
        gap = np.maximum(0.0, np.maximum(qlo[:, None] - thi[None],
                                         tlo[None] - qhi[:, None]))
        rel |= (gap * gap).sum(-1) <= radius * radius
    total = int(rel.sum())
    return max(64, int(-(-total * margin // 64) * 64))
