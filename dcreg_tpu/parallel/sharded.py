"""Multi-chip sharded registration: points x map-blocks over a device mesh.

The reference is a single-process OpenMP program (SURVEY.md section 2.9); its
only parallelism is an 8-thread point loop (icp_test_runner.cpp:1714, :2169).
The TPU-native scale-out re-expresses that as SPMD over a 2-D
``jax.sharding.Mesh``:

  axis ``data``  -- source points sharded across chips (the analogue of the
                    OpenMP point loop; honest data parallelism);
  axis ``map``   -- target map blocks sharded across chips (the analogue of
                    "long context" for this workload: 53M-241M-point maps,
                    supp.pdf Tables II/III, do not fit one chip's HBM).

Inside one ``shard_map`` (the whole ICP while_loop lives inside, so each
iteration costs exactly two collectives):

  1. every (data i, map j) device finds top-k neighbors of its LOCAL source
     shard i in its LOCAL map block j, gathering the candidate COORDINATES
     locally (so no cross-shard index gather is ever needed);
  2. an ``all_gather`` over ``map`` assembles the per-block candidates;
     a k-way merge re-ranks them into the true global k-NN -- exact, because
     each block's true top-k is a superset of its members of the global top-k;
  3. plane fit, robust weights, and the 6x6 GN build run on the local shard;
     ``psum`` over ``data`` (42 floats: upper-triangle H + g + counters)
     yields the replicated global system -- the "gradient all-reduce" of
     this workload;
  4. the 6x6 degeneracy analysis / DCReg solve / boxplus update are
     replicated on every device (they are microscopic), so the loop carries
     no further communication.

The result equals the single-chip engine up to fp reduction order; the test
suite checks bit-level tolerance vs the unsharded path on a virtual 8-device
CPU mesh.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import se3
from ..ops.correspondence import CorrespondenceParams, fit_planes
from ..ops.degeneracy import analyze, detection_code, handling_code
from ..ops.gauss_newton import GNSystem
from ..ops.solvers import solve
from ..models.icp import ICPParams
from ..utils import precise


def make_mesh(n_data: int, n_map: int, devices=None) -> Mesh:
    """A (data, map) mesh over the first n_data*n_map devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_map
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np
    arr = np.array(devices[:n]).reshape(n_data, n_map)
    return Mesh(arr, axis_names=("data", "map"))


def factor_mesh(n_devices: int) -> tuple[int, int]:
    """Split n devices into (data, map) -- map gets the smaller factor."""
    n_map = 1
    for cand in (2, 3):
        if n_devices % cand == 0 and n_devices // cand >= cand:
            n_map = cand
            break
    return n_devices // n_map, n_map


def _local_topk(p_w, tgt_loc, tgt_valid_loc, kk):
    """Exact top-kk (smallest sqdist) of each row of p_w in the local map
    block; returns (sqdist (n, kk), coords (n, kk, 3)).

    Dense (n, M_shard) variant -- only viable for small shards; the
    block-culled variant below is the map-scale path."""
    t_sq = jnp.sum(tgt_loc * tgt_loc, axis=-1)
    t_sq = jnp.where(tgt_valid_loc, t_sq, jnp.inf)
    d = (jnp.sum(p_w * p_w, axis=-1)[:, None] + t_sq[None, :]
         - 2.0 * p_w @ tgt_loc.T)
    neg, idx = jax.lax.top_k(-d, kk)
    cand = tgt_loc[idx]
    # exact re-ranking distances (kills the expansion's cancellation error)
    diff = cand - p_w[:, None, :]
    d_exact = jnp.sum(diff * diff, axis=-1)
    d_exact = jnp.where(jnp.take(tgt_valid_loc, idx), d_exact, jnp.inf)
    return d_exact, cand


_QBS = 128   # query block size for the culled local search


def _local_topk_culled(p_w, q_valid, tgt_blocks, tgt_bval, blo, bhi,
                       radius, kk, G, sb: int = 0, GS: int = 0):
    """Exact within-``radius`` top-kk via bbox block culling (the
    ops/block_sparse.block_knn design applied INSIDE the map shard): per
    128-query block, only the nearest G target blocks whose bbox is
    within ``radius`` are searched, so per-iteration cost tracks the
    neighborhood occupancy, not M_shard.  Neighbors beyond ``radius`` may
    be reported as inf -- the correspondence radius gate downstream
    rejects them identically.

    ``sb`` > 0 enables the TWO-LEVEL cull (ops/block_sparse.MapIndex
    applied inside the shard): blocks group into supers of ``sb``; the
    (nq, nbt_loc) gap matrix is replaced by (nq, nbt_loc/sb) at the
    super level + (nq, GS*sb) over only the <= GS nearest relevant
    supers -- per-iteration bbox work then tracks the neighborhood, not
    the shard's block count (a 218M-point map / 8 shards is ~850k local
    blocks; the flat matrix would be 40 x 850k per iteration).

    Returns (sqdist (n, kk), coords (n, kk, 3), overflow () int32 =
    #query blocks whose relevant blocks/supers exceeded G/GS; size via
    the host estimators so this stays 0)."""
    n = p_w.shape[0]
    nbt, tb = tgt_bval.shape
    Gc = min(G, nbt)
    nq = -(-n // _QBS)
    pad = nq * _QBS - n
    qp = jnp.concatenate([p_w, jnp.full((pad, 3), 1e6, p_w.dtype)])
    qv = jnp.concatenate([q_valid, jnp.zeros(pad, bool)])
    qb = qp.reshape(nq, _QBS, 3)
    qvb = qv.reshape(nq, _QBS)
    # query bboxes over VALID rows only (padding/invalid rows carry the
    # far fill and would otherwise make every target block relevant)
    qlo = jnp.min(jnp.where(qvb[..., None], qb, jnp.inf), axis=1)
    qhi = jnp.max(jnp.where(qvb[..., None], qb, -jnp.inf), axis=1)

    r2 = radius * radius
    if sb and nbt > sb:
        ns = -(-nbt // sb)
        pad_b = ns * sb - nbt
        blo_p = jnp.concatenate([blo, jnp.full((pad_b, 3), jnp.inf,
                                               blo.dtype)])
        bhi_p = jnp.concatenate([bhi, jnp.full((pad_b, 3), -jnp.inf,
                                               bhi.dtype)])
        slo_s = jnp.min(blo_p.reshape(ns, sb, 3), axis=1)
        shi_s = jnp.max(bhi_p.reshape(ns, sb, 3), axis=1)
        gs = jnp.maximum(0.0, jnp.maximum(qlo[:, None] - shi_s[None],
                                          slo_s[None] - qhi[:, None]))
        ds = jnp.sum(gs * gs, axis=-1)                       # (nq, ns)
        rel_s = ds <= r2
        GSc = min(max(GS, 1), ns)
        sup_ovf = jnp.sum((jnp.sum(rel_s.astype(jnp.int32), axis=1) > GSc)
                          .astype(jnp.int32))
        negs, ssel = jax.lax.top_k(jnp.where(rel_s, -ds, -jnp.inf), GSc)
        s_ok = jnp.isfinite(negs)
        ssel = jnp.where(s_ok, ssel, 0)
        # candidate blocks of the selected supers only: (nq, GSc*sb)
        cand_ids = (ssel[:, :, None] * sb
                    + jnp.arange(sb, dtype=jnp.int32)).reshape(nq,
                                                               GSc * sb)
        in_map = (cand_ids < nbt) & jnp.repeat(s_ok, sb, axis=1)
        cand_ids = jnp.where(in_map, cand_ids, 0)
        cblo = blo[cand_ids]                                 # (nq, C, 3)
        cbhi = bhi[cand_ids]
        gap = jnp.maximum(0.0, jnp.maximum(qlo[:, None] - cbhi,
                                           cblo - qhi[:, None]))
        d_bb = jnp.sum(gap * gap, axis=-1)                   # (nq, C)
        rel = (d_bb <= r2) & in_map
        overflow = sup_ovf + jnp.sum(
            (jnp.sum(rel.astype(jnp.int32), axis=1) > Gc).astype(jnp.int32))
        neg, col = jax.lax.top_k(jnp.where(rel, -d_bb, -jnp.inf), Gc)
        slot_ok = jnp.isfinite(neg)
        bsel = jnp.where(slot_ok,
                         jnp.take_along_axis(cand_ids, col, axis=1), 0)
    else:
        gap = jnp.maximum(0.0, jnp.maximum(qlo[:, None] - bhi[None, :],
                                           blo[None, :] - qhi[:, None]))
        d_bb = jnp.sum(gap * gap, axis=-1)                   # (nq, nbt)
        rel = d_bb <= r2
        overflow = jnp.sum((jnp.sum(rel.astype(jnp.int32), axis=1) > Gc)
                           .astype(jnp.int32))
        score = jnp.where(rel, d_bb, jnp.inf)
        neg, bsel = jax.lax.top_k(-score, Gc)                # (nq, Gc)
        slot_ok = jnp.isfinite(-neg)
        bsel = jnp.where(slot_ok, bsel, 0)

    cand = tgt_blocks[bsel].reshape(nq, Gc * tb, 3)
    cok = (tgt_bval[bsel] & slot_ok[..., None]).reshape(nq, Gc * tb)
    # keep candidate coords finite (sentinel padding is +-BIG): clipped
    # coords stay far beyond every radius gate but never produce NaNs in
    # the plane fit
    cand = jnp.clip(cand, -1e6, 1e6)

    diff = qb[:, :, None, :] - cand[:, None, :, :]
    d = jnp.sum(diff * diff, axis=-1)                        # (nq, QBS, C)
    d = jnp.where(cok[:, None, :], d, jnp.inf)
    negd, sel = jax.lax.top_k(-d, kk)
    d_sel = -negd                                            # (nq, QBS, kk)
    coords = cand[jnp.arange(nq)[:, None, None], sel, :]     # (nq,QBS,kk,3)
    d_out = d_sel.reshape(nq * _QBS, kk)[:n]
    c_out = coords.reshape(nq * _QBS, kk, 3)[:n]
    return d_out, c_out, overflow


class ShardedICPResult(NamedTuple):
    R: jax.Array            # (3, 3)
    t: jax.Array            # (3,)
    converged: jax.Array    # () bool
    aborted: jax.Array      # () bool
    iterations: jax.Array   # () int32
    rmse: jax.Array         # () final-iteration rmse
    fitness: jax.Array      # ()
    effective_points: jax.Array  # () int32
    dx_history: jax.Array   # (I, 6)
    transform_history: jax.Array  # (I, 4, 4)
    block_overflow: jax.Array    # () int32 (block-cull capacity; 0 = exact)


def sharded_icp_register(mesh: Mesh, source_xyz, target_xyz, R0, t0,
                         detection, handling,
                         params: ICPParams = ICPParams(),
                         T_gt=None, source_valid=None, target_valid=None,
                         block_cull: bool = True, block_size: int = 32,
                         num_blocks: int = 16, super_size: int = 0,
                         num_supers: int = 8):
    """Full degeneracy-aware point-to-plane ICP, sharded over ``mesh``.

    source_xyz (N, 3) with N divisible by mesh.shape['data']; target_xyz
    (M, 3) with M divisible by mesh.shape['map'] (and, with the default
    ``block_cull``, by map * block_size -- use ``shard_points(...,
    block=block_size)``).  Pads are expressed via the optional validity
    masks.  Returns replicated ShardedICPResult.

    block_cull: search each map shard through ``block_size``-point bbox
    blocks, visiting only the <= ``num_blocks`` nearest relevant blocks
    per 128-query block (exact within the correspondence radius; the
    TPU-native KD-tree replacement of ops/block_sparse.py applied inside
    shard_map).  Per-iteration cost then tracks neighborhood occupancy
    instead of M_shard, which is what makes 100k+-point shards viable.
    Target should be Morton-sorted (ops/block_sparse.morton_argsort) for
    compact blocks.  ``block_cull=False`` is the dense (n, M_shard) path
    for tiny targets.

    super_size: > 0 adds the TWO-LEVEL cull inside each shard (supers of
    ``super_size`` blocks, <= ``num_supers`` relevant supers per query
    block) so per-iteration bbox work tracks the neighborhood instead of
    the shard's block count -- required for reference-scale shards
    (e.g. 218M points / 8 chips ~ 850k blocks each).
    """
    dtype = source_xyz.dtype
    if T_gt is None:
        T_gt = jnp.eye(4, dtype=dtype)
    if source_valid is None:
        source_valid = jnp.ones(source_xyz.shape[0], bool)
    if target_valid is None:
        target_valid = jnp.ones(target_xyz.shape[0], bool)
    det = jnp.asarray(detection_code(detection), jnp.int32)
    hand = jnp.asarray(handling_code(handling), jnp.int32)

    k = params.corr.k
    cp = params.corr
    I = params.max_iterations
    tb = block_size
    n_map_shards = mesh.shape["map"]
    if block_cull and (target_xyz.shape[0] % (n_map_shards * tb)) != 0:
        raise ValueError(
            f"block_cull needs M divisible by map shards * block_size "
            f"({n_map_shards} * {tb}); pad with shard_points(..., "
            f"block={tb})")

    @precise
    def body(src_loc, src_val_loc, tgt_loc, tgt_val_loc, R0, t0, det, hand,
             T_gt):
        n_map = jax.lax.psum(1, "map")
        num_source = jax.lax.psum(jnp.sum(src_val_loc.astype(jnp.int32)),
                                  "data")

        if block_cull:
            # one-time per-shard block structure (the KD-tree build)
            nbt_loc = tgt_loc.shape[0] // tb
            tgt_blocks = tgt_loc.reshape(nbt_loc, tb, 3)
            tgt_bval = tgt_val_loc.reshape(nbt_loc, tb)
            blo = jnp.min(jnp.where(tgt_bval[..., None], tgt_blocks,
                                    jnp.inf), axis=1)
            bhi = jnp.max(jnp.where(tgt_bval[..., None], tgt_blocks,
                                    -jnp.inf), axis=1)

        def one_iteration(R, t):
            p_w = src_loc @ R.T + t
            if block_cull:
                d_loc, c_loc, b_ovf = _local_topk_culled(
                    p_w, src_val_loc, tgt_blocks, tgt_bval, blo, bhi,
                    cp.search_radius, k, num_blocks, sb=super_size,
                    GS=num_supers)
            else:
                d_loc, c_loc = _local_topk(p_w, tgt_loc, tgt_val_loc, k)
                b_ovf = jnp.asarray(0, jnp.int32)
            # (map, n, k) / (map, n, k, 3) -> merged exact global top-k
            d_all = jax.lax.all_gather(d_loc, "map")
            c_all = jax.lax.all_gather(c_loc, "map")
            n_loc = p_w.shape[0]
            d_flat = jnp.moveaxis(d_all, 0, 1).reshape(n_loc, n_map * k)
            c_flat = jnp.moveaxis(c_all, 0, 1).reshape(n_loc, n_map * k, 3)
            neg, sel = jax.lax.top_k(-d_flat, k)
            sq_d = -neg
            neigh = jnp.take_along_axis(c_flat, sel[..., None], axis=1)

            in_radius = sq_d[:, k - 1] < cp.search_radius ** 2
            normal, d_off, fit_ok = fit_planes(neigh)
            plane_dist = jnp.einsum("nkj,nj->nk", neigh, normal) \
                + d_off[:, None]
            plane_ok = jnp.max(plane_dist * plane_dist, axis=-1) \
                < cp.max_plane_thickness ** 2
            residual = jnp.einsum("nj,nj->n", p_w, normal) + d_off
            s = jnp.maximum(0.0, 1.0 - cp.weight_slope * jnp.abs(residual))
            valid = (in_radius & fit_ok & plane_ok & (s > cp.min_weight)
                     & src_val_loc)
            s = jnp.where(valid, s, 0.0)

            # GN rows (gauss_newton.build_system semantics, local shard)
            if params.use_weight_derivative:
                on_ramp = (s > 0.0) & (s < 1.0)
                ds_dr = jnp.where(on_ramp,
                                  -cp.weight_slope * jnp.sign(residual), 0.0)
                row_scale = jnp.where(valid, s + residual * ds_dr, 0.0)
            else:
                row_scale = s
            nR = normal @ R
            Jw = jnp.cross(src_loc, nR)
            J = jnp.concatenate([Jw, nR], axis=-1) * row_scale[:, None]
            b = -(s * residual)

            # the 42-float cross-chip reduction (+ 3 scalar counters)
            H = jax.lax.psum(J.T @ J, "data")
            g = jax.lax.psum(J.T @ b, "data")
            n_valid = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), "data")
            sq_sum = jax.lax.psum(
                jnp.sum(jnp.where(valid, residual * residual, 0.0)), "data")
            n_fit = jax.lax.psum(jnp.sum(in_radius.astype(jnp.int32)), "data")
            obj = jax.lax.psum(0.5 * jnp.sum(b * b), "data")

            rmse = jnp.sqrt(sq_sum / jnp.maximum(n_valid, 1).astype(dtype))
            fitness = n_fit.astype(dtype) / jnp.maximum(
                num_source, 1).astype(dtype)
            sysm = GNSystem(H=H, g=g, num_valid=n_valid, rmse=rmse,
                            fitness=fitness, objective=obj)
            analysis = analyze(H, det, params.thresholds)
            # telemetry=False: the hot loop consumes only dx; the cond(PH)
            # eigendecomposition and P/W extras belong to the (optional)
            # post-hoc telemetry pass, not every device every iteration
            dx, _ = solve(H, g, hand, analysis, params.thresholds,
                          telemetry=False)
            return sysm, dx, jax.lax.psum(b_ovf, ("data", "map")).astype(jnp.int32)

        def loop_body(state):
            it, R, t, conv, abort, rmse, fit, neff, dx_h, T_h, ovf = state
            sysm, dx, b_ovf = one_iteration(R, t)
            too_few = sysm.num_valid < params.min_effective_points
            bad = ~jnp.all(jnp.isfinite(dx))
            abort_now = too_few | bad
            dx = jnp.where(abort_now, jnp.zeros_like(dx), dx)
            R_new, t_new = se3.boxplus(R, t, dx)
            R_new = jnp.where(abort_now, R, R_new)
            t_new = jnp.where(abort_now, t, t_new)
            conv = (jnp.linalg.norm(dx[:3]) < params.convergence_thresh_rot) \
                & (jnp.linalg.norm(dx[3:]) < params.convergence_thresh_trans) \
                & ~abort_now
            dx_h = dx_h.at[it].set(dx)
            T_h = T_h.at[it].set(se3.se3_matrix(R_new, t_new))
            return (it + 1, R_new, t_new, conv, abort_now, sysm.rmse,
                    sysm.fitness, sysm.num_valid.astype(jnp.int32), dx_h,
                    T_h, jnp.maximum(ovf, b_ovf))

        def loop_cond(state):
            it, R, t, conv, abort = state[:5]
            return (it < I) & ~conv & ~abort

        init = (jnp.asarray(0, jnp.int32), R0.astype(dtype),
                t0.astype(dtype), jnp.asarray(False), jnp.asarray(False),
                jnp.asarray(jnp.nan, dtype), jnp.asarray(jnp.nan, dtype),
                jnp.asarray(0, jnp.int32),
                jnp.full((I, 6), jnp.nan, dtype),
                jnp.full((I, 4, 4), jnp.nan, dtype),
                jnp.asarray(0, jnp.int32))
        it, R, t, conv, abort, rmse, fit, neff, dx_h, T_h, ovf = \
            jax.lax.while_loop(loop_cond, loop_body, init)
        return ShardedICPResult(R=R, t=t, converged=conv, aborted=abort,
                                iterations=it, rmse=rmse, fitness=fit,
                                effective_points=neff, dx_history=dx_h,
                                transform_history=T_h, block_overflow=ovf)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("map", None), P("map"),
                  P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    jitted = jax.jit(fn)
    return jitted(source_xyz, source_valid, target_xyz, target_valid,
                  R0.astype(dtype), t0.astype(dtype), det, hand,
                  jnp.asarray(T_gt, dtype))


def pad_for_mesh(arr_len: int, shards: int) -> int:
    """Smallest multiple of ``shards`` >= arr_len."""
    return ((arr_len + shards - 1) // shards) * shards


def shard_points(xyz, shards: int, fill: float = 1e6, block: int = 1):
    """Pad (N, 3) points to a multiple of ``shards * block``; far-away fill
    keeps padded rows out of every radius gate.  ``block`` aligns each
    shard to the block-cull block size.  Returns (padded_xyz, valid)."""
    n = xyz.shape[0]
    m = pad_for_mesh(n, shards * block)
    pad = m - n
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)), constant_values=fill)
    valid = jnp.arange(m) < n
    return xyz_p, valid
