"""Fused Pallas TPU k-NN kernel: distance tiles + running top-k in VMEM.

The XLA path in ``knn.py`` materializes each (chunk, M) distance block to
HBM and extracts minima with scatter-heavy updates; at frame scale
(N = M ~ 7.5k, batch 32) that costs ~370 ms/iteration on a v5e chip and is
85% of the whole registration pipeline (the reference's per-point
pcl::KdTreeFLANN loop, ``DCReg/src/icp_test_runner.cpp:1722``).  This kernel
is the TPU-native replacement:

  * grid = (query tiles, target tiles); the (TQ, TT) distance tile is
    computed by one MXU matmul (|t|^2 + |q|^2 - 2 q.t) and *never leaves
    VMEM*;
  * per-tile top-kk extraction uses a packed-key trick: the low
    log2(TT) mantissa bits of each (non-negative) f32 distance are replaced
    by the lane-local column index, so every key is unique and each
    extraction round is just  min -> mask-equal -> unpack  (no argmin
    gather, no scatter, no ties);
  * a running (TQ, kk) best list is carried in VMEM scratch across target
    tiles and merged with each tile's candidates by the same extraction on
    a 2*kk-wide strip (negligible);
  * quantizing the low mantissa bits perturbs ranking only at relative
    2^-(23-log2(TT)) ~ 1e-4; the caller re-ranks the kk candidates with
    exactly-computed distances, so returned k-NN match the exact search
    (validated against the XLA path in tests/test_pallas_knn.py).

HBM traffic: the target is re-read once per query tile (3*M floats), the
queries once, and (N, kk) outputs written once -- no N*M intermediate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max-finite f32: used instead of +inf because packed keys OR index bits
# into the mantissa, and inf|bits is a NaN pattern that poisons min().
BIG = 3.0e38  # python float: jnp constants may not be captured by kernels


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _knn_kernel(qT_ref, tT_ref, pen_ref, val_ref, idx_ref,
                best_val, best_idx, *, kk: int, tt: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_val[:] = jnp.full_like(best_val, BIG)
        best_idx[:] = jnp.zeros_like(best_idx)

    q = qT_ref[:]                       # (3, TQ)
    t = tT_ref[:]                       # (3, TT)
    # distances COORDINATE-WISE (subtract before squaring), not the
    # |q|^2+|t|^2-2q.t MXU expansion: on hardware the f32 matmul runs as
    # bf16 passes and the cancellation at LiDAR coordinate scale misranks
    # whole neighbor lists (interpret mode hides it -- caught by the
    # tests/test_tpu_device.py lane).  pen is (1, TT): BIG at invalid.
    d = pen_ref[:] + jnp.zeros((q.shape[1], 1), jnp.float32)  # (TQ, TT)
    for c in range(3):
        diff = q[c, :][:, None] - t[c, :][None, :]
        d = d + diff * diff
    # bias so every key is a NORMAL float: d=0 would pack to a denormal
    # whose index bits get flushed to zero by FTZ arithmetic (losing the
    # candidate's identity).  2^-30 is far below any physical distance.
    d = jnp.minimum(d, BIG) + 2.0 ** -30

    # pack lane-local column index into the low mantissa bits -> unique keys
    tq = d.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tt), 1)
    ibits = jnp.int32(tt - 1)
    key = jnp.bitwise_or(
        jnp.bitwise_and(jax.lax.bitcast_convert_type(d, jnp.int32), ~ibits),
        col)
    key = jax.lax.bitcast_convert_type(key, jnp.float32)

    # kk extraction rounds: min -> record -> mask (keys unique, no argmin)
    new_vals, new_idxs = [], []
    for _ in range(kk):
        m = jnp.min(key, axis=1, keepdims=True)              # (TQ, 1)
        mi = jax.lax.bitcast_convert_type(m, jnp.int32)
        local = jnp.bitwise_and(mi, ibits)
        quant = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(mi, ~ibits), jnp.float32)        # quantized dist
        new_vals.append(quant)
        new_idxs.append((j * tt + local).astype(jnp.float32))
        key = jnp.where(key == m, BIG, key)

    new_val = jnp.concatenate(new_vals, axis=1)              # (TQ, kk)
    new_idx = jnp.concatenate(new_idxs, axis=1)              # (TQ, kk)

    # merge with the running best list (2*kk-wide extraction; idx unique)
    cat_v = jnp.concatenate([best_val[:, :kk], new_val], axis=1)
    cat_i = jnp.concatenate([best_idx[:, :kk], new_idx], axis=1)
    mvals, midxs = [], []
    for _ in range(kk):
        m = jnp.min(cat_v, axis=1, keepdims=True)
        is_m = cat_v == m
        sel = jnp.min(jnp.where(is_m, cat_i, BIG), axis=1, keepdims=True)
        mvals.append(m)
        midxs.append(sel)
        cat_v = jnp.where(is_m & (cat_i == sel), BIG, cat_v)
    best_val[:, :kk] = jnp.concatenate(mvals, axis=1)
    best_idx[:, :kk] = jnp.concatenate(midxs, axis=1)

    @pl.when(j == nj - 1)
    def _emit():
        val_ref[:] = best_val[:]
        idx_ref[:] = best_idx[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "kk", "tq", "tt", "interpret"))
def knn(query, target, target_valid=None, k: int = 5, kk: int = 8,
        tq: int = 256, tt: int = 2048, interpret: bool = False):
    """Exact k nearest neighbors (TPU fused path).

    query: (N, 3); target: (M, 3); returns (sq_dists (N, k) ascending,
    indices (N, k)) matching ``knn.knn`` semantics.  kk >= k is the internal
    candidate-list width (margin for the packed-key quantization).
    """
    n, m = query.shape[0], target.shape[0]
    kk = max(k, kk)
    orig_dtype = query.dtype
    query = query.astype(jnp.float32)
    target = target.astype(jnp.float32)

    npad = _round_up(max(n, 8), tq)
    mpad = _round_up(max(m, 128), tt)
    qT = jnp.pad(query, ((0, npad - n), (0, 0))).T           # (3, NQpad)
    tT = jnp.pad(target, ((0, mpad - m), (0, 0))).T          # (3, Mpad)
    ok = jnp.arange(mpad) < m
    if target_valid is not None:
        ok = ok & jnp.pad(target_valid, (0, mpad - m))
    pen = jnp.where(ok[None, :], 0.0, BIG).astype(jnp.float32)  # (1, Mpad)

    grid = (npad // tq, mpad // tt)
    out_val, out_idx = pl.pallas_call(
        functools.partial(_knn_kernel, kk=kk, tt=tt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tq), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 128), jnp.float32),
            jax.ShapeDtypeStruct((npad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * 3 + npad * mpad * (2 * kk + 4),
            bytes_accessed=(grid[0] * mpad * 16) + npad * 12 + npad * 1024,
            transcendentals=0),
        interpret=interpret,
    )(qT, tT, pen)

    idx = out_idx[:n, :kk].astype(jnp.int32)
    idx = jnp.clip(idx, 0, m - 1)

    # exact re-rank of the kk candidates (fixes packed-key quantization and
    # the |q|^2+|t|^2-2q.t cancellation error in one shot)
    cand = target[idx]                                       # (N, kk, 3)
    diff = cand - query[:, None, :]
    d_exact = jnp.sum(diff * diff, axis=-1)
    d_exact = jnp.where(out_val[:n, :kk] >= BIG, jnp.inf, d_exact)
    if target_valid is not None:
        d_exact = jnp.where(target_valid[idx], d_exact, jnp.inf)
    neg, sel = jax.lax.top_k(-d_exact, k)
    return (-neg).astype(orig_dtype), jnp.take_along_axis(idx, sel, axis=-1)


# ---------------------------------------------------------------------------
# Two-phase grouped search: group-min prefilter kernel + exact candidate pass
# ---------------------------------------------------------------------------

def _gmin_kernel(qT_ref, tT_ref, pen_ref, out_ref, *, tt: int):
    """Phase A: per-query min distance over each 128-target lane group.

    Distances are computed COORDINATE-WISE (subtract before squaring): the
    |q|^2+|t|^2-2q.t expansion carries ~1e-3 absolute f32 error at LiDAR
    coordinate scale, and one fuzzy group-min misranks the whole group
    (observed: 0.2% wrong neighbors).  Three subtract-square-accumulate
    passes are exact to ~1e-7 relative.  pen is a (1, TT) additive penalty
    strip: BIG at invalid/padded targets.

    Output is TRANSPOSED -- (groups, queries) -- so each grid step writes a
    (TT/128, TQ) block addressed by BlockSpec (Mosaic rejects dynamic minor-
    dim stores that are not 128-aligned)."""
    q = qT_ref[:]                       # (3, TQ)
    t = tT_ref[:]                       # (3, TT)
    d = pen_ref[:] + jnp.zeros((q.shape[1], 1), jnp.float32)  # (TQ, TT)
    for c in range(3):
        diff = q[c, :][:, None] - t[c, :][None, :]
        d = d + diff * diff
    d = jnp.minimum(d, BIG)
    tq = d.shape[0]
    gpt = tt // 128
    out_ref[:, :] = jnp.min(d.reshape(tq, gpt, 128), axis=2).T  # (gpt, TQ)


def _extract_k_smallest(d, idx, k: int):
    """k rounds of (min, mask) over a WIDE candidate strip, packed-key style
    but in plain XLA: column position packed into the low mantissa bits makes
    every key unique, so no argmin / scatter / tie handling is needed.
    d: (N, C) >= 0 exact distances (inf allowed); idx: (N, C) int32.
    Returns (vals (N, k) ascending exact, indices (N, k))."""
    C = d.shape[-1]
    cbits = max(1, (C - 1)).bit_length()
    mask_c = (1 << cbits) - 1
    col = jnp.arange(C, dtype=jnp.int32)
    dn = jnp.minimum(d, BIG) + jnp.float32(2.0 ** -30)
    key = jnp.bitwise_or(
        jnp.bitwise_and(jax.lax.bitcast_convert_type(dn, jnp.int32),
                        ~jnp.int32(mask_c)), col)
    key = jax.lax.bitcast_convert_type(key, jnp.float32)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.min(key, axis=-1, keepdims=True)
        c = jnp.bitwise_and(jax.lax.bitcast_convert_type(m, jnp.int32),
                            mask_c)[..., 0]
        vals.append(jnp.take_along_axis(d, c[..., None], axis=-1)[..., 0])
        idxs.append(jnp.take_along_axis(idx, c[..., None], axis=-1)[..., 0])
        key = jnp.where(key == m, BIG, key)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


@functools.partial(jax.jit,
                   static_argnames=("k", "groups", "tq", "tt", "interpret"))
def knn_grouped(query, target, target_valid=None, k: int = 5,
                groups: int = 8, tq: int = 256, tt: int = 2048,
                interpret: bool = False):
    """Exact k-NN via group-min prefilter (the fast path for M >~ 2k).

    Phase A reduces the N x M distance field to per-128-target-group minima
    (Pallas, one VPU pass).  Phase B keeps each query's top ``groups`` groups
    and evaluates only those 128*groups candidates exactly.  Exactness: if a
    true k-th neighbor's group were dropped, >= ``groups`` other groups would
    each hold a strictly closer point, contradicting its rank (k <= groups);
    gmin ties consume margin, hence groups > k by default.
    """
    assert groups >= k, "group margin must cover k"
    n, m = query.shape[0], target.shape[0]
    orig_dtype = query.dtype
    query = query.astype(jnp.float32)
    target = target.astype(jnp.float32)

    npad = _round_up(max(n, 8), tq)
    mpad = _round_up(max(m, 128), tt)
    ng = mpad // 128
    qT = jnp.pad(query, ((0, npad - n), (0, 0))).T
    tT = jnp.pad(target, ((0, mpad - m), (0, 0))).T
    ok = jnp.arange(mpad) < m
    if target_valid is not None:
        ok = ok & jnp.pad(target_valid, (0, mpad - m))
    pen = jnp.where(ok[None, :], 0.0, BIG).astype(jnp.float32)

    gmin = pl.pallas_call(
        functools.partial(_gmin_kernel, tt=tt),
        grid=(npad // tq, mpad // tt),
        in_specs=[
            pl.BlockSpec((3, tq), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tt // 128, tq), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * 3 + 2 * npad * mpad,
            bytes_accessed=(npad // tq) * mpad * 16 + npad * 12 + npad * ng * 4,
            transcendentals=0),
        interpret=interpret,
    )(qT, tT, pen).T[:n]

    # phase B: top-`groups` groups per query, exact distances to their points
    _, gidx = jax.lax.top_k(-gmin, groups)                   # (N, G)
    tgt_blocks = jnp.pad(target, ((0, mpad - m), (0, 0))).reshape(ng, 128, 3)
    cand_xyz = tgt_blocks[gidx]                              # (N, G, 128, 3)
    cand_idx = (gidx[..., None] * 128 +
                jnp.arange(128, dtype=jnp.int32)).reshape(n, groups * 128)
    diff = cand_xyz - query[:, None, None, :]
    d = jnp.sum(diff * diff, axis=-1).reshape(n, groups * 128)
    d = jnp.where(cand_idx < m, d, jnp.inf)
    if target_valid is not None:
        d = jnp.where(target_valid[jnp.minimum(cand_idx, m - 1)], d, jnp.inf)
    # extract with margin: packed-key quantization (2^-13 relative) can tie
    # near-equal candidates, so pull k+3 and re-rank the strip exactly
    d_kk, i_kk = _extract_k_smallest(d, cand_idx, k + 3)
    neg, sel = jax.lax.top_k(-d_kk, k)
    return (-neg).astype(orig_dtype), jnp.take_along_axis(i_kk, sel, axis=-1)
