"""In-jit stage ablation of the MAP-SCALE B=1 iteration (the ms/frame
path): fixed 8-trip fori_loop variants with stages knocked out, compiled
as ONE program each so relay dispatch cancels in subtraction.

Stages: hier cull (super_candidates + hier_relevance) -> slotted pair
list (bitonic sort) -> slotted Pallas kernel -> SoA tail -> Schur/PCG
solve.  Run with PYTHONPATH=/root/repo:/root/.axon_site on the chip.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _synthetic_map
from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.models.icp_batch import estimate_map_capacities
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod, analyze
from dcreg_tpu.ops.block_sparse import build_map_index, kd_block_order
from dcreg_tpu.ops.pallas_block_knn import (QB, batched_block_knn,
                                            hier_relevance,
                                            make_pair_list_slotted,
                                            super_candidates)
from dcreg_tpu.ops.soa_tail import batched_tail_system
from dcreg_tpu.ops.solvers import solve
from dcreg_tpu.ops import se3

MAP_POINTS = int(os.environ.get("DCREG_BENCH_MAP_POINTS", "5000000"))
ITERS = 8
R_CULL0 = 0.3


def timeit(fn, *args, reps=8):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    extent = max(60.0, (MAP_POINTS / 1500.0) ** 0.5)
    world = _synthetic_map(MAP_POINTS, extent)
    world = world[kd_block_order(world, 128)]
    mindex = build_map_index(world, dtype=jnp.float32, tb=128, sb=64)
    rng = np.random.default_rng(11)
    center = np.array([extent * 0.2, -extent * 0.15, 0.8])
    d2 = np.sum((world - center) ** 2, axis=1)
    near = world[d2 < 6.0 ** 2]
    scan_w = near[rng.choice(near.shape[0], 5000, replace=False)]
    Rg = np.asarray(se3.euler_zyx_to_rot(*map(jnp.asarray, (0.0, 0.0, 0.3))))
    scan = ((scan_w - center) @ Rg
            + rng.normal(0, 0.003, scan_w.shape)).astype(np.float32)
    scan = scan[kd_block_order(scan, 128)]

    params = ICPParams()
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(0.3),
                        0.03, 0.05, 0.02])
    R0 = jnp.asarray(Rg @ np.asarray(
        se3.euler_zyx_to_rot(*map(jnp.asarray, nominal[:3]))),
        jnp.float32)[None]
    t0 = jnp.asarray(center[None] + nominal[None, 3:], jnp.float32)
    S, G, P = estimate_map_capacities(
        mindex, scan, [(np.asarray(R0[0], np.float64), np.asarray(t0[0]))],
        R_CULL0)
    print(f"S={S} G={G} P={P} nbt={mindex.block.num_blocks}", flush=True)

    N = scan.shape[0]
    nq = -(-N // QB)
    pad = np.concatenate([scan, np.repeat(scan[-1:], nq * QB - N, axis=0)])
    qb = pad.reshape(nq, QB, 3)
    src_blocks = jnp.asarray(qb.transpose(0, 2, 1))
    slo = jnp.asarray(qb.min(axis=1))
    shi = jnp.asarray(qb.max(axis=1))
    world_j = jnp.asarray(world)
    scan_j = jnp.asarray(scan)
    k = params.corr.k

    # one-time pair list for the "stage knocked out" variants (device)
    sup0, supok0, _ = super_candidates(slo, shi, R0, t0, mindex,
                                       R_CULL0, S)
    rel_l0, bids0 = hier_relevance(slo, shi, R0, t0, mindex, sup0,
                                   supok0, R_CULL0)
    rel0 = jnp.any(rel_l0, axis=0)
    qid0, tid0, slot0, col0, tbl0, _, _ = make_pair_list_slotted(
        rel0, P, G, block_ids=bids0, nbt=mindex.block.num_blocks)
    static0 = (rel0, bids0, qid0, tid0, slot0, tbl0)

    def make_loop(do_cull, do_pair, do_knn, do_tail, do_solve):
        # big arrays (map, index, scan) MUST be jit ARGUMENTS: a
        # closed-over device array is baked into the HLO as a constant
        # (multi-GB compile payloads at 50M points; relay rejects them)
        @jax.jit
        def run(Rs, ts, scan_j, world_j, mindex, src_blocks, slo, shi,
                static0):
            rel0, bids0, qid0, tid0, slot0, tbl0 = static0
            def body(it, carry):
                Rs, ts = carry
                if do_cull:
                    sup, supok, _ = super_candidates(slo, shi, Rs, ts,
                                                     mindex, R_CULL0, S)
                    rel_l, bids = hier_relevance(slo, shi, Rs, ts, mindex,
                                                 sup, supok, R_CULL0)
                    rel = jnp.any(rel_l, axis=0)
                else:
                    rel, bids = rel0, bids0
                if do_pair:
                    qid, tid, slot, col, tbl, _, _ = make_pair_list_slotted(
                        rel, P, G, block_ids=bids,
                        nbt=mindex.block.num_blocks)
                else:
                    qid, tid, slot, tbl = qid0, tid0, slot0, tbl0
                if do_knn:
                    p12 = jnp.concatenate([Rs.reshape(1, 9), ts], axis=1)
                    vals, idx = batched_block_knn(
                        mindex.block, src_blocks, p12.astype(jnp.float32),
                        qid, tid, P, radius=params.corr.search_radius,
                        covered=jnp.any(rel, axis=1), layout="kn",
                        slot=slot, tid_table=tbl, max_per_query=G)
                    d5row = vals[:, k - 1, :]
                    idx_kn = idx[:, :k, :N]
                else:
                    d5row = jnp.full((1, nq * QB), 0.01, jnp.float32) \
                        + jnp.sum(Rs) * 1e-20
                    idx_kn = jnp.broadcast_to(
                        jnp.arange(N, dtype=jnp.int32)[None, None, :],
                        (1, k, N))
                if do_tail:
                    sysm = batched_tail_system(
                        scan_j, world_j, Rs, ts,
                        sq_d5=d5row[:, :N], idx_kn=idx_kn,
                        params=params.corr,
                        use_weight_derivative=params.use_weight_derivative,
                        weight_slope=params.corr.weight_slope)
                    H, g = sysm.H, sysm.g
                else:
                    H = (jnp.eye(6, dtype=jnp.float32) * 100.0)[None] \
                        + jnp.sum(d5row) * 1e-20
                    g = jnp.ones((1, 6), jnp.float32) * 1e-3
                if do_solve:
                    def lane(Hl, gl):
                        ana = analyze(
                            Hl, DetectionMethod.SCHUR_CONDITION_NUMBER,
                            params.thresholds, fast=True)
                        dx, _ = solve(Hl, gl,
                                      HandlingMethod.PRECONDITIONED_CG,
                                      ana, params.thresholds,
                                      telemetry=False, fast=True)
                        return dx
                    dx = jax.vmap(lane)(H, g)
                else:
                    dx = g * 1e-6
                Rn, tn = jax.vmap(se3.boxplus)(Rs, ts, dx * 0.1)
                return Rn, tn
            return jax.lax.fori_loop(0, ITERS, body, (Rs, ts))
        return lambda Rs, ts: run(Rs, ts, scan_j, world_j, mindex,
                                  src_blocks, slo, shi, static0)

    variants = [
        ("all on      ", (1, 1, 1, 1, 1)),
        ("no cull     ", (0, 1, 1, 1, 1)),
        ("no pairlist ", (0, 0, 1, 1, 1)),
        ("no knn      ", (0, 0, 0, 1, 1)),
        ("no tail     ", (0, 0, 0, 0, 1)),
        ("empty loop  ", (0, 0, 0, 0, 0)),
        ("knn only    ", (0, 0, 1, 0, 0)),
        ("tail only   ", (0, 0, 0, 1, 0)),
        ("pair only   ", (0, 1, 0, 0, 0)),
        ("cull only   ", (1, 0, 0, 0, 0)),
    ]
    for name, flags in variants:
        run = make_loop(*flags)
        dt = timeit(run, R0, t0)
        print(f"{name}: {dt*1e3:8.2f} ms ({dt*1e3/ITERS:6.2f} ms/iter)",
              flush=True)


if __name__ == "__main__":
    main()
