"""B=1 latency ablation of the batched engine (the single-registration
path bench.py times): fixed 8-trip fori_loop variants with individual
stages knocked out, each compiled as ONE program so axon dispatch latency
cancels in the subtraction.  Uses the REAL stages of models/icp_batch.py
(lane_relevance -> make_pair_list -> pack_lane_mask -> kernel -> SoA tail
-> fast Schur/PCG solve), unlike profile_ablate.py which profiles the
older AoS tail at B=32.

Also times the full icp_batch_so3 engine at B=1 with telemetry on/off and
at several iteration caps (slope = marginal cost/iter, intercept = fixed
program overhead).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.models.icp_batch import icp_batch_so3, estimate_num_pairs
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod, analyze
from dcreg_tpu.ops.block_sparse import build_block_index, morton_argsort
from dcreg_tpu.ops.pallas_block_knn import (QB, batched_block_knn,
                                            lane_relevance, make_pair_list,
                                            pack_lane_mask)
from dcreg_tpu.ops.soa_tail import batched_tail_system
from dcreg_tpu.ops.solvers import solve
from dcreg_tpu.ops import se3

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
B = 1
ITERS = 8


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    dtype = jnp.float32
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    perm = morton_argsort(xyz)
    xyz = xyz[perm]
    source = jnp.asarray(xyz, dtype)
    target = source
    index = build_block_index(xyz, dtype=dtype, tb=128)
    params = ICPParams()
    N = source.shape[0]
    k = params.corr.k
    radius = params.corr.search_radius

    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    R0s = jnp.stack([se3.euler_zyx_to_rot(*map(jnp.asarray, nominal[:3]))
                     ]).astype(dtype)
    t0s = jnp.asarray(nominal[None, 3:], dtype)
    P = estimate_num_pairs(index, xyz,
                           [(np.asarray(R0s[0], np.float64), nominal[3:])],
                           radius)
    print(f"num_pairs P = {P}, nq = {-(-N // QB)}, nbt = {index.num_blocks}")

    nq = -(-N // QB)
    src_pad = jnp.concatenate(
        [source, jnp.broadcast_to(source[-1:], (nq * QB - N, 3))])
    src_q = src_pad.reshape(nq, QB, 3)
    src_blocks = src_q.transpose(0, 2, 1)
    slo = jnp.min(src_q, axis=1)
    shi = jnp.max(src_q, axis=1)

    # ---- whole-engine timings -------------------------------------------
    for telem in (True, False):
        pm = params._replace(full_telemetry=telem)

        def eng(Rs, ts):
            return icp_batch_so3(source, target, Rs, ts,
                                 DetectionMethod.SCHUR_CONDITION_NUMBER,
                                 HandlingMethod.PRECONDITIONED_CG, pm,
                                 index, P)
        dt = timeit(eng, R0s, t0s)
        print(f"icp_batch_so3 B=1 telemetry={telem}: {dt*1e3:8.2f} ms")

    for cap in (2, 4, 8, 16):
        pm = params._replace(full_telemetry=False, max_iterations=cap)

        def eng(Rs, ts):
            return icp_batch_so3(source, target, Rs, ts,
                                 DetectionMethod.SCHUR_CONDITION_NUMBER,
                                 HandlingMethod.PRECONDITIONED_CG, pm,
                                 index, P)
        dt = timeit(eng, R0s, t0s)
        print(f"icp_batch_so3 B=1 max_iter={cap:3d}: {dt*1e3:8.2f} ms")

    # ---- stage ablation (fixed 8-trip fori, real stages) ----------------
    def make_loop(do_rel, do_pair, do_mask, do_knn, do_tail, do_solve):
        rel_l0 = lane_relevance(slo, shi, R0s, t0s, index.lo, index.hi,
                                radius, per_lane=True)
        rel0 = jnp.any(rel_l0, axis=0)
        qid0, tid0, _ = make_pair_list(rel0, P)
        lm0 = pack_lane_mask(rel_l0, qid0, tid0)
        cov0 = jnp.any(rel0, axis=1)

        @jax.jit
        def run(Rs, ts):
            def body(it, carry):
                Rs, ts = carry
                if do_rel:
                    rel_l = lane_relevance(slo, shi, Rs, ts, index.lo,
                                           index.hi, radius, per_lane=True)
                    rel = jnp.any(rel_l, axis=0)
                else:
                    rel_l, rel = rel_l0, rel0
                if do_pair:
                    qid, tid, _ = make_pair_list(rel, P)
                else:
                    qid, tid = qid0, tid0
                if do_mask:
                    lm = pack_lane_mask(rel_l, qid, tid)
                else:
                    lm = lm0
                if do_knn:
                    p12 = jnp.concatenate([Rs.reshape(B, 9), ts], axis=1)
                    vals, idx = batched_block_knn(
                        index, src_blocks, p12.astype(jnp.float32),
                        qid, tid, P, radius=radius,
                        covered=jnp.any(rel, axis=1), lane_mask=lm,
                        layout="kn")
                    d5row = vals[:, k - 1, :]
                    idx_kn = idx[:, :k, :N]
                else:
                    d5row = jnp.full((B, nq * QB), 0.01, jnp.float32) \
                        + jnp.sum(Rs) * 1e-20
                    idx_kn = jnp.broadcast_to(
                        jnp.arange(N, dtype=jnp.int32)[None, None, :],
                        (B, k, N))
                if do_tail:
                    sysm = batched_tail_system(
                        source, target, Rs, ts,
                        sq_d5=d5row[:, :N].astype(dtype), idx_kn=idx_kn,
                        params=params.corr,
                        use_weight_derivative=params.use_weight_derivative,
                        weight_slope=params.corr.weight_slope)
                    H, g = sysm.H, sysm.g
                else:
                    H = (jnp.eye(6, dtype=dtype) * 100.0)[None] \
                        + jnp.sum(d5row) * 1e-20
                    g = jnp.ones((B, 6), dtype) * 1e-3
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
        return run

    variants = [
        ("all on         ", (1, 1, 1, 1, 1, 1)),
        ("no rel         ", (0, 1, 1, 1, 1, 1)),
        ("no rel+pair    ", (0, 0, 1, 1, 1, 1)),
        ("no mask        ", (0, 0, 0, 1, 1, 1)),
        ("no knn         ", (0, 0, 0, 0, 1, 1)),
        ("no tail        ", (0, 0, 0, 0, 0, 1)),
        ("empty loop     ", (0, 0, 0, 0, 0, 0)),
        ("knn only       ", (0, 0, 0, 1, 0, 0)),
        ("tail only      ", (0, 0, 0, 0, 1, 0)),
        ("solve only     ", (0, 0, 0, 0, 0, 1)),
    ]
    for name, flags in variants:
        run = make_loop(*flags)
        dt = timeit(run, R0s, t0s)
        print(f"{name}: {dt*1e3:8.2f} ms  ({dt*1e3/ITERS:6.2f} ms/iter)")


if __name__ == "__main__":
    main()
