"""In-jit ablation of the batched engine: fixed 9-iteration fori_loop
variants with individual stages knocked out, each timed as ONE compiled
program so axon dispatch latency cancels in the subtraction.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.models.icp_batch import estimate_num_pairs
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod, analyze
from dcreg_tpu.ops.block_sparse import build_block_index, morton_argsort
from dcreg_tpu.ops.correspondence import correspondence_tail
from dcreg_tpu.ops.gauss_newton import build_system
from dcreg_tpu.ops.pallas_block_knn import (QB, batched_block_knn,
                                            lane_relevance, make_pair_list)
from dcreg_tpu.ops.solvers import solve
from dcreg_tpu.ops import se3

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
BATCH = 32
ITERS = 9


def timeit(fn, *args, reps=5):
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

    rng = np.random.default_rng(0)
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    poses = nominal[None, :] * rng.uniform(0.8, 1.2, (BATCH, 6))
    R0s = jnp.stack([se3.euler_zyx_to_rot(*map(jnp.asarray, p[:3]))
                     for p in poses]).astype(dtype)
    t0s = jnp.asarray(poses[:, 3:], dtype)
    P = estimate_num_pairs(
        index, xyz, [(np.asarray(R0s[i], np.float64), poses[i, 3:])
                     for i in range(BATCH)], radius)

    nq = -(-N // QB)
    src_pad = jnp.concatenate(
        [source, jnp.broadcast_to(source[-1:], (nq * QB - N, 3))])
    src_q = src_pad.reshape(nq, QB, 3)
    src_blocks = src_q.transpose(0, 2, 1)
    slo = jnp.min(src_q, axis=1)
    shi = jnp.max(src_q, axis=1)

    def make_loop(do_rel, do_pair, do_knn, do_gather, do_tail, do_solve):
        # precomputed fallbacks (computed once outside loop, closed over)
        rel0 = lane_relevance(slo, shi, R0s, t0s, index.lo, index.hi, radius)
        qid0, tid0, _ = make_pair_list(rel0, P)
        cov0 = jnp.any(rel0, axis=1)

        @jax.jit
        def run(Rs, ts):
            p120 = jnp.concatenate([Rs.reshape(BATCH, 9), ts], axis=1)
            vals0, idx0 = batched_block_knn(index, src_blocks,
                                            p120.astype(jnp.float32),
                                            qid0, tid0, P, covered=cov0)

            def body(it, carry):
                Rs, ts = carry
                if do_rel:
                    rel = lane_relevance(slo, shi, Rs, ts, index.lo,
                                         index.hi, radius)
                else:
                    rel = rel0
                if do_pair:
                    qid, tid, _ = make_pair_list(rel, P)
                else:
                    qid, tid = qid0, tid0
                if do_knn:
                    p12 = jnp.concatenate([Rs.reshape(BATCH, 9), ts], axis=1)
                    vals, idx = batched_block_knn(
                        index, src_blocks, p12.astype(jnp.float32),
                        qid, tid, P, covered=jnp.any(rel, axis=1))
                else:
                    vals, idx = vals0, idx0
                sq_d = vals[:, :N, :k].astype(dtype)
                nn_idx = jnp.maximum(idx[:, :N, :k], 0)
                if do_gather:
                    neigh = target[nn_idx]
                else:
                    neigh = jnp.broadcast_to(target[:N, None, :],
                                             (BATCH, N, k, 3))
                p_w = jnp.einsum('nj,bij->bni', source, Rs) + ts[:, None, :]

                def lane(p_w_l, sq_d_l, idx_l, neigh_l, R, t):
                    if do_tail:
                        corr = correspondence_tail(p_w_l, sq_d_l, idx_l,
                                                   neigh_l, params.corr)
                        sysm = build_system(
                            source, R, t, corr,
                            use_weight_derivative=params.use_weight_derivative,
                            weight_slope=params.corr.weight_slope)
                        H, g = sysm.H, sysm.g
                    else:
                        H = jnp.eye(6, dtype=dtype) * 100.0 + \
                            jnp.sum(p_w_l) * 1e-20
                        g = jnp.ones(6, dtype=dtype) * (1e-3 + jnp.sum(sq_d_l) * 1e-20)
                    if do_solve:
                        analysis = analyze(
                            H, DetectionMethod.SCHUR_CONDITION_NUMBER,
                            params.thresholds, fast=True)
                        dx, _ = solve(H, g, HandlingMethod.PRECONDITIONED_CG,
                                      analysis, params.thresholds,
                                      telemetry=False, fast=True)
                    else:
                        dx = g * 1e-6
                    return dx * 0.1       # damp so ablated variants stay sane

                dx = jax.vmap(lane)(p_w, sq_d, nn_idx,
                                    neigh, Rs, ts)
                Rn, tn = jax.vmap(se3.boxplus)(Rs, ts, dx)
                return Rn, tn

            return jax.lax.fori_loop(0, ITERS, body, (Rs, ts))
        return run

    variants = [
        ("all on            ", (1, 1, 1, 1, 1, 1)),
        ("no rel            ", (0, 1, 1, 1, 1, 1)),
        ("no rel+pair       ", (0, 0, 1, 1, 1, 1)),
        ("no knn kernel     ", (0, 0, 0, 1, 1, 1)),
        ("no gather         ", (0, 0, 0, 0, 1, 1)),
        ("no tail           ", (0, 0, 0, 0, 0, 1)),
        ("empty loop        ", (0, 0, 0, 0, 0, 0)),
        ("knn only          ", (0, 0, 1, 0, 0, 0)),
        ("tail only         ", (0, 0, 0, 1, 1, 0)),
    ]
    for name, flags in variants:
        run = make_loop(*flags)
        dt = timeit(run, R0s, t0s)
        print(f"{name}: {dt*1e3:8.2f} ms  ({dt*1e3/ITERS:6.2f} ms/iter)")


if __name__ == "__main__":
    main()
