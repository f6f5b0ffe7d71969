"""Round-3 perf investigation: where does the 610 ms batch go?

Times icp_batch_so3 variants on the real chip:
  - full telemetry (bench default) vs telemetry off
  - pieces of one_iteration in isolation (relevance, pair list, kernel,
    gather+tail+solve) at the bench shapes
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
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.ops.block_sparse import build_block_index, morton_argsort
from dcreg_tpu.ops import se3

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
BATCH = 32


def bench_fn(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    dtype = jnp.float32
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    perm = morton_argsort(xyz)
    xyz = xyz[perm]
    source = jnp.asarray(xyz, dtype)
    target = source
    index = build_block_index(xyz, dtype=dtype, tb=128)
    T_gt = jnp.eye(4, dtype=dtype)
    params = ICPParams()

    rng = np.random.default_rng(0)
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    poses = nominal[None, :] * rng.uniform(0.8, 1.2, (BATCH, 6))
    R0s = jnp.stack([se3.euler_zyx_to_rot(*map(jnp.asarray, p[:3]))
                     for p in poses]).astype(dtype)
    t0s = jnp.asarray(poses[:, 3:], dtype)
    P = estimate_num_pairs(
        index, xyz, [(np.asarray(R0s[i], np.float64), poses[i, 3:])
                     for i in range(BATCH)], params.corr.search_radius)
    print("num_pairs:", P)

    def run(p):
        def f(R0s_, t0s_):
            return icp_batch_so3(source, target, R0s_, t0s_,
                                 DetectionMethod.SCHUR_CONDITION_NUMBER,
                                 HandlingMethod.PRECONDITIONED_CG, p,
                                 index, P, T_gt=T_gt)
        return f

    dt, out = bench_fn(run(params), R0s, t0s)
    print(f"full_telemetry=True : {dt*1e3:8.2f} ms  "
          f"({BATCH/dt:.1f} reg/s) iters={np.asarray(out.iterations).mean()}")

    p2 = params._replace(full_telemetry=False) if hasattr(params, "_replace") \
        else params
    try:
        import dataclasses
        p2 = dataclasses.replace(params, full_telemetry=False)
    except TypeError:
        pass
    dt, out = bench_fn(run(p2), R0s, t0s)
    print(f"full_telemetry=False: {dt*1e3:8.2f} ms  ({BATCH/dt:.1f} reg/s)")

    # ---- pieces -----------------------------------------------------------
    from dcreg_tpu.ops.pallas_block_knn import (QB, batched_block_knn,
                                                lane_relevance, make_pair_list)
    N = source.shape[0]
    nq = -(-N // QB)
    src_pad = jnp.concatenate(
        [source, jnp.broadcast_to(source[-1:], (nq * QB - N, 3))])
    src_q = src_pad.reshape(nq, QB, 3)
    src_blocks = src_q.transpose(0, 2, 1)
    slo = jnp.min(src_q, axis=1)
    shi = jnp.max(src_q, axis=1)
    radius = params.corr.search_radius

    rel_fn = jax.jit(lambda Rs, ts: lane_relevance(
        slo, shi, Rs, ts, index.lo, index.hi, radius))
    dt, rel = bench_fn(rel_fn, R0s, t0s)
    print(f"lane_relevance      : {dt*1e3:8.2f} ms")

    mpl_fn = jax.jit(lambda r: make_pair_list(r, P))
    dt, (qid, tid, ovf) = bench_fn(mpl_fn, rel)
    print(f"make_pair_list      : {dt*1e3:8.2f} ms")

    poses12 = jnp.concatenate([R0s.reshape(BATCH, 9), t0s], axis=1)
    knn_fn = jax.jit(lambda p12, q, t: batched_block_knn(
        index, src_blocks, p12, q, t, P, covered=jnp.any(rel, axis=1)))
    dt, (vals, idx) = bench_fn(knn_fn, poses12.astype(jnp.float32), qid, tid)
    print(f"batched_block_knn   : {dt*1e3:8.2f} ms")

    from dcreg_tpu.ops.correspondence import correspondence_tail
    from dcreg_tpu.ops.gauss_newton import build_system
    from dcreg_tpu.ops.degeneracy import analyze
    from dcreg_tpu.ops.solvers import solve
    k = params.corr.k

    @jax.jit
    def tail(vals, idx, Rs, ts):
        sq_d = vals[:, :N, :k].astype(dtype)
        nn_idx = jnp.maximum(idx[:, :N, :k], 0)
        neigh = target[nn_idx]
        p_w = jnp.einsum('nj,bij->bni', source, Rs) + ts[:, None, :]

        def lane(p_w_l, sq_d_l, idx_l, neigh_l, R, t):
            corr = correspondence_tail(p_w_l, sq_d_l, idx_l, neigh_l,
                                       params.corr)
            sysm = build_system(source, R, t, corr,
                                use_weight_derivative=params.use_weight_derivative,
                                weight_slope=params.corr.weight_slope)
            analysis = analyze(sysm.H, DetectionMethod.SCHUR_CONDITION_NUMBER,
                               params.thresholds, fast=True)
            dx, _ = solve(sysm.H, sysm.g, HandlingMethod.PRECONDITIONED_CG,
                          analysis, params.thresholds, telemetry=False,
                          fast=True)
            return dx
        return jax.vmap(lane)(p_w, sq_d, nn_idx, neigh, Rs, ts)

    dt, _ = bench_fn(tail, vals, idx, R0s, t0s)
    print(f"gather+tail+solve   : {dt*1e3:8.2f} ms")

    # gather alone
    @jax.jit
    def gather_only(vals, idx):
        nn_idx = jnp.maximum(idx[:, :N, :k], 0)
        return target[nn_idx]
    dt, _ = bench_fn(gather_only, vals, idx)
    print(f"neighbor gather     : {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
