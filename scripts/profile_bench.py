"""Microbenchmark of the pipeline stages on the real chip (dev tool)."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.ops import se3
from dcreg_tpu.ops.correspondence import find_correspondences, CorrespondenceParams
from dcreg_tpu.ops.gauss_newton import build_system
from dcreg_tpu.ops.degeneracy import analyze, DegeneracyThresholds, DetectionMethod, HandlingMethod, detection_code, handling_code
from dcreg_tpu.ops.solvers import solve
from dcreg_tpu.ops import pallas_knn

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
BATCH = 32

def timeit(fn, *a, reps=10, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / reps * 1e3, out

def main():
    dtype = jnp.float32
    xyz = load_pcd(CYL)["xyz"]
    source = jnp.asarray(xyz, dtype)
    target = source
    print("N = M =", source.shape[0], "backend:", jax.default_backend())

    rng = np.random.default_rng(0)
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    poses = jnp.asarray(nominal[None] * rng.uniform(0.8, 1.2, (BATCH, 6)), dtype)
    Rs = jax.vmap(lambda p: se3.euler_zyx_to_rot(p[0], p[1], p[2]))(poses)
    ts = poses[:, 3:]

    # 0. dispatch round-trip overhead (tiny op)
    tiny = jnp.ones((8, 128), dtype)
    ms, _ = timeit(jax.jit(lambda x: x + 1.0), tiny, reps=20)
    print(f"dispatch round-trip:      {ms:8.3f} ms")

    # 1. single knn
    pw = source @ Rs[0].T + ts[0]
    ms, _ = timeit(jax.jit(lambda q: pallas_knn.knn(q, target, k=5, kk=8)), pw)
    print(f"pallas_knn single:        {ms:8.3f} ms")

    ms, _ = timeit(jax.jit(lambda q: pallas_knn.knn_grouped(q, target, k=5)), pw)
    print(f"pallas_knn_grouped single:{ms:8.3f} ms")

    # 2. batched knn (vmap)
    pws = jnp.einsum('nj,bkj->bnk', source, Rs) + ts[:, None, :]
    ms, _ = timeit(jax.jit(jax.vmap(lambda q: pallas_knn.knn(q, target, k=5, kk=8))), pws)
    print(f"pallas_knn vmap x{BATCH}:     {ms:8.3f} ms  ({ms/BATCH:.3f}/lane)")

    ms, _ = timeit(jax.jit(jax.vmap(lambda q: pallas_knn.knn_grouped(q, target, k=5))), pws)
    print(f"knn_grouped vmap x{BATCH}:    {ms:8.3f} ms  ({ms/BATCH:.3f}/lane)")

    # 3. full correspondence pass, batched
    cp = CorrespondenceParams()
    f = jax.jit(jax.vmap(lambda R, t: find_correspondences(source, R, t, target, params=cp, chunk=2048)))
    ms, corr = timeit(f, Rs, ts)
    print(f"find_correspondences x{BATCH}: {ms:8.3f} ms  ({ms/BATCH:.3f}/lane)")

    # 4. build_system batched
    g = jax.jit(jax.vmap(lambda R, t, c: build_system(source, R, t, c, use_weight_derivative=True, weight_slope=0.9)))
    ms, sysm = timeit(g, Rs, ts, corr)
    print(f"build_system x{BATCH}:        {ms:8.3f} ms")

    # 5. analyze + solve batched
    det = jnp.asarray(detection_code(DetectionMethod.SCHUR_CONDITION_NUMBER), jnp.int32)
    hand = jnp.asarray(handling_code(HandlingMethod.PRECONDITIONED_CG), jnp.int32)
    th = DegeneracyThresholds()
    def an(H, gg):
        a = analyze(H, det, th)
        dx, si = solve(H, gg, hand, a, th, telemetry=False)
        return dx
    ms, _ = timeit(jax.jit(jax.vmap(an)), sysm.H, sysm.g)
    print(f"analyze+solve x{BATCH}:       {ms:8.3f} ms")

    # 6. one full iteration batched
    def it(R, t):
        c = find_correspondences(source, R, t, target, params=cp, chunk=2048)
        s = build_system(source, R, t, c, use_weight_derivative=True, weight_slope=0.9)
        a = analyze(s.H, det, th)
        dx, si = solve(s.H, s.g, hand, a, th, telemetry=False)
        return se3.boxplus(R, t, dx)
    ms, _ = timeit(jax.jit(jax.vmap(it)), Rs, ts)
    print(f"full iteration x{BATCH}:      {ms:8.3f} ms")

    # 7. full ICP, count iterations
    from dcreg_tpu.models.icp import icp_point_to_plane_so3, ICPParams
    params = ICPParams(full_telemetry=False)
    def one(R, t):
        r = icp_point_to_plane_so3(source, target, R, t,
                                   DetectionMethod.SCHUR_CONDITION_NUMBER,
                                   HandlingMethod.PRECONDITIONED_CG, params)
        return r.iterations, r.converged
    ms, out = timeit(jax.jit(jax.vmap(one)), Rs, ts, reps=3)
    iters = np.asarray(out[0])
    print(f"full ICP (no telem) x{BATCH}: {ms:8.3f} ms  iters max={iters.max()} mean={iters.mean():.1f}")

    params2 = ICPParams(full_telemetry=True)
    def one2(R, t):
        r = icp_point_to_plane_so3(source, target, R, t,
                                   DetectionMethod.SCHUR_CONDITION_NUMBER,
                                   HandlingMethod.PRECONDITIONED_CG, params2)
        return r.iterations, r.converged
    ms, out = timeit(jax.jit(jax.vmap(one2)), Rs, ts, reps=3)
    print(f"full ICP (telem) x{BATCH}:    {ms:8.3f} ms")

if __name__ == "__main__":
    main()
