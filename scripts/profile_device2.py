"""Device-side stage costs of the full ICP iteration (dev tool)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.ops import se3
from dcreg_tpu.ops.correspondence import (CorrespondenceParams,
                                          find_correspondences, fit_planes)
from dcreg_tpu.ops.gauss_newton import build_system
from dcreg_tpu.ops.degeneracy import (analyze, DegeneracyThresholds,
                                      DetectionMethod, HandlingMethod,
                                      detection_code, handling_code)
from dcreg_tpu.ops.solvers import solve
from dcreg_tpu.ops import pallas_knn

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
B = 32
K = 8

def device_time(make_out, args, reps=3, label=""):
    @jax.jit
    def run(args):
        def body(i, acc):
            return acc + make_out(args, i)
        return lax.fori_loop(0, K, body, jnp.float32(0.0))
    jax.block_until_ready(run(args))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(run(args))
    ms = (time.perf_counter() - t0) / reps / K * 1e3
    print(f"{label:38s} {ms:9.3f} ms/call", flush=True)
    return ms

def main():
    dtype = jnp.float32
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    target = jnp.asarray(xyz, dtype)
    source = target
    N = xyz.shape[0]
    rng = np.random.default_rng(0)
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    poses = jnp.asarray(nominal[None] * rng.uniform(0.8, 1.2, (B, 6)), dtype)
    Rs = jax.vmap(lambda p: se3.euler_zyx_to_rot(p[0], p[1], p[2]))(poses)
    ts = poses[:, 3:]
    cp = CorrespondenceParams()
    th = DegeneracyThresholds()

    def jitter(x, i):
        return x + i.astype(x.dtype) * 1e-7

    # A. knn kernel only
    def knn_only(args, i):
        Rb, tb = args
        pw = jnp.einsum('nj,bkj->bnk', source, jitter(Rb, i)) + tb[:, None]
        d, idx = jax.vmap(lambda q: pallas_knn.knn(q, target, k=5, kk=8))(pw)
        return jnp.sum(d[:, :, 0])
    device_time(knn_only, (Rs, ts), label="A knn kernel (incl rerank+gather)")

    # precompute corr for downstream stages
    corr = jax.jit(jax.vmap(lambda R, t: find_correspondences(
        source, R, t, target, params=cp)))(Rs, ts)

    # B. post-knn correspondence (plane fit etc) with fixed idx
    idx_fixed = corr.nn_idx
    def post_knn(args, i):
        Rb, tb, idx = args
        pw = jnp.einsum('nj,bkj->bnk', source, jitter(Rb, i)) + tb[:, None]
        neigh = target[idx]          # (B, N, 5, 3) gather
        def lane(pwl, neighl):
            normal, d_off, fit_ok = fit_planes(neighl)
            pd = jnp.einsum('nkj,nj->nk', neighl, normal) + d_off[:, None]
            res = jnp.einsum('nj,nj->n', pwl, normal) + d_off
            return jnp.sum(res) + jnp.sum(pd)
        return jnp.sum(jax.vmap(lane)(pw, neigh))
    device_time(post_knn, (Rs, ts, idx_fixed), label="B plane fit + gather neigh")

    # B2. gather only
    def gath(args, i):
        _, _, idx = args
        idx = idx + (i * 0)
        return jnp.sum(target[idx][..., 0])
    device_time(gath, (Rs, ts, idx_fixed), label="B2 gather neigh only")

    # C. build_system
    def bs(args, i):
        Rb, tb, c = args
        out = jax.vmap(lambda R, t, cc: build_system(
            source, jitter(R, i), t, cc, use_weight_derivative=True,
            weight_slope=0.9))(Rb, tb, c)
        return jnp.sum(out.H) + jnp.sum(out.g)
    device_time(bs, (Rs, ts, corr), label="C build_system")

    sysm = jax.jit(jax.vmap(lambda R, t, c: build_system(
        source, R, t, c, use_weight_derivative=True, weight_slope=0.9)))(
            Rs, ts, corr)

    # D. analyze+solve generic (traced codes)
    det = jnp.asarray(detection_code(DetectionMethod.SCHUR_CONDITION_NUMBER), jnp.int32)
    hand = jnp.asarray(handling_code(HandlingMethod.PRECONDITIONED_CG), jnp.int32)
    def an_gen(args, i):
        H, g = args
        def lane(Hl, gl):
            a = analyze(jitter(Hl, i), det, th)
            dx, _ = solve(jitter(Hl, i), gl, hand, a, th, telemetry=False)
            return jnp.sum(dx)
        return jnp.sum(jax.vmap(lane)(H, g))
    device_time(an_gen, (sysm.H, sysm.g), label="D analyze+solve generic")

    # E. analyze+solve fast (static enums)
    def an_fast(args, i):
        H, g = args
        def lane(Hl, gl):
            a = analyze(jitter(Hl, i), DetectionMethod.SCHUR_CONDITION_NUMBER,
                        th, fast=True)
            dx, _ = solve(jitter(Hl, i), gl,
                          HandlingMethod.PRECONDITIONED_CG, a, th,
                          telemetry=False, fast=True)
            return jnp.sum(dx)
        return jnp.sum(jax.vmap(lane)(H, g))
    device_time(an_fast, (sysm.H, sysm.g), label="E analyze+solve fast")

    # F. boxplus + convergence + history writes (loop plumbing)
    def plumbing(args, i):
        H, g = args
        def lane(Hl, gl):
            dx = gl * 1e-3
            Rn, tn = se3.boxplus(jnp.eye(3, dtype=dtype) + jitter(Hl[:3, :3], i) * 0,
                                 gl[:3] * 0, dx)
            conv = (jnp.linalg.norm(dx[:3]) < 1e-4) & (jnp.linalg.norm(dx[3:]) < 1e-3)
            return jnp.sum(Rn) + jnp.sum(tn) + conv.astype(dtype)
        return jnp.sum(jax.vmap(lane)(H, g))
    device_time(plumbing, (sysm.H, sysm.g), label="F boxplus+conv")

    # G. full fast iteration (grid=None, brute knn)
    def full_fast(args, i):
        Rb, tb = args
        def lane(R, t):
            c = find_correspondences(source, jitter(R, i), t, target, params=cp)
            s = build_system(source, R, t, c, use_weight_derivative=True,
                             weight_slope=0.9)
            a = analyze(s.H, DetectionMethod.SCHUR_CONDITION_NUMBER, th, fast=True)
            dx, _ = solve(s.H, s.g, HandlingMethod.PRECONDITIONED_CG, a, th,
                          telemetry=False, fast=True)
            Rn, tn = se3.boxplus(R, t, dx)
            return jnp.sum(Rn) + jnp.sum(tn)
        return jnp.sum(jax.vmap(lane)(Rb, tb))
    device_time(full_fast, (Rs, ts), label="G full fast iteration (brute knn)")

if __name__ == "__main__":
    main()
