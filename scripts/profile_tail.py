"""Layout investigation for the post-kernel path: where do 18 ms/iter go?

Times, each as ONE jit with a 10-rep in-jit fori_loop (dispatch cancels):
  E0: row gather target[(B,N,k)] alone
  E1: gather + correspondence_tail + build_system (current AoS path)
  E2: SoA gathers: x/y/z[(B,KP,N)] separately (N minor)
  E3: SoA proxy tail: scatter entries + Cardano eigenvalues + cross-product
      eigenvector + residual/weight, all on (B,N) scalar arrays
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.ops.block_sparse import morton_argsort
from dcreg_tpu.ops.correspondence import correspondence_tail
from dcreg_tpu.ops.gauss_newton import build_system

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
B, K, KP, REPS = 32, 5, 8, 10


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    xyz = xyz[morton_argsort(xyz)]
    target = jnp.asarray(xyz, jnp.float32)
    N = target.shape[0]
    params = ICPParams()
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    sq0 = jnp.asarray(rng.uniform(0, 0.5, (B, N, K)).cumsum(-1), jnp.float32)
    p_w = jnp.asarray(xyz[None] + rng.normal(0, 0.05, (B, N, 3)), jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    t = jnp.zeros((B, 3), jnp.float32)

    @jax.jit
    def e0(idx):
        def body(i, acc):
            neigh = target[(idx + i) % N]
            return acc + jnp.sum(neigh)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    @jax.jit
    def e1(idx, sq, p_w):
        def body(i, acc):
            idx_i = (idx + i) % N
            neigh = target[idx_i]
            def lane(p_w_l, sq_l, idx_l, neigh_l, R_l, t_l):
                corr = correspondence_tail(p_w_l, sq_l, idx_l, neigh_l,
                                           params.corr)
                sysm = build_system(target, R_l, t_l, corr,
                                    use_weight_derivative=True,
                                    weight_slope=0.9)
                return sysm.H, sysm.g
            H, g = jax.vmap(lane)(p_w, sq, idx_i, neigh, R, t)
            return acc + jnp.sum(H) + jnp.sum(g)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    tx, ty, tz = target[:, 0], target[:, 1], target[:, 2]
    idx_soa = jnp.asarray(rng.integers(0, N, (B, KP, N)), jnp.int32)

    @jax.jit
    def e2(idx):
        def body(i, acc):
            ii = (idx + i) % N
            return acc + jnp.sum(tx[ii]) + jnp.sum(ty[ii]) + jnp.sum(tz[ii])
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    pwx = jnp.asarray(p_w[..., 0])
    pwy = jnp.asarray(p_w[..., 1])
    pwz = jnp.asarray(p_w[..., 2])

    @jax.jit
    def e3(idx):
        def body(i, acc):
            ii = (idx + i) % N
            xs, ys, zs = tx[ii], ty[ii], tz[ii]          # (B, KP, N)
            m = (jnp.arange(KP) < K).astype(jnp.float32)[None, :, None]
            k = float(K)
            cx = jnp.sum(xs * m, 1) / k
            cy = jnp.sum(ys * m, 1) / k
            cz = jnp.sum(zs * m, 1) / k
            dx_, dy_, dz_ = (xs - cx[:, None]) * m, (ys - cy[:, None]) * m, \
                (zs - cz[:, None]) * m
            sxx = jnp.sum(dx_ * dx_, 1); sxy = jnp.sum(dx_ * dy_, 1)
            sxz = jnp.sum(dx_ * dz_, 1); syy = jnp.sum(dy_ * dy_, 1)
            syz = jnp.sum(dy_ * dz_, 1); szz = jnp.sum(dz_ * dz_, 1)
            # Cardano smallest eigenvalue
            q = (sxx + syy + szz) / 3.0
            b00, b11, b22 = sxx - q, syy - q, szz - q
            p2 = (b00 * b00 + b11 * b11 + b22 * b22
                  + 2 * (sxy * sxy + sxz * sxz + syz * syz)) / 6.0
            p = jnp.sqrt(jnp.maximum(p2, 1e-30))
            detB = (b00 * (b11 * b22 - syz * syz)
                    - sxy * (sxy * b22 - syz * sxz)
                    + sxz * (sxy * syz - b11 * sxz))
            r = jnp.clip(detB / (2 * p * p * p), -1, 1)
            phi = jnp.arccos(r) / 3.0
            lam = q + 2 * p * jnp.cos(phi + 2.0943951)
            # eigenvector: cross of two rows of (S - lam I)
            r0x, r0y, r0z = sxx - lam, sxy, sxz
            r1x, r1y, r1z = sxy, syy - lam, syz
            nx = r0y * r1z - r0z * r1y
            ny = r0z * r1x - r0x * r1z
            nz = r0x * r1y - r0y * r1x
            nn = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-30)
            nx, ny, nz = nx / nn, ny / nn, nz / nn
            d = -(nx * cx + ny * cy + nz * cz)
            res = pwx * nx + pwy * ny + pwz * nz + d      # (B, N)
            w = jnp.maximum(0.0, 1.0 - 0.9 * jnp.abs(res))
            return acc + jnp.sum(w * res)
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    for name, fn, a in [("E0 gather AoS      ", e0, (idx0,)),
                        ("E1 gather+tail AoS ", e1, (idx0, sq0, p_w)),
                        ("E2 gather SoA      ", e2, (idx_soa,)),
                        ("E3 SoA proxy tail  ", e3, (idx_soa,))]:
        dt = timeit(fn, *a)
        print(f"{name}: {dt/REPS*1e3:7.2f} ms/iter")


if __name__ == "__main__":
    main()
