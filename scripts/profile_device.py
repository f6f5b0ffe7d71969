"""Device-side microbenchmarks: repeat each op K times inside ONE jit
(fori_loop) so tunnel/dispatch overhead is amortized away (dev tool)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.ops.voxel_grid import build_grid_index, grid_knn
from dcreg_tpu.ops import pallas_knn

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
B = 32
K = 8


def device_time(make_out, q, reps=3, label=""):
    """make_out(q_perturbed) -> scalar; runs K times inside one jit."""
    @jax.jit
    def run(q):
        def body(i, acc):
            return acc + make_out(q + i.astype(q.dtype) * 1e-7)
        return lax.fori_loop(0, K, body, jnp.float32(0.0))
    jax.block_until_ready(run(q))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(run(q))
    ms = (time.perf_counter() - t0) / reps / K * 1e3
    print(f"{label:34s} {ms:9.3f} ms/call")
    return ms


def main():
    dtype = jnp.float32
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    grid = build_grid_index(xyz, 1.0, dtype=dtype)
    target = jnp.asarray(xyz, dtype)
    rng = np.random.default_rng(0)
    q1 = jnp.asarray(xyz + rng.normal(0, 0.2, xyz.shape), dtype)
    qb = jnp.asarray(xyz[None] + rng.normal(0, 0.2, (B,) + xyz.shape), dtype)

    # baseline: trivial op on the same arrays
    device_time(lambda q: jnp.sum(q) * 0 + 1.0, qb, label="noop (batched arrays)")

    # grid_knn single + batched
    device_time(lambda q: jnp.sum(grid_knn(grid, q, k=5)[0][:, 0]),
                q1, label="grid_knn x1")
    device_time(lambda q: jnp.sum(jax.vmap(
        lambda qq: grid_knn(grid, qq, k=5)[0][:, 0])(q)),
        qb, label=f"grid_knn vmap x{B}")

    # pallas brute force batched
    device_time(lambda q: jnp.sum(jax.vmap(
        lambda qq: pallas_knn.knn(qq, target, k=5, kk=8)[0][:, 0])(q)),
        qb, label=f"pallas_knn vmap x{B}")

    # isolate gather of (N, cap) rows from points
    cand = jnp.asarray(rng.integers(0, xyz.shape[0], (B, 7562, 24)), jnp.int32)
    def g1(q):
        c = (cand + (q[0, 0, 0] * 0).astype(jnp.int32))
        return jnp.sum(grid.points[c][..., 0])
    device_time(g1, qb, label="gather points (B,N,24,3)")

    cand2 = jnp.asarray(rng.integers(0, 137781, (B, 7562, 27)), jnp.int32)
    def g2(q):
        c = (cand2 + (q[0, 0, 0] * 0).astype(jnp.int32))
        return jnp.sum(grid.start[c].astype(jnp.float32))
    device_time(g2, qb, label="gather start (B,N,27)")

    # slots arithmetic alone
    cnt = jnp.asarray(rng.integers(0, 3, (B, 7562, 27)), jnp.int32)
    def g3(q):
        c = cnt + (q[0, 0, 0] * 0).astype(jnp.int32)
        cum = jnp.cumsum(c, axis=-1)
        cc = jnp.arange(24, dtype=jnp.int32)
        b = jnp.sum((cum[..., None] <= cc).astype(jnp.int32), axis=-2)
        return jnp.sum(b.astype(jnp.float32))
    device_time(g3, qb, label="slot arithmetic (B,N,27,24)")


if __name__ == "__main__":
    main()
