"""Microbenchmark grid_knn internals on TPU (dev tool)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.ops.voxel_grid import build_grid_index, grid_knn, _NEIGHBORHOOD

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"
B = 32

def timeit(fn, *a, reps=10, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / reps * 1e3

def main():
    dtype = jnp.float32
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    grid = build_grid_index(xyz, 1.0, dtype=dtype)
    print("cap =", grid.cap, "cells =", np.prod(grid.dims))
    q = jnp.asarray(xyz + np.random.default_rng(0).normal(0, 0.3, xyz.shape), dtype)
    qb = jnp.broadcast_to(q, (B,) + q.shape) + jnp.linspace(0, 0.1, B)[:, None, None]

    ms = timeit(jax.jit(lambda qq: grid_knn(grid, qq, k=5)), q)
    print(f"grid_knn single:   {ms:8.3f} ms")
    ms = timeit(jax.jit(jax.vmap(lambda qq: grid_knn(grid, qq, k=5))), qb)
    print(f"grid_knn vmap x{B}: {ms:8.3f} ms ({ms/B:.3f}/lane)")

    # stage timings (single lane)
    dims = jnp.asarray(grid.dims, jnp.int32)
    nx, ny, nz = grid.dims
    cap = grid.cap
    M = grid.points.shape[0]

    @jax.jit
    def stage_cells(query):
        qc = jnp.floor((query - grid.origin) / grid.voxel_size).astype(jnp.int32)
        nb = qc[:, None, :] + _NEIGHBORHOOD[None, :, :]
        in_grid = jnp.all((nb >= 0) & (nb < dims[None, None, :]), axis=-1)
        nbc = jnp.clip(nb, 0, dims[None, None, :] - 1)
        flat = (nbc[..., 0] * ny + nbc[..., 1]) * nz + nbc[..., 2]
        return flat, in_grid

    flat, in_grid = jax.block_until_ready(stage_cells(q))
    print(f"cells:             {timeit(stage_cells, q):8.3f} ms")

    @jax.jit
    def stage_csr(flat, in_grid):
        s = grid.start[flat]
        cnt = jnp.where(in_grid, grid.start[flat + 1] - s, 0)
        return s, cnt

    s, cnt = jax.block_until_ready(stage_csr(flat, in_grid))
    print(f"csr lookup:        {timeit(stage_csr, flat, in_grid):8.3f} ms")

    @jax.jit
    def stage_slots(s, cnt):
        cum = jnp.cumsum(cnt, axis=1)
        total = cum[:, -1]
        c = jnp.arange(cap, dtype=jnp.int32)
        b = jnp.sum((cum[:, :, None] <= c[None, None, :]).astype(jnp.int32), axis=1)
        bc = jnp.minimum(b, 26)
        prev = jnp.where(b > 0, jnp.take_along_axis(cum, jnp.maximum(b - 1, 0), axis=1), 0)
        pos = jnp.take_along_axis(s, bc, axis=1) + (c[None, :] - prev)
        valid = c[None, :] < total[:, None]
        return jnp.clip(pos, 0, M - 1), valid

    pos, valid = jax.block_until_ready(stage_slots(s, cnt))
    print(f"slots:             {timeit(stage_slots, s, cnt):8.3f} ms")

    @jax.jit
    def stage_gather_order(pos):
        return grid.order[pos]
    cand = jax.block_until_ready(stage_gather_order(pos))
    print(f"gather order:      {timeit(stage_gather_order, pos):8.3f} ms")

    @jax.jit
    def stage_gather_pts(cand):
        return grid.points[cand]
    cxyz = jax.block_until_ready(stage_gather_pts(cand))
    print(f"gather points:     {timeit(stage_gather_pts, cand):8.3f} ms")

    @jax.jit
    def stage_gather_pts_flat(cand):
        return jnp.take(grid.points, cand.reshape(-1), axis=0).reshape(cand.shape + (3,))
    jax.block_until_ready(stage_gather_pts_flat(cand))
    print(f"gather points 1d:  {timeit(stage_gather_pts_flat, cand):8.3f} ms")

    @jax.jit
    def stage_extract(cxyz, valid, cand, query):
        diff = cxyz - query[:, None, :]
        d = jnp.sum(diff * diff, axis=-1)
        d = jnp.where(valid, d, jnp.inf)
        from dcreg_tpu.ops.voxel_grid import _extract_k_smallest_xla
        return _extract_k_smallest_xla(d, cand, 5)
    jax.block_until_ready(stage_extract(cxyz, valid, cand, q))
    print(f"dist+extract:      {timeit(stage_extract, cxyz, valid, cand, q):8.3f} ms")

if __name__ == "__main__":
    main()
