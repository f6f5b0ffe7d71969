"""Map-scale (two-level, slotted) kernel mode + batched engine tests.

The slotted id scheme lifts the old 2^15-candidate cap
(ops/pallas_block_knn.py): index bits cover only max_per_query * TB
slot-local ids, so any number of target blocks is supported.  These tests
run a 200k-point map -- 6x beyond the old cap -- against brute force, and
the full batched engine in map mode against ground truth and against the
classic path on a small map.  Reference workload: scans of 1-10k points
against 53M-241M-point prior maps (supp.pdf Tables II/III;
DCReg/src/icp_test_runner.cpp:1722 KD-queries an arbitrary-size target).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcreg_tpu.ops.block_sparse import (build_block_index, build_map_index,
                                        kd_block_order, morton_argsort)
from dcreg_tpu.ops.pallas_block_knn import (QB, TB, batched_block_knn,
                                            hier_relevance,
                                            make_pair_list_slotted,
                                            pack_lane_mask, super_candidates)
from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.models.icp_batch import (estimate_map_capacities,
                                        estimate_num_pairs, icp_batch_so3)
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.ops import se3

RNG = np.random.default_rng(23)


def _euler(r, p, y):
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), \
        np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _terrain(m, extent=60.0, seed=5):
    """A structured world: undulating ground + wall strips (well beyond the
    old 2^15-point kernel cap when m > 32768)."""
    rng = np.random.default_rng(seed)
    g = int(m * 0.7)
    xy = rng.uniform(-extent, extent, (g, 2))
    z = 0.4 * np.sin(0.25 * xy[:, 0]) * np.cos(0.2 * xy[:, 1]) \
        + rng.normal(0, 0.01, g)
    ground = np.column_stack([xy, z])
    w = m - g
    wx = rng.uniform(-extent, extent, w)
    wy = np.where(rng.random(w) < 0.5, -extent * 0.6, extent * 0.6) \
        + rng.normal(0, 0.02, w)
    wz = rng.uniform(0, 4, w)
    wall = np.column_stack([wx, wy, wz])
    return np.vstack([ground, wall]).astype(np.float32)


class TestSlottedKernelMapScale:
    def test_vs_brute_force_200k(self):
        """200k-point map (old cap: 32768), 1 lane + 2 lanes, slotted ids."""
        M = 200_000
        world = _terrain(M)
        perm = morton_argsort(world)
        world = world[perm]
        mindex = build_map_index(world, dtype=jnp.float32, tb=TB, sb=16)
        assert mindex.block.num_blocks * TB > (1 << 15)

        # scan: points near a pose in the world, in body frame
        center = np.array([5.0, -3.0, 0.5])
        near = world[np.linalg.norm(world - center, axis=1) < 12.0]
        scan_w = near[RNG.choice(near.shape[0], 800, replace=False)]
        B = 2
        radius = 1.0
        Rs = np.stack([_euler(*RNG.uniform(-0.03, 0.03, 3))
                       for _ in range(B)]).astype(np.float32)
        ts = (center[None] + RNG.uniform(-0.3, 0.3, (B, 3))).astype(
            np.float32)
        # body-frame scan for lane 0's pose; all lanes query their own
        # transform of the same body cloud
        scan = ((scan_w - ts[0]) @ Rs[0]).astype(np.float32)
        sperm = morton_argsort(scan)
        scan = scan[sperm]

        n = scan.shape[0]
        nq = -(-n // QB)
        src_pad = np.concatenate(
            [scan, np.repeat(scan[-1:], nq * QB - n, axis=0)])
        src_q = src_pad.reshape(nq, QB, 3)
        src_blocks = jnp.asarray(src_q.transpose(0, 2, 1))
        slo = jnp.asarray(src_q.min(axis=1))
        shi = jnp.asarray(src_q.max(axis=1))

        S, G, P = estimate_map_capacities(
            mindex, scan, [(Rs[b], ts[b]) for b in range(B)], radius)
        sup_sel, sup_ok, sup_ovf = super_candidates(
            slo, shi, jnp.asarray(Rs), jnp.asarray(ts), mindex,
            radius, S)
        assert int(sup_ovf) == 0
        rel_l, block_ids = hier_relevance(slo, shi, jnp.asarray(Rs),
                                          jnp.asarray(ts), mindex,
                                          sup_sel, sup_ok, radius)
        rel = jnp.any(rel_l, axis=0)
        qid, tid, slot, col, table, ovf, run_ovf = make_pair_list_slotted(
            rel, P, G, block_ids=block_ids, nbt=mindex.block.num_blocks)
        assert int(ovf) == 0 and int(run_ovf) == 0
        lmask = pack_lane_mask(rel_l, qid, col)

        poses = jnp.asarray(np.concatenate([Rs.reshape(B, 9), ts], axis=1))
        vals, idx = batched_block_knn(
            mindex.block, src_blocks, poses, qid, tid, num_pairs=P,
            radius=radius, covered=jnp.any(rel, axis=1), lane_mask=lmask,
            interpret=True, slot=slot, tid_table=table, max_per_query=G)
        vals = np.asarray(vals)[:, :n]
        idx = np.asarray(idx)[:, :n]

        for b in range(B):
            q = scan @ Rs[b].T + ts[b]
            # brute force against the whole 200k map, subsampled rows
            for row in range(0, n, 53):
                full = np.sum((q[row][None, :] - world) ** 2, axis=-1)
                order = np.argsort(full)[:5]
                for j in range(5):
                    d_true = full[order[j]]
                    if d_true <= radius * radius:
                        tol = max(2.0 ** -11 * d_true, 5e-6)
                        got = full[idx[b, row, j]]
                        assert abs(got - d_true) < tol, \
                            (b, row, j, got, d_true)
                        assert abs(vals[b, row, j] - d_true) < \
                            1e-3 * max(1.0, d_true)

    def test_slotted_pair_list_drop_and_table(self):
        """Per-run capacity: pairs beyond max_per_query are dropped (and
        counted), the slot table maps back to global blocks."""
        rel = jnp.zeros((3, 7), bool)
        rel = rel.at[0, 1].set(True).at[0, 4].set(True).at[0, 6].set(True)
        rel = rel.at[2, 3].set(True)
        qid, tid, slot, col, tbl, ovf, run_ovf = make_pair_list_slotted(
            rel, 8, 2)
        qid, tid, slot, tbl = map(np.asarray, (qid, tid, slot, tbl))
        assert int(run_ovf) == 1          # third pair of row 0 dropped
        assert int(ovf) == 0
        # kept pairs: (0,1,s0) (0,4,s1) (2,3,s0)
        keep = qid < 3
        assert keep.sum() == 3
        assert tbl[0, 0] == 1 and tbl[0, 1] == 4
        assert tbl[2, 0] == 3

    def test_batched_engine_map_mode_matches_classic(self):
        """Map mode == classic mode on a small map (same kernel math,
        different id packing)."""
        world = _terrain(6000, extent=15.0)
        perm = morton_argsort(world)
        world = jnp.asarray(world[perm], jnp.float32)
        index = build_block_index(world, dtype=jnp.float32, tb=128)
        mindex = build_map_index(world, dtype=jnp.float32, tb=128, sb=8)
        params = ICPParams(max_iterations=12)

        B = 2
        rng = np.random.default_rng(3)
        Rs = jnp.asarray(np.stack(
            [_euler(*rng.uniform(-0.01, 0.01, 3)) for _ in range(B)]),
            jnp.float32)
        ts = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3)), jnp.float32)
        poses_np = [(np.asarray(Rs[b]), np.asarray(ts[b])) for b in range(B)]

        P = estimate_num_pairs(index, np.asarray(world), poses_np,
                               params.corr.search_radius)
        S, G, Pm = estimate_map_capacities(mindex, np.asarray(world),
                                           poses_np,
                                           params.corr.search_radius)
        out_c = icp_batch_so3(world, world, Rs, ts,
                              DetectionMethod.SCHUR_CONDITION_NUMBER,
                              HandlingMethod.PRECONDITIONED_CG, params,
                              index, P)
        out_m = icp_batch_so3(world, world, Rs, ts,
                              DetectionMethod.SCHUR_CONDITION_NUMBER,
                              HandlingMethod.PRECONDITIONED_CG, params,
                              mindex, Pm, num_supers=S, max_per_query=G)
        assert int(out_m.pair_overflow) == 0
        np.testing.assert_array_equal(np.asarray(out_c.converged),
                                      np.asarray(out_m.converged))
        np.testing.assert_allclose(np.asarray(out_c.t), np.asarray(out_m.t),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_c.R), np.asarray(out_m.R),
                                   atol=1e-5)

    def test_batched_engine_200k_map_converges(self):
        """End-to-end: 800-pt scan vs 200k-pt map, B=2 lanes, map mode,
        kd-leaf block layout (the seam-free production ordering)."""
        M = 200_000
        world = _terrain(M)
        world = world[kd_block_order(world, 128)]
        center = np.array([5.0, -3.0, 0.5])
        near = world[np.linalg.norm(world - center, axis=1) < 12.0]
        scan_w = near[RNG.choice(near.shape[0], 800, replace=False)]
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3] = _euler(0.0, 0.0, 0.01)
        T_gt[:3, 3] = center
        scan = ((scan_w - T_gt[:3, 3]) @ T_gt[:3, :3]).astype(np.float32)
        # kd-leaf order: no query block straddles a space-filling seam
        scan = scan[kd_block_order(scan, 128)]

        mindex = build_map_index(world, dtype=jnp.float32, tb=128, sb=16)
        params = ICPParams(max_iterations=15)
        B = 2
        rng = np.random.default_rng(9)
        dR = np.stack([_euler(*rng.uniform(-0.02, 0.02, 3))
                       for _ in range(B)])
        Rs = jnp.asarray(np.einsum("ij,bjk->bik", T_gt[:3, :3], dR),
                         jnp.float32)
        ts = jnp.asarray(T_gt[None, :3, 3] + rng.uniform(-0.2, 0.2, (B, 3)),
                         jnp.float32)
        poses_np = [(np.asarray(Rs[b]), np.asarray(ts[b])) for b in range(B)]
        S, G, P = estimate_map_capacities(mindex, scan, poses_np,
                                          params.corr.search_radius)
        out = icp_batch_so3(jnp.asarray(scan), jnp.asarray(world), Rs, ts,
                            DetectionMethod.SCHUR_CONDITION_NUMBER,
                            HandlingMethod.PRECONDITIONED_CG, params,
                            mindex, P, T_gt=jnp.asarray(T_gt),
                            num_supers=S, max_per_query=G)
        assert int(out.pair_overflow) == 0
        assert bool(np.asarray(out.converged).all())
        errs = [se3.pose_error(jnp.asarray(T_gt),
                               se3.se3_matrix(out.R[b], out.t[b]))
                for b in range(B)]
        te = np.asarray([float(e[0]) for e in errs])
        re = np.asarray([float(e[1]) for e in errs])
        assert (te < 0.05).all(), te
        assert (re < 0.5).all(), re


    def test_reuse_pair_list_matches_per_iteration(self):
        """B=1 static pair list (computed once at an inflated radius,
        in-jit motion guard) equals the per-iteration cull path."""
        rng = np.random.default_rng(77)    # own stream: the shared RNG
        # state depends on test order
        world = _terrain(60_000, extent=40.0)
        world = world[kd_block_order(world, 128)]
        center = np.array([8.0, -5.0, 0.5])
        near = world[np.linalg.norm(world - center, axis=1) < 10.0]
        scan_w = near[rng.choice(near.shape[0], 900, replace=False)]
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, 3] = center
        scan = (scan_w - center).astype(np.float32)
        scan = scan[kd_block_order(scan, 128)]

        mindex = build_map_index(jnp.asarray(world), dtype=jnp.float32,
                                 tb=128, sb=16)
        params = ICPParams(max_iterations=20)
        R0 = jnp.asarray(np.eye(3), jnp.float32)[None]
        t0 = jnp.asarray(center[None] + [0.05, -0.04, 0.02], jnp.float32)
        r0, margin = 0.35, 0.4
        S, G, P = estimate_map_capacities(
            mindex, scan, [(np.asarray(R0[0], np.float64),
                            np.asarray(t0[0]))], r0 + margin)
        common = dict(T_gt=jnp.asarray(T_gt), num_supers=S,
                      max_per_query=G, initial_cull_radius=r0)
        out_a = icp_batch_so3(jnp.asarray(scan), jnp.asarray(world), R0, t0,
                              DetectionMethod.SCHUR_CONDITION_NUMBER,
                              HandlingMethod.PRECONDITIONED_CG, params,
                              mindex, P, **common)
        out_b = icp_batch_so3(jnp.asarray(scan), jnp.asarray(world), R0, t0,
                              DetectionMethod.SCHUR_CONDITION_NUMBER,
                              HandlingMethod.PRECONDITIONED_CG, params,
                              mindex, P, reuse_pair_list=margin, **common)
        assert int(out_b.pair_overflow) == 0
        assert bool(out_b.converged.all())
        np.testing.assert_allclose(np.asarray(out_a.t), np.asarray(out_b.t),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_a.R), np.asarray(out_b.R),
                                   atol=1e-6)
        assert int(out_a.iterations[0]) == int(out_b.iterations[0])


    def test_wide_fov_sparse_scan_past_256_slots(self):
        """A sparse wide-FoV scan against a much denser map legitimately
        needs > 256 target blocks per query block (the old 2^15
        candidate-id wall, VERDICT r4 item 8): with MAX_INDEX_BITS=18 the
        slotted kernel packs the wider ids at a still-negligible distance
        quantization and the registration succeeds."""
        rng = np.random.default_rng(41)
        # dense small-area map: ~350 pts/m^2 over 35 x 35 m
        m = 430_000
        half = 17.5
        xy = rng.uniform(-half, half, (m, 2))
        z = 0.25 * np.sin(0.5 * xy[:, 0]) * np.cos(0.45 * xy[:, 1]) \
            + rng.normal(0, 0.004, m)
        world = np.column_stack([xy, z + 9.0]).astype(np.float32)
        world = world[kd_block_order(world, 128)]
        mindex = build_map_index(world, dtype=jnp.float32, tb=TB, sb=32)

        # sparse scan: 640 points spread over the WHOLE map extent ->
        # ~10 m-wide kd leaves, each meeting tens of thousands of
        # candidate map points at the cull radius
        sel = world[rng.choice(m, 640, replace=False)]
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, 3] = [0.3, -0.2, 0.0]
        scan = ((sel - T_gt[:3, 3])
                + rng.normal(0, 0.004, sel.shape)).astype(np.float32)
        scan = scan[kd_block_order(scan, 128)]

        R0 = jnp.eye(3, dtype=jnp.float32)[None]
        t0 = jnp.asarray(T_gt[:3, 3][None] + [0.04, -0.03, 0.02],
                         jnp.float32)
        r0 = 0.4
        S, G, P = estimate_map_capacities(
            mindex, scan, [(np.eye(3), np.asarray(t0[0]))], r0,
            include_identity=False)
        assert G > 256, G          # the regime the old cap rejected
        params = ICPParams(max_iterations=10)
        out = icp_batch_so3(jnp.asarray(scan), jnp.asarray(world), R0, t0,
                            DetectionMethod.SCHUR_CONDITION_NUMBER,
                            HandlingMethod.PRECONDITIONED_CG, params,
                            mindex, P, T_gt=jnp.asarray(T_gt),
                            num_supers=S, max_per_query=G,
                            initial_cull_radius=r0)
        assert int(out.pair_overflow) == 0
        assert bool(out.converged[0])
        te, re = se3.pose_error(jnp.asarray(T_gt),
                                se3.se3_matrix(out.R[0], out.t[0]))
        assert float(te) < 0.03, float(te)
        assert float(re) < 0.3, float(re)
