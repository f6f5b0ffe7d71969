"""TPU-device payload run by test_tpu_device.py in a SUBPROCESS.

The main pytest process pins jax_platforms=cpu (conftest.py), which makes
every Pallas kernel silently flip to interpret mode -- a Mosaic lowering
bug can then pass the whole suite while crashing on hardware (this is
exactly what happened in round 2: f32 tpu.iota, BENCH_r02.json rc=1).
This payload runs on the DEFAULT backend; it exits 42 (-> pytest skip)
if that backend is not a TPU, otherwise it:

  1. compiles + runs the fused Pallas k-NN kernel non-interpreted and
     checks it against a brute-force oracle;
  2. compiles + runs the batched block-sparse pair-list kernel
     (pallas_block_knn) non-interpreted, same oracle;
  3. runs the full batched MC engine (icp_batch_so3, B=4) on the cylinder
     pair on-device in f32 and asserts the reference error envelope
     (TE < 5 cm, RE < 0.5 deg vs the recorded 2.71 cm / 0.05 deg,
     supp.pdf Table I "Ours" row).

Any assertion/compile failure exits nonzero -> the wrapper test fails.
"""
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: default backend is {jax.default_backend()!r}, not TPU")
        return 42
    import dcreg_tpu
    dcreg_tpu.enable_compile_cache(jax.default_backend())
    from dcreg_tpu.io.pcd import load_pcd
    from dcreg_tpu.models.icp import ICPParams
    from dcreg_tpu.models.icp_batch import icp_batch_so3, estimate_num_pairs
    from dcreg_tpu.ops import se3
    from dcreg_tpu.ops.block_sparse import build_block_index, morton_argsort
    from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
    from dcreg_tpu.ops.knn import knn as brute_knn
    from dcreg_tpu.ops.pallas_block_knn import (QB, batched_block_knn,
                                                lane_relevance,
                                                make_pair_list)
    from dcreg_tpu.ops.pallas_knn import knn as fused_knn

    dtype = jnp.float32
    xyz = np.asarray(load_pcd(
        "/root/reference/results/simulation/table3_fig9_fig10/"
        "target_clouds.pcd")["xyz"])
    perm = morton_argsort(xyz)
    xyz = xyz[perm]
    pts = jnp.asarray(xyz, dtype)
    N = pts.shape[0]
    k = 5

    # ---- 1. fused Pallas k-NN, non-interpreted -------------------------
    d_ref, i_ref = brute_knn(pts[:256], pts, k=k)
    d_pal, i_pal = fused_knn(pts[:256], pts, k=k, interpret=False)
    d_pal, i_pal = np.asarray(d_pal), np.asarray(i_pal)
    match = np.mean(np.sort(i_pal, -1) == np.sort(np.asarray(i_ref), -1))
    assert match > 0.999, f"fused_knn index mismatch: {match}"
    assert np.allclose(np.asarray(d_ref), d_pal, rtol=1e-3, atol=1e-5), \
        "fused_knn distances diverge from brute force"
    print("fused_knn on-device: OK")

    # ---- 2. batched block-sparse pair-list kernel ----------------------
    index = build_block_index(xyz, dtype=dtype, tb=128)
    nq = -(-N // QB)
    src_pad = jnp.concatenate(
        [pts, jnp.broadcast_to(pts[-1:], (nq * QB - N, 3))])
    src_q = src_pad.reshape(nq, QB, 3)
    src_blocks = src_q.transpose(0, 2, 1)
    slo, shi = jnp.min(src_q, axis=1), jnp.max(src_q, axis=1)
    B = 2
    rng = np.random.default_rng(3)
    Rs = jnp.stack([jnp.asarray(se3.exp_so3(
        jnp.asarray(rng.normal(0, 0.02, 3), dtype)))
        for _ in range(B)])
    ts = jnp.asarray(rng.normal(0, 0.3, (B, 3)), dtype)
    radius = 1.0
    rel = lane_relevance(slo, shi, Rs, ts, index.lo, index.hi, radius)
    P = int(-(-int(jnp.sum(rel)) * 1.2 // 64) * 64)
    qid, tid, ovf = make_pair_list(rel, P)
    assert int(ovf) == 0
    poses12 = jnp.concatenate([Rs.reshape(B, 9), ts], axis=1)
    vals, idx = batched_block_knn(index, src_blocks, poses12, qid, tid, P,
                                  radius=radius,
                                  covered=jnp.any(rel, axis=1),
                                  interpret=False)
    vals, idx = np.asarray(vals), np.asarray(idx)
    # oracle: brute-force per lane, compare within radius
    for b in range(B):
        q = np.asarray(pts) @ np.asarray(Rs[b]).T + np.asarray(ts[b])
        d_o, i_o = brute_knn(jnp.asarray(q, dtype), pts, k=k)
        d_o, i_o = np.asarray(d_o), np.asarray(i_o)
        # all 5 true NN must be inside the fixed-point clamp region (and
        # clear of the block-cull edge) for the returned ids to be exact;
        # beyond the radius gate the kernel's order is arbitrary by design
        in_r = d_o[:, 4] <= radius * radius * 0.81
        got = np.sort(idx[b, :N, :k], -1)
        want = np.sort(i_o, -1)
        ok = np.mean(np.all(got[in_r] == want[in_r], axis=-1))
        assert ok > 0.999, f"lane {b}: block kNN mismatch frac {1-ok}"
    print("batched_block_knn on-device: OK")

    # ---- 3. full batched engine on-device ------------------------------
    params = ICPParams()
    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    poses = nominal[None, :] * rng.uniform(0.8, 1.2, (4, 6))
    R0s = jnp.stack([se3.euler_zyx_to_rot(*map(jnp.asarray, p[:3]))
                     for p in poses]).astype(dtype)
    t0s = jnp.asarray(poses[:, 3:], dtype)
    P = estimate_num_pairs(
        index, xyz, [(np.asarray(R0s[i], np.float64), poses[i, 3:])
                     for i in range(4)], params.corr.search_radius)
    out = icp_batch_so3(pts, pts, R0s, t0s,
                        DetectionMethod.SCHUR_CONDITION_NUMBER,
                        HandlingMethod.PRECONDITIONED_CG, params,
                        index, P, T_gt=jnp.eye(4, dtype=dtype))
    out = jax.block_until_ready(out)
    assert int(out.pair_overflow) == 0
    assert bool(np.all(np.asarray(out.converged))), "not all lanes converged"
    iters = np.asarray(out.iterations)
    te = np.asarray(out.log.trans_error)[np.arange(4), iters - 1]
    re = np.asarray(out.log.rot_error_deg)[np.arange(4), iters - 1]
    assert te.mean() < 0.05, f"TE {te.mean()} >= 5 cm"
    assert re.mean() < 0.5, f"RE {re.mean()} >= 0.5 deg"
    print(f"icp_batch_so3 on-device: OK (TE {te.mean()*100:.2f} cm, "
          f"RE {re.mean():.3f} deg, iters {iters.tolist()})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
