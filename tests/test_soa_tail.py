"""SoA fused tail (ops/soa_tail.py) vs the AoS reference path.

The SoA path re-derives correspondence_tail + build_system with point-minor
layouts; this pins it to the vmapped AoS implementation on random clouds:
identical validity masks and f32-close H/g/stats.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.ops.correspondence import correspondence_tail
from dcreg_tpu.ops.gauss_newton import build_system
from dcreg_tpu.ops.knn import knn
from dcreg_tpu.ops.soa_tail import batched_tail_system
from dcreg_tpu.ops import se3

RNG = np.random.default_rng(11)


def test_soa_matches_aos():
    N, M, B, k = 700, 900, 3, 5
    # a noisy plane-ish scene so plane fits and gates all activate
    target = np.stack([RNG.uniform(-5, 5, M), RNG.uniform(-5, 5, M),
                       0.05 * RNG.normal(size=M)], axis=1).astype(np.float32)
    source = np.stack([RNG.uniform(-5, 5, N), RNG.uniform(-5, 5, N),
                       0.05 * RNG.normal(size=N)], axis=1).astype(np.float32)
    Rs = jnp.stack([jnp.asarray(se3.exp_so3(
        jnp.asarray(RNG.normal(0, 0.03, 3), jnp.float32)))
        for _ in range(B)])
    ts = jnp.asarray(RNG.normal(0, 0.2, (B, 3)), jnp.float32)
    params = ICPParams()

    target_j = jnp.asarray(target)
    source_j = jnp.asarray(source)

    def aos_lane(R, t):
        p_w = source_j @ R.T + t
        sq_d, idx = knn(p_w, target_j, k=k)
        corr = correspondence_tail(p_w, sq_d, idx, target_j[idx],
                                   params.corr)
        sysm = build_system(source_j, R, t, corr,
                            use_weight_derivative=True, weight_slope=0.9)
        return sysm, sq_d, idx

    sysms, sqs, idxs = [], [], []
    for b in range(B):
        sysm, sq_d, idx = aos_lane(Rs[b], ts[b])
        sysms.append(sysm)
        sqs.append(sq_d)
        idxs.append(idx)
    sq_d5 = jnp.stack([s[:, k - 1] for s in sqs])            # (B, N)
    idx_kn = jnp.stack([i.T for i in idxs])                  # (B, k, N)

    soa = batched_tail_system(source_j, target_j, Rs, ts, sq_d5, idx_kn,
                              params.corr, use_weight_derivative=True,
                              weight_slope=0.9)

    # tolerances allow a couple of borderline gate flips (near-coplanar
    # 5-NN sets where f32 roundoff between the algebraically identical
    # paths moves a residual across the weight/thickness threshold)
    for b in range(B):
        a = sysms[b]
        np.testing.assert_allclose(np.asarray(soa.H[b]), np.asarray(a.H),
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_allclose(np.asarray(soa.g[b]), np.asarray(a.g),
                                   rtol=1e-3, atol=0.05)
        assert abs(int(soa.num_valid[b]) - int(a.num_valid)) <= 3
        np.testing.assert_allclose(float(soa.rmse[b]), float(a.rmse),
                                   rtol=5e-3, atol=1e-4)
        np.testing.assert_allclose(float(soa.fitness[b]), float(a.fitness),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(soa.objective[b]),
                                   float(a.objective), rtol=5e-3)
