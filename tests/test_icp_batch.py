"""Batched engine (joint pair-list kernel) vs the single-lane engine."""
import numpy as np
import jax
import jax.numpy as jnp

from dcreg_tpu.ops import se3
from dcreg_tpu.ops.block_sparse import morton_argsort, build_block_index
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
from dcreg_tpu.models.icp_batch import icp_batch_so3, estimate_num_pairs

RNG = np.random.default_rng(23)


def _scene(n=1200):
    a = RNG.uniform(-5, 5, (n // 2, 2))
    p1 = np.column_stack([a[:, 0], a[:, 1], 0.02 * RNG.normal(size=n // 2)])
    b = RNG.uniform(-5, 5, (n // 2, 2))
    p2 = np.column_stack([b[:, 0], 0.02 * RNG.normal(size=n // 2) + 3.0,
                          b[:, 1]])
    return np.concatenate([p1, p2])


class TestBatchEngine:
    def test_matches_single_lane(self):
        pts = _scene()
        perm = morton_argsort(pts)
        spts = pts[perm].astype(np.float32)
        index = build_block_index(spts, dtype=jnp.float32, tb=128)
        src = jnp.asarray(spts)

        B = 3
        rpy = RNG.uniform(-0.02, 0.02, (B, 3))
        t0s = jnp.asarray(RNG.uniform(-0.3, 0.3, (B, 3)), jnp.float32)
        R0s = jnp.stack([se3.euler_zyx_to_rot(*map(jnp.float32, r))
                         for r in rpy])
        params = ICPParams(max_iterations=12)
        P = estimate_num_pairs(index, spts,
                               [(np.asarray(R0s[i]), np.asarray(t0s[i]))
                                for i in range(B)], 1.0)

        rb = icp_batch_so3(src, src, R0s, t0s,
                           DetectionMethod.SCHUR_CONDITION_NUMBER,
                           HandlingMethod.PRECONDITIONED_CG, params,
                           index, P)
        assert int(rb.pair_overflow) == 0

        for b in range(B):
            rs = icp_point_to_plane_so3(
                src, src, R0s[b], t0s[b],
                DetectionMethod.SCHUR_CONDITION_NUMBER,
                HandlingMethod.PRECONDITIONED_CG, params)
            assert bool(rb.converged[b]) == bool(rs.converged)
            assert int(rb.iterations[b]) == int(rs.iterations)
            np.testing.assert_allclose(np.asarray(rb.t[b]),
                                       np.asarray(rs.t), atol=2e-4)
            np.testing.assert_allclose(np.asarray(rb.R[b]),
                                       np.asarray(rs.R), atol=2e-4)
            # telemetry parity on the executed rows
            kk = int(rs.iterations)
            np.testing.assert_allclose(
                np.asarray(rb.log.lambda_schur_trans[b][:kk]),
                np.asarray(rs.log.lambda_schur_trans[:kk]), rtol=2e-2)
            assert np.array_equal(np.asarray(rb.log.executed[b][:kk]),
                                  np.asarray(rs.log.executed[:kk]))
