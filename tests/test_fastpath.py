"""The specialized in-loop fast path (static SCHUR+PCG, grid index,
closed-form 3x3 spectra, Cholesky non-degenerate branch) must reproduce the
generic traced-code path -- same correspondences, same trajectory."""
import numpy as np
import jax.numpy as jnp

from dcreg_tpu.ops import se3
from dcreg_tpu.ops.correspondence import CorrespondenceParams, find_correspondences
from dcreg_tpu.ops.voxel_grid import build_grid_index
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3

RNG = np.random.default_rng(11)


def _scene(n=800):
    """A plane-pair scene with enough constraint to converge."""
    a = RNG.uniform(-5, 5, (n // 2, 2))
    p1 = np.column_stack([a[:, 0], a[:, 1], 0.02 * RNG.normal(size=n // 2)])
    b = RNG.uniform(-5, 5, (n // 2, 2))
    p2 = np.column_stack([b[:, 0], 0.02 * RNG.normal(size=n // 2) + 3.0,
                          b[:, 1]])
    return np.concatenate([p1, p2])


class TestFastPathParity:
    def test_correspondences_grid_vs_brute(self):
        pts = _scene()
        grid = build_grid_index(pts, 1.0, dtype=jnp.float64)
        R = np.asarray(se3.euler_zyx_to_rot(0.001, 0.002, 0.01))
        t = jnp.asarray([0.05, -0.02, 0.08], jnp.float64)
        src = jnp.asarray(pts, jnp.float64)
        tgt = jnp.asarray(pts, jnp.float64)
        cp = CorrespondenceParams()
        c0 = find_correspondences(src, R, t, tgt, params=cp)
        c1 = find_correspondences(src, R, t, tgt, params=cp, grid=grid)
        np.testing.assert_array_equal(np.asarray(c0.valid), np.asarray(c1.valid))
        v = np.asarray(c0.valid)
        np.testing.assert_allclose(np.asarray(c0.residual)[v],
                                   np.asarray(c1.residual)[v], atol=1e-12)
        np.testing.assert_allclose(np.asarray(c0.weight)[v],
                                   np.asarray(c1.weight)[v], atol=1e-12)
        np.testing.assert_array_equal(np.asarray(c0.nn_idx)[v],
                                      np.asarray(c1.nn_idx)[v])

    def test_icp_fast_matches_generic(self):
        pts = _scene()
        src = jnp.asarray(pts, jnp.float64)
        tgt = src
        grid = build_grid_index(pts, 1.0, dtype=jnp.float64)
        R0 = se3.euler_zyx_to_rot(jnp.float64(0.002), jnp.float64(0.001),
                                  jnp.float64(0.02))
        t0 = jnp.asarray([0.1, 0.3, 0.2], jnp.float64)
        params = ICPParams(max_iterations=12)

        r_fast = icp_point_to_plane_so3(
            src, tgt, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
            HandlingMethod.PRECONDITIONED_CG, params, grid=grid)
        # generic path: traced int codes, brute-force knn
        from dcreg_tpu.ops.degeneracy import detection_code, handling_code
        r_gen = icp_point_to_plane_so3(
            src, tgt, R0, t0,
            jnp.asarray(detection_code(DetectionMethod.SCHUR_CONDITION_NUMBER),
                        jnp.int32),
            jnp.asarray(handling_code(HandlingMethod.PRECONDITIONED_CG),
                        jnp.int32),
            params)
        assert int(r_fast.iterations) == int(r_gen.iterations)
        np.testing.assert_allclose(np.asarray(r_fast.t), np.asarray(r_gen.t),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(r_fast.R), np.asarray(r_gen.R),
                                   atol=1e-9)
        # telemetry reconstruction carries the full spectra in both modes
        k = int(r_fast.iterations) - 1
        assert np.all(np.isfinite(np.asarray(
            r_fast.log.eigenvalues_full)[k]))
        np.testing.assert_allclose(
            np.asarray(r_fast.log.lambda_schur_trans)[k],
            np.asarray(r_gen.log.lambda_schur_trans)[k], rtol=1e-8)
