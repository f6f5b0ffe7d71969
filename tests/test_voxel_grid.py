"""Voxel-grid NN vs brute force (exactness for gated correspondences)."""
import jax.numpy as jnp
import numpy as np

from dcreg_tpu.ops.knn import knn
from dcreg_tpu.ops.voxel_grid import build_voxel_grid, voxel_knn


def _cloud(m=4096, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-10, 10, (m, 3)), jnp.float64)


def test_voxel_knn_matches_brute_force_within_radius():
    target = _cloud()
    query = _cloud(777, seed=1)
    radius = 1.0
    grid = build_voxel_grid(target, voxel_size=radius)
    d_v, i_v = voxel_knn(grid, query, k=5, capacity=64, chunk=256)
    d_b, i_b = knn(query, target, k=5, chunk=256)

    # wherever the brute-force neighbor is inside the search radius, the
    # voxel result must agree exactly (the 27-neighborhood covers the ball)
    in_radius = np.asarray(d_b) < radius ** 2
    np.testing.assert_allclose(np.asarray(d_v)[in_radius],
                               np.asarray(d_b)[in_radius], rtol=1e-12)
    assert (np.asarray(i_v)[in_radius] == np.asarray(i_b)[in_radius]).all()


def test_voxel_knn_padding_and_validity():
    target = _cloud(1000)
    valid = jnp.arange(1000) < 900
    grid = build_voxel_grid(target, voxel_size=1.0, valid=valid)
    d, i = voxel_knn(grid, target[:50], k=3, capacity=64, chunk=64)
    # no invalid point may appear as a neighbor
    assert (np.asarray(i) < 900).all()
    # each point finds itself at distance 0
    assert np.allclose(np.asarray(d)[:, 0], 0.0)


def test_voxel_knn_large_map_scaling():
    """Query cost is independent of map size (bucketed, not O(N*M))."""
    target = _cloud(20000, seed=3)
    query = _cloud(512, seed=4)
    grid = build_voxel_grid(target, voxel_size=1.0)
    d_v, i_v = voxel_knn(grid, query, k=5, capacity=64, chunk=128)
    d_b, _ = knn(query, target, k=5, chunk=128)
    in_radius = np.asarray(d_b) < 1.0
    np.testing.assert_allclose(np.asarray(d_v)[in_radius],
                               np.asarray(d_b)[in_radius], rtol=1e-12)


class TestGridIndex:
    def test_exact_vs_brute_force_within_radius(self):
        import numpy as np
        import jax.numpy as jnp
        from dcreg_tpu.ops.voxel_grid import build_grid_index, grid_knn
        rng = np.random.default_rng(3)
        pts = rng.uniform(-10, 10, (2000, 3))
        v = 1.0
        grid = build_grid_index(pts, v, dtype=jnp.float64)
        # queries inside, near edges, and outside the cloud
        q = np.concatenate([
            rng.uniform(-10, 10, (500, 3)),
            rng.uniform(-12, -9.5, (50, 3)),
            rng.uniform(15, 20, (20, 3)),
        ])
        d, i = map(np.asarray, grid_knn(grid, jnp.asarray(q), k=5))
        # brute force
        full = np.sum((q[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        d_true = np.sort(full, axis=1)[:, :5]
        for row in range(q.shape[0]):
            for j in range(5):
                if d_true[row, j] <= v * v:
                    # within-radius neighbors must match exactly
                    assert abs(d[row, j] - d_true[row, j]) < 1e-9, (row, j)
                else:
                    # either found something valid >= true dist, or inf
                    assert (not np.isfinite(d[row, j])) or \
                        d[row, j] >= d_true[row, j] - 1e-9

    def test_validity_mask_excluded(self):
        import numpy as np
        import jax.numpy as jnp
        from dcreg_tpu.ops.voxel_grid import build_grid_index, grid_knn
        rng = np.random.default_rng(5)
        pts = rng.uniform(0, 5, (300, 3))
        valid = rng.uniform(size=300) > 0.3
        grid = build_grid_index(pts, 1.0, valid=valid, dtype=jnp.float64)
        d, i = map(np.asarray, grid_knn(grid, jnp.asarray(pts[:50]), k=3))
        finite = np.isfinite(d)
        assert np.all(valid[i[finite.nonzero()[0], finite.nonzero()[1]]])

    def test_cap_bound_is_respected(self):
        """A dense cluster in one voxel must still return exact neighbors."""
        import numpy as np
        import jax.numpy as jnp
        from dcreg_tpu.ops.voxel_grid import build_grid_index, grid_knn
        rng = np.random.default_rng(7)
        cluster = rng.normal(scale=0.05, size=(150, 3))
        spread = rng.uniform(-5, 5, (100, 3))
        pts = np.concatenate([cluster, spread])
        grid = build_grid_index(pts, 1.0, dtype=jnp.float64)
        assert grid.cap >= 150
        q = np.zeros((1, 3))
        d, i = map(np.asarray, grid_knn(grid, jnp.asarray(q), k=5))
        full = np.sort(np.sum(pts ** 2, axis=-1))
        np.testing.assert_allclose(d[0], full[:5], atol=1e-12)
