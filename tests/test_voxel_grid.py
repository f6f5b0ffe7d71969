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
