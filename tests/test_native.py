"""Native C++ runtime components: PCD IO, KD-tree oracle, voxel filter."""
import numpy as np
import pytest

from dcreg_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(1234, 3)).astype(np.float32)
    inten = rng.uniform(size=1234).astype(np.float32)
    p = tmp_path / "a.pcd"
    native.pcd_write_native(p, xyz, inten, binary=True)
    d = native.pcd_read_native(p)
    np.testing.assert_allclose(d["xyz"], xyz)
    np.testing.assert_allclose(d["intensity"], inten)
    # ascii round trip
    p2 = tmp_path / "b.pcd"
    native.pcd_write_native(p2, xyz[:100], binary=False)
    d2 = native.pcd_read_native(p2)
    np.testing.assert_allclose(d2["xyz"], xyz[:100], rtol=1e-5)


def test_pcd_native_matches_python_loader():
    from conftest import SIM_RESULTS, _has_reference
    if not _has_reference():
        pytest.skip("no reference data")
    import os
    from dcreg_tpu.io.pcd import load_pcd
    path = os.path.join(SIM_RESULTS, "target_clouds.pcd")
    a = load_pcd(path)["xyz"]
    b = native.pcd_read_native(path)["xyz"]
    np.testing.assert_allclose(np.asarray(a, np.float32), b)


def test_kdtree_exact_vs_bruteforce():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, (3000, 3)).astype(np.float32)
    q = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
    tree = native.KDTree(pts)
    d2, idx = tree.knn(q, k=5)
    # brute force oracle
    diff = q[:, None, :] - pts[None, :, :]
    bf = np.sum(diff * diff, axis=-1)
    bf_idx = np.argsort(bf, axis=1)[:, :5]
    bf_d2 = np.take_along_axis(bf, bf_idx, axis=1)
    np.testing.assert_allclose(d2, bf_d2, rtol=1e-5)
    # indices may differ on exact ties; distances must match
    assert (np.abs(np.sort(d2, 1) - np.sort(bf_d2, 1)) < 1e-6).all()


def test_kdtree_validates_device_knn():
    """The C++ KD-tree is the oracle for the XLA brute-force path."""
    import jax.numpy as jnp
    from dcreg_tpu.ops.knn import knn
    rng = np.random.default_rng(2)
    pts = rng.uniform(-40, 40, (5000, 3)).astype(np.float32)
    q = pts[:300] + rng.normal(0, 0.01, (300, 3)).astype(np.float32)
    tree = native.KDTree(pts)
    d2_t, idx_t = tree.knn(q, k=5)
    d2_x, idx_x = knn(jnp.asarray(q), jnp.asarray(pts), k=5, chunk=128,
                      refine=10)
    np.testing.assert_allclose(np.asarray(d2_x), d2_t, atol=1e-3)


def test_voxel_downsample():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(0, 10, (20000, 3)).astype(np.float32)
    out = native.voxel_downsample_native(xyz, 1.0)
    assert 500 < out.shape[0] < 2000   # ~1000 occupied unit voxels
    # every centroid must be inside the cloud bounds
    assert out.min() >= -0.01 and out.max() <= 10.01
