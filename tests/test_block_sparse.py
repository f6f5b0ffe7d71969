"""Exactness of the block-sparse k-NN vs brute force (within the radius)."""
import numpy as np
import jax.numpy as jnp

from dcreg_tpu.ops.block_sparse import (block_knn, build_block_index,
                                        morton_argsort, suggest_num_blocks)

RNG = np.random.default_rng(13)


def _check(pts, q, radius, k=5):
    perm = morton_argsort(pts)
    spts = pts[perm]
    index = build_block_index(spts, dtype=jnp.float64)
    qperm = morton_argsort(q)
    sq = q[qperm]
    G = suggest_num_blocks(index, sq, radius)
    d, i, ov = block_knn(index, jnp.asarray(sq), radius, k=k, num_blocks=G)
    d, i, ov = np.asarray(d), np.asarray(i), int(ov)
    assert ov == 0
    full = np.sum((sq[:, None, :] - spts[None, :, :]) ** 2, axis=-1)
    d_true = np.sort(full, axis=1)[:, :k]
    i_true = np.argsort(full, axis=1)[:, :k]
    for row in range(sq.shape[0]):
        for j in range(k):
            if d_true[row, j] <= radius * radius:
                assert abs(d[row, j] - d_true[row, j]) < 1e-9, (row, j)
                # index agrees (or equidistant tie)
                assert full[row, i[row, j]] == d_true[row, j] or \
                    abs(full[row, i[row, j]] - d_true[row, j]) < 1e-12


class TestBlockKnn:
    def test_uniform_cloud(self):
        pts = RNG.uniform(-10, 10, (3000, 3))
        q = pts + RNG.normal(0, 0.3, pts.shape)
        _check(pts, q[:600], 1.0)

    def test_surface_like(self):
        a = RNG.uniform(-20, 20, (2000, 2))
        pts = np.column_stack([a[:, 0], a[:, 1],
                               0.05 * RNG.normal(size=2000)])
        q = pts[:400] + RNG.normal(0, 0.2, (400, 3))
        _check(pts, q, 1.0)

    def test_queries_far_outside(self):
        pts = RNG.uniform(0, 5, (500, 3))
        q = np.concatenate([pts[:50], RNG.uniform(50, 60, (20, 3))])
        perm = morton_argsort(pts)
        index = build_block_index(pts[perm], dtype=jnp.float64)
        d, i, ov = block_knn(index, jnp.asarray(q), 1.0, k=5, num_blocks=8)
        d = np.asarray(d)
        # far queries find nothing within the radius: every returned
        # distance is beyond it (inf or a far candidate -- either is gated)
        assert (d[50:] > 1.0).all()

    def test_overflow_counted(self):
        """G too small must be reported, not silently wrong."""
        pts = RNG.uniform(-2, 2, (2000, 3))  # dense: many relevant blocks
        perm = morton_argsort(pts)
        index = build_block_index(pts[perm], dtype=jnp.float64)
        _, _, ov = block_knn(index, jnp.asarray(pts[perm][:128]), 1.5,
                             k=5, num_blocks=2)
        assert int(ov) > 0
