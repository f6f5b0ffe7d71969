"""Batched ragged block-sparse k-NN kernel vs brute force (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcreg_tpu.ops.block_sparse import morton_argsort, build_block_index
from dcreg_tpu.ops.pallas_block_knn import (TB, QB, KP, batched_block_knn,
                                            lane_relevance, make_pair_list)

RNG = np.random.default_rng(17)


def _euler(r, p, y):
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), \
        np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


class TestBatchedBlockKnn:
    def test_vs_brute_force(self):
        pts = RNG.uniform(-8, 8, (1500, 3)).astype(np.float32)
        perm = morton_argsort(pts)
        spts = pts[perm]
        index = build_block_index(spts, dtype=jnp.float32, tb=TB)

        B = 3
        radius = 1.0
        Rs = np.stack([_euler(*RNG.uniform(-0.05, 0.05, 3)) for _ in range(B)]
                      ).astype(np.float32)
        ts = RNG.uniform(-0.4, 0.4, (B, 3)).astype(np.float32)

        n = spts.shape[0]
        nq = -(-n // QB)
        src_pad = np.concatenate(
            [spts, np.repeat(spts[-1:], nq * QB - n, axis=0)])
        src_blocks = jnp.asarray(
            src_pad.reshape(nq, QB, 3).transpose(0, 2, 1))   # (nq, 3, QB)
        slo = src_pad.reshape(nq, QB, 3).min(axis=1)
        shi = src_pad.reshape(nq, QB, 3).max(axis=1)

        rel = lane_relevance(jnp.asarray(slo), jnp.asarray(shi),
                             jnp.asarray(Rs), jnp.asarray(ts),
                             index.lo, index.hi, radius)
        total = int(np.asarray(rel).sum())
        P = total + 7
        qid, tid, ov = make_pair_list(rel, P)
        assert int(ov) == 0

        poses = jnp.asarray(np.concatenate(
            [Rs.reshape(B, 9), ts], axis=1))                 # (B, 12)
        vals, idx = batched_block_knn(index, src_blocks, poses, qid, tid,
                                      num_pairs=P, interpret=True)
        vals, idx = np.asarray(vals)[:, :n], np.asarray(idx)[:, :n]

        for b in range(B):
            q = spts @ Rs[b].T + ts[b]
            full = np.sum((q[:, None, :] - spts[None, :, :]) ** 2, axis=-1)
            d_true = np.sort(full, axis=1)[:, :5]
            for row in range(0, n, 97):
                for j in range(5):
                    if d_true[row, j] <= radius * radius:
                        # neighbor found; rank order / distance value may
                        # carry the fixed-point key step
                        # (1.1 r^2 / 2^(31-IB), ~5e-6 here)
                        tol = max(2.0 ** -11 * d_true[row, j], 5e-6)
                        got = full[row, idx[b, row, j]]
                        assert abs(got - d_true[row, j]) < tol, \
                            (b, row, j, got, d_true[row, j])
                        assert abs(vals[b, row, j] - d_true[row, j]) < \
                            1e-3 * max(1.0, d_true[row, j])

    def test_pair_list_padding(self):
        rel = jnp.zeros((4, 6), bool).at[1, 2].set(True).at[3, 5].set(True)
        qid, tid, ov = make_pair_list(rel, 5)
        qid, tid = np.asarray(qid), np.asarray(tid)
        assert int(ov) == 0
        assert list(qid[:2]) == [1, 3] and list(tid[:2]) == [2, 5]
        assert (qid[2:] == 4).all() and (tid[2:] == 6).all()

    def test_pair_list_overflow(self):
        rel = jnp.ones((2, 3), bool)
        _, _, ov = make_pair_list(rel, 4)
        assert int(ov) == 2
