"""Fused Pallas k-NN kernel vs the portable XLA path.

The kernel must return *identical* neighbor sets and exact squared
distances (both paths re-rank candidates with directly computed
differences); runs in interpreter mode so the check works on the CPU mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcreg_tpu.ops import knn as knn_mod
from dcreg_tpu.ops import pallas_knn


def _clouds(n, m, seed=0, scale=40.0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-scale, scale, (n, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(-scale, scale, (m, 3)), jnp.float32)
    return q, t


@pytest.mark.parametrize("n,m,k", [(777, 2500, 5), (64, 100, 1),
                                   (1000, 5000, 5), (33, 4096, 3)])
def test_matches_xla_exact(n, m, k):
    q, t = _clouds(n, m)
    d0, i0 = knn_mod.knn(q, t, k=k, chunk=512, refine=2 * k)
    d1, i1 = pallas_knn.knn(q, t, k=k, kk=max(k + 3, 8), tq=64, tt=256,
                            interpret=True)
    assert bool(jnp.all(jnp.sort(i0, -1) == jnp.sort(i1, -1)))
    np.testing.assert_allclose(np.sort(d0, -1), np.sort(d1, -1), rtol=0,
                               atol=0)


def test_valid_mask():
    q, t = _clouds(300, 1500, seed=3)
    rng = np.random.default_rng(4)
    valid = jnp.asarray(rng.uniform(size=1500) > 0.3)
    d0, i0 = knn_mod.knn(q, t, valid, k=5, chunk=256, refine=10)
    d1, i1 = pallas_knn.knn(q, t, valid, k=5, tq=64, tt=256, interpret=True)
    assert bool(jnp.all(jnp.sort(i0, -1) == jnp.sort(i1, -1)))
    assert bool(jnp.all(~valid[i1] == jnp.isinf(d1)))


def test_self_query_finds_self():
    # source == target (the cylinder benchmark setup): NN1 must be self, d=0
    _, t = _clouds(0, 900, seed=7)
    d, i = pallas_knn.knn(t, t, k=5, tq=64, tt=256, interpret=True)
    assert bool(jnp.all(i[:, 0] == jnp.arange(900)))
    assert bool(jnp.all(d[:, 0] == 0.0))


def test_duplicate_points_ties():
    rng = np.random.default_rng(11)
    base = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    t = jnp.asarray(np.concatenate([base, base[:50]]))   # 50 exact dups
    q = jnp.asarray(base[:80])
    d0, _ = knn_mod.knn(q, t, k=5, chunk=128, refine=10)
    d1, _ = pallas_knn.knn(q, t, k=5, tq=64, tt=256, interpret=True)
    np.testing.assert_allclose(np.sort(d0, -1), np.sort(d1, -1), atol=0)


def test_vmap_batching():
    q, t = _clouds(128, 700, seed=5)
    qb = jnp.stack([q, q + 0.5, q * 0.9])
    f = lambda qq: pallas_knn.knn(qq, t, k=5, tq=64, tt=256, interpret=True)
    db, ib = jax.vmap(f)(qb)
    for b in range(3):
        d0, i0 = knn_mod.knn(qb[b], t, k=5, chunk=128, refine=10)
        assert bool(jnp.all(jnp.sort(i0, -1) == jnp.sort(ib[b], -1)))


def test_dispatch_cpu_stays_xla():
    # on the CPU test mesh, knn_mod.knn must not require pallas
    q, t = _clouds(50, 200, seed=9)
    d, i = knn_mod.knn(q, t, k=5, chunk=64, refine=10)
    assert d.shape == (50, 5) and i.shape == (50, 5)
