"""Sharded-vs-single-chip equivalence on a virtual 8-device CPU mesh.

SURVEY.md section 4 item 6: "multi-chip tests that compare sharded H/g
accumulation ... against single-chip (within fp tolerance)".  Covers both
the dense per-shard search and the block-culled map-scale path
(parallel/sharded._local_topk_culled).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
from dcreg_tpu.ops.block_sparse import morton_argsort
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.parallel import (factor_mesh, make_mesh, shard_points,
                                sharded_icp_register)
from dcreg_tpu.ops import se3

from conftest import requires_reference


def _random_scene(n=512, m=1024, seed=0):
    rng = np.random.default_rng(seed)
    # a bumpy surface: z = 0.1 sin(x) cos(y) + noise gives well-posed planes
    xy = rng.uniform(-5, 5, (m, 2))
    z = 0.1 * np.sin(xy[:, 0]) * np.cos(xy[:, 1]) + rng.normal(0, 0.002, m)
    target = np.column_stack([xy, z])
    # Morton-sort the target: the block-culled path needs spatially
    # compact blocks (correct regardless, efficient only when sorted)
    target = target[morton_argsort(target)]
    source = target[rng.choice(m, n, replace=False)]
    return (jnp.asarray(source, jnp.float64), jnp.asarray(target, jnp.float64))


@pytest.mark.parametrize("block_cull", [False, True])
def test_sharded_matches_single_chip(block_cull):
    n_devices = 8
    if len(jax.devices()) < n_devices:
        pytest.skip("needs virtual device mesh")
    source, target = _random_scene()
    pose = jnp.array([0.01, -0.02, 0.03, 0.05, -0.04, 0.06])
    R0 = se3.euler_zyx_to_rot(pose[0], pose[1], pose[2])
    t0 = pose[3:]
    params = ICPParams(max_iterations=8)

    ref = icp_point_to_plane_so3(
        source, target, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params)

    dp, mp = factor_mesh(n_devices)
    mesh = make_mesh(dp, mp)
    src_p, src_v = shard_points(source, dp)
    tgt_p, tgt_v = shard_points(target, mp, block=32)
    res = sharded_icp_register(
        mesh, src_p, tgt_p, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params,
        source_valid=src_v, target_valid=tgt_v, block_cull=block_cull)

    assert int(res.block_overflow) == 0
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(ref.t),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(ref.R),
                               atol=1e-8)
    assert int(res.iterations) == int(ref.iterations)
    assert bool(res.converged) == bool(ref.converged)


def test_sharded_matches_single_chip_midsize():
    """Non-toy parity: 60k-point map / 4k-point scan, two-level shard
    cull vs the unsharded engine (VERDICT r4 weak item 4: the sharded
    path re-implements the correspondence/GN math inline, so drift would
    only show at realistic sizes)."""
    n_devices = 8
    if len(jax.devices()) < n_devices:
        pytest.skip("needs virtual device mesh")
    rng = np.random.default_rng(12)
    m = 60_000
    xy = rng.uniform(-20, 20, (m, 2))
    z = 0.15 * np.sin(0.7 * xy[:, 0]) * np.cos(0.5 * xy[:, 1]) \
        + rng.normal(0, 0.003, m)
    target = np.column_stack([xy, z])
    # kd-leaf order: 32-pt blocks with no Z-order seam blocks (a seam
    # block's map-spanning bbox inflates every relevance count)
    from dcreg_tpu.ops.block_sparse import kd_block_order
    target = target[kd_block_order(target, 32)]
    # dense local disc source (a realistic scan neighborhood)
    c = np.array([7.0, 5.0])
    in_disc = np.sum((target[:, :2] - c) ** 2, axis=1) < 36.0
    source = target[in_disc][:4096]
    source = jnp.asarray(source, jnp.float64)
    target = jnp.asarray(target, jnp.float64)
    pose = jnp.array([0.004, -0.006, 0.01, 0.04, -0.05, 0.03])
    R0 = se3.euler_zyx_to_rot(pose[0], pose[1], pose[2])
    t0 = pose[3:]
    params = ICPParams(max_iterations=10)

    ref = icp_point_to_plane_so3(
        source, target, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params)

    dp, mp = factor_mesh(n_devices)
    mesh = make_mesh(dp, mp)
    src_p, src_v = shard_points(source, dp)
    tgt_p, tgt_v = shard_points(target, mp, block=32)
    res = sharded_icp_register(
        mesh, src_p, tgt_p, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params,
        source_valid=src_v, target_valid=tgt_v, block_cull=True,
        num_blocks=96, super_size=8, num_supers=24)
    assert int(res.block_overflow) == 0
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(ref.t),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(ref.R),
                               atol=1e-8)
    assert int(res.iterations) == int(ref.iterations)


def test_sharded_two_level_cull_matches_flat():
    """super_size > 0 (the in-shard two-level cull, VERDICT r4 item 7)
    equals the flat block cull and the unsharded engine exactly."""
    n_devices = 8
    if len(jax.devices()) < n_devices:
        pytest.skip("needs virtual device mesh")
    source, target = _random_scene(n=512, m=4096, seed=3)
    pose = jnp.array([0.01, -0.02, 0.03, 0.05, -0.04, 0.06])
    R0 = se3.euler_zyx_to_rot(pose[0], pose[1], pose[2])
    t0 = pose[3:]
    params = ICPParams(max_iterations=8)

    dp, mp = factor_mesh(n_devices)
    mesh = make_mesh(dp, mp)
    src_p, src_v = shard_points(source, dp)
    tgt_p, tgt_v = shard_points(target, mp, block=32)
    # the random-order source makes every local query block span the
    # whole scene, so all 64 per-shard blocks are relevant: capacities
    # cover them all and the test exercises pure selection parity
    common = dict(source_valid=src_v, target_valid=tgt_v, block_cull=True,
                  num_blocks=64)
    flat = sharded_icp_register(
        mesh, src_p, tgt_p, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params, **common)
    two = sharded_icp_register(
        mesh, src_p, tgt_p, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params, super_size=4,
        num_supers=16, **common)
    assert int(flat.block_overflow) == 0
    assert int(two.block_overflow) == 0
    np.testing.assert_allclose(np.asarray(two.t), np.asarray(flat.t),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(two.R), np.asarray(flat.R),
                               atol=1e-10)
    assert int(two.iterations) == int(flat.iterations)


@requires_reference
def test_sharded_cylinder_ours(cylinder_clouds):
    """The headline benchmark registered on a 4x2 mesh (block-culled map
    shards) reproduces the single-chip DCReg trajectory."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual device mesh")
    source, target, T0, T_gt = cylinder_clouds
    # both paths get the same Morton-sorted clouds: the culled search
    # needs spatially coherent 128-query blocks, and order does not
    # change the registration problem
    source = jnp.asarray(np.asarray(source)[morton_argsort(source)])
    target = jnp.asarray(np.asarray(target)[morton_argsort(target)])
    R0 = jnp.asarray(T0[:3, :3])
    t0 = jnp.asarray(T0[:3, 3])
    params = ICPParams()

    ref = icp_point_to_plane_so3(
        source, target, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params,
        T_gt=jnp.asarray(T_gt))

    mesh = make_mesh(4, 2)
    src_p, src_v = shard_points(source, 4)
    tgt_p, tgt_v = shard_points(target, 2, block=32)
    # the cylinder is dense relative to the 1 m search radius: a query
    # block can see ~40 of the 32-point blocks
    res = sharded_icp_register(
        mesh, src_p, tgt_p, R0, t0, DetectionMethod.SCHUR_CONDITION_NUMBER,
        HandlingMethod.PRECONDITIONED_CG, params,
        T_gt=jnp.asarray(T_gt), source_valid=src_v, target_valid=tgt_v,
        num_blocks=96)

    assert int(res.block_overflow) == 0
    err = float(jnp.linalg.norm(res.t - ref.t))
    assert err < 1e-6, err
    assert bool(res.converged)
    # matches the recorded DCReg accuracy envelope (Table I: 2.71 cm)
    assert float(jnp.linalg.norm(res.t)) < 0.05
