"""Test configuration.

Tests run on the REAL CPU backend with float64 enabled:
  * golden-parity tests against the reference's recorded artifacts need f64
    (the reference is all-double Eigen);
  * the environment's TPU relay ('axon') silently degrades f64 to f32 and
    must not capture test computations -- jax_platforms is forced to 'cpu'
    here, which takes effect because backends initialize lazily;
  * multi-chip sharding tests use 8 virtual CPU devices via
    xla_force_host_platform_device_count.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
SIM_RESULTS = os.path.join(
    REFERENCE_ROOT, "results/simulation/table3_fig9_fig10")


def _has_reference():
    return os.path.isdir(SIM_RESULTS)


requires_reference = pytest.mark.skipif(
    not _has_reference(), reason="reference artifacts not mounted")


@pytest.fixture(scope="session")
def cylinder_clouds():
    """The shifted-cylinder benchmark pair: (source, target, T_init, T_gt).

    source == target (config/icp.yaml: source_pcd == target_pcd); the initial
    pose is the recorded noise (roll 0.1 deg, pitch 0.1 deg, yaw 2 deg,
    t = [0.2, 0.8, 0.5]) recovered exactly from initial_clouds.pcd; GT is
    identity.
    """
    from dcreg_tpu.io.pcd import load_pcd
    from dcreg_tpu.ops import se3
    import jax.numpy as jnp

    target = load_pcd(os.path.join(SIM_RESULTS, "target_clouds.pcd"))["xyz"].astype(np.float64)
    pose = jnp.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                      0.2, 0.8, 0.5], dtype=jnp.float64)
    T0 = np.asarray(se3.pose6d_to_matrix(pose))
    return target.copy(), target, T0, np.eye(4)

import dcreg_tpu

# NOTE: the persistent XLA compile cache is deliberately NOT enabled for
# the test suite.  With ~140 tests compiling hundreds of programs in one
# process, deserializing disk-cache hits late in the run intermittently
# segfaults inside jax's compilation_cache (observed repeatedly at
# test_timing_provenance after ~130 green tests; every test passes
# standalone with the cache on).  Cold compiles cost the suite ~2-3
# minutes; a crashed run costs everything.
