"""Real-TPU lowering lane.

conftest.py pins the in-process backend to CPU (f64 goldens need it), which
flips every Pallas kernel to interpret mode -- zero hardware-lowering
coverage.  This test runs tpu_device_payload.py in a SUBPROCESS on the
default (TPU) backend so Mosaic compilation of both Pallas kernels and the
full batched engine is exercised for real.  Skips cleanly when no TPU is
attached (payload exit code 42).
"""
import os
import subprocess
import sys

import pytest

PAYLOAD = os.path.join(os.path.dirname(__file__), "tpu_device_payload.py")

# Backend init through the axon relay takes minutes even when healthy; a
# flaky relay instead hangs indefinitely.  The probe gives plain device
# enumeration this much time before declaring the relay unreachable.
PROBE_TIMEOUT = 330

_PROBE = ("import jax; d = jax.devices(); "
          "print(d[0].platform if d else 'none')")


def test_pallas_kernels_and_batched_engine_on_device():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the default (TPU) backend win
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(PAYLOAD)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # fast(er) connection probe: a wedged relay should cost PROBE_TIMEOUT
    # and a clean skip, not an 880 s hang-then-FAIL on the real payload
    try:
        probe = subprocess.run(
            [sys.executable, "-c", _PROBE], env=env, timeout=PROBE_TIMEOUT,
            capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        pytest.skip(f"TPU backend unreachable (device enumeration exceeded "
                    f"{PROBE_TIMEOUT} s; relay down or wedged)")
    if probe.returncode != 0 or "tpu" not in probe.stdout:
        pytest.skip("no TPU attached: " +
                    (probe.stdout + probe.stderr).strip()[-500:])
    proc = subprocess.run(
        [sys.executable, PAYLOAD], env=env, timeout=880,
        capture_output=True, text=True)
    if proc.returncode == 42:
        pytest.skip("no TPU attached: " + proc.stdout.strip())
    assert proc.returncode == 0, (
        f"TPU payload failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-6000:]}")
