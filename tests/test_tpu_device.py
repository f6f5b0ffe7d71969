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


def test_pallas_kernels_and_batched_engine_on_device():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the default (TPU) backend win
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(PAYLOAD)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, PAYLOAD], env=env, timeout=880,
        capture_output=True, text=True)
    if proc.returncode == 42:
        pytest.skip("no TPU attached: " + proc.stdout.strip())
    assert proc.returncode == 0, (
        f"TPU payload failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-6000:]}")
