"""Per-iteration timing honesty (VERDICT r3 weak #4 / item 8).

With cfg.stepped_timing, EVERY engine family gets measured per-iteration
values (SO(3): exact stepped replay; XICP/SuperLoc/O3D/Euler:
one-iteration engine replay), and iteration_timing_provenance.csv labels
every row so no synthetic value is silent.  Without it, rows are labeled
uniform_estimate."""
import csv
import os
import subprocess
import sys

import numpy as np
import pytest

from dcreg_tpu.config import Config
from dcreg_tpu.harness import TestRunner
from dcreg_tpu.ops import se3

# The engine-replay harness compiles ~30 extra programs; after ~130
# suite tests (hundreds of compiled programs in one process) XLA's CPU
# backend_compile intermittently SEGFAULTS on these compiles (observed
# repeatedly at this file; every run passes standalone).  The real tests
# therefore execute in a fresh subprocess.
_CHILD = bool(os.environ.get("DCREG_PROV_CHILD"))
child_only = pytest.mark.skipif(
    not _CHILD, reason="runs inside the subprocess wrapper")


def test_provenance_suite_in_subprocess(tmp_path):
    if _CHILD:
        pytest.skip("already in child")
    env = dict(os.environ, DCREG_PROV_CHILD="1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.abspath(__file__), "-q"],
        env=env, capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, (
        f"child rc={proc.returncode}\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}")


def _scene(m=1200, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-5, 5, (m, 2))
    z = 0.15 * np.sin(xy[:, 0]) * np.cos(xy[:, 1]) + rng.normal(0, 0.002, m)
    return np.column_stack([xy, z])


def _run(tmp_path, stepped):
    world = _scene()
    from dcreg_tpu.config import Pose6DConfig
    cfg = Config(
        output_folder=str(tmp_path / f"out_{stepped}"),
        num_runs=1, max_iterations=6, stepped_timing=stepped,
        test_methods=(("Ours", "SCHUR_CONDITION_NUMBER",
                       "PRECONDITIONED_CG"),
                      ("XICP", "XICP_INEQUALITY", "XICP_CONSTRAINT"),
                      ("SuperLoc", "SUPERLOC", "SUPERLOC"),
                      ("O3D", "O3D", "O3D")),
        initial_noise=Pose6DConfig(0.002, -0.003, 0.02, 0.03, -0.02, 0.04),
        save_pcd=False, save_error_pcd=False)
    runner = TestRunner(cfg)
    runner.load_point_clouds(source_xyz=world, target_xyz=world)
    runner.run_all()
    return runner, cfg.output_folder


def _provenance(out):
    rows = list(csv.DictReader(
        open(os.path.join(out, "iteration_timing_provenance.csv"))))
    by_method = {}
    for r in rows:
        by_method.setdefault(r["Method"], []).append(r)
    return by_method


@child_only
def test_stepped_timing_measures_every_engine(tmp_path):
    runner, out = _run(tmp_path, stepped=True)
    prov = _provenance(out)
    assert prov["Ours"][0]["Provenance"] == "stepped_replay"
    for m in ("XICP", "SuperLoc", "O3D"):
        assert prov[m][0]["Provenance"] == "engine_1iter_replay", m
    for m, rows in prov.items():
        times = [float(r["IterTimeMs"]) for r in rows]
        assert all(t > 0 for t in times), (m, times)
        # measured values are not the uniform total/n constant
        if len(times) > 2:
            assert np.std(times) > 0, m


@child_only
def test_default_mode_labels_estimates(tmp_path):
    runner, out = _run(tmp_path, stepped=False)
    prov = _provenance(out)
    for m, rows in prov.items():
        assert all(r["Provenance"] == "uniform_estimate" for r in rows), m
