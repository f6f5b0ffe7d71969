"""Golden-parity tests against the reference's archived artifacts.

The strongest evidence the rebuild is faithful: per-iteration trajectories
and the first-iteration degeneracy analysis must match the recorded outputs
of the reference's (partly private) implementation --
``results/simulation/table3_fig9_fig10/`` (SURVEY.md sections 2.3, 4.5).
"""
import csv
import os

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import SIM_RESULTS, requires_reference

from dcreg_tpu.models.icp import ICPParams, icp_point_to_plane_so3
from dcreg_tpu.ops.correspondence import find_correspondences
from dcreg_tpu.ops.degeneracy import (DetectionMethod, HandlingMethod,
                                      align_to_axes, analyze,
                                      targeted_preconditioner)
from dcreg_tpu.ops.gauss_newton import build_system


@pytest.fixture(scope="module")
def iter0_analysis(cylinder_clouds):
    """The iteration-0 GN system + Schur analysis on the cylinder pair."""
    source, target, T0, _ = cylinder_clouds
    source = jnp.asarray(source)
    target = jnp.asarray(target)
    corr = find_correspondences(source, jnp.asarray(T0[:3, :3]),
                                jnp.asarray(T0[:3, 3]), target)
    sysm = build_system(source, jnp.asarray(T0[:3, :3]),
                        jnp.asarray(T0[:3, 3]), corr)
    ana = analyze(sysm.H, DetectionMethod.SCHUR_CONDITION_NUMBER)
    return sysm, ana


@requires_reference
class TestFirstIterationGolden:
    """Values from degeneracy_analysis_first_iter.txt and
    condition_numbers_detailed.csv row 0."""

    def test_condition_numbers(self, iter0_analysis):
        _, ana = iter0_analysis
        assert np.isclose(float(ana.cond_schur_rot), 7.0989, rtol=1e-3)
        assert np.isclose(float(ana.cond_schur_trans), 26.8056, rtol=1e-3)
        assert np.isclose(float(ana.cond_diag_rot), 13.6582, rtol=1e-3)
        assert np.isclose(float(ana.cond_diag_trans), 85.2925, rtol=1e-3)
        assert np.isclose(float(ana.cond_full), 14845.67, rtol=1e-3)
        assert np.isclose(float(ana.cond_full_sub_rot), 13.6737, rtol=1e-3)
        assert np.isclose(float(ana.cond_full_sub_trans), 26.6512, rtol=1e-3)

    def test_spectra(self, iter0_analysis):
        _, ana = iter0_analysis
        np.testing.assert_allclose(
            np.asarray(ana.eigenvalues_full),
            [0.629297, 5.58111, 16.7715, 683.235, 1993.28, 9342.34],
            rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ana.lambda_schur_rot), [422.505, 1447.74, 2999.32],
            rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ana.lambda_schur_trans), [0.629416, 5.60185, 16.8719],
            rtol=1e-4)

    def test_detection_masks(self, iter0_analysis):
        sysm, _ = iter0_analysis
        # DCReg Schur detection: only trans direction 0 (t0/X) degenerate
        ours = analyze(sysm.H, DetectionMethod.SCHUR_CONDITION_NUMBER)
        assert bool(ours.is_degenerate)
        assert list(np.asarray(ours.degenerate_mask).astype(int)) == \
            [0, 0, 0, 1, 0, 0]
        # ME (lambda < 120): three smallest eigen-directions
        me = analyze(sysm.H, DetectionMethod.FULL_EVD_MIN_EIGENVALUE)
        assert list(np.asarray(me.degenerate_mask).astype(int)) == \
            [1, 1, 1, 0, 0, 0]
        # FCN (full cond > 10): four directions
        fcn = analyze(sysm.H, DetectionMethod.FULL_SVD_CONDITION)
        assert list(np.asarray(fcn.degenerate_mask).astype(int)) == \
            [1, 1, 1, 1, 0, 0]

    def test_preconditioner_matrix(self, iter0_analysis):
        """The reconstructed targeted preconditioner must reproduce the
        recorded P of the PRIVATE DCReg implementation to all printed
        digits (degeneracy_analysis_first_iter.txt, 'Ours' block).  The
        artifact logs P with each block's coordinates permuted into
        axis-aligned order (verified numerically); the solver-side operator
        is the world-frame permutation-free equivalent."""
        from dcreg_tpu.ops.degeneracy import preconditioner_axis_aligned_view
        _, ana = iter0_analysis
        P = np.asarray(preconditioner_axis_aligned_view(ana,
                                                        kappa_target=10.0))
        P_golden = np.array([
            [0.002284, -0.000050, -0.000392, 0, 0, 0],
            [-0.000050, 0.000606, -0.000145, 0, 0, 0],
            [-0.000392, -0.000145, 0.000501, 0, 0, 0],
            [0, 0, 0, 0.592674, 0.000601, 0.003843],
            [0, 0, 0, 0.000601, 0.173605, 0.023697],
            [0, 0, 0, 0.003843, 0.023697, 0.064207],
        ])
        np.testing.assert_allclose(P, P_golden, atol=2e-6)

    def test_alignment_analysis(self, iter0_analysis):
        """Axis alignment / motion-space characterization vs the recorded
        'Alignment Analysis' blocks (stub alignAndOrthonormalize)."""
        _, ana = iter0_analysis
        rot = align_to_axes(ana.V_schur_rot, ana.lambda_schur_rot)
        assert list(np.asarray(rot.order)) == [0, 2, 1]
        np.testing.assert_allclose(np.asarray(rot.lambdas),
                                   [422.505477, 2999.323349, 1447.735216],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rot.angles_deg),
                                   [11.821719, 31.473096, 29.265021],
                                   rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(rot.percents),
            [[81.964683, 17.131942, 0.903375],
             [12.040715, 55.917023, 32.042262],
             [6.289249, 33.276503, 60.434248]], rtol=1e-4)

        tr = align_to_axes(ana.V_schur_trans, ana.lambda_schur_trans)
        assert list(np.asarray(tr.order)) == [2, 1, 0]
        np.testing.assert_allclose(np.asarray(tr.lambdas),
                                   [16.871859, 5.601848, 0.629416],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(tr.angles_deg),
                                   [11.713575, 11.707349, 0.434531],
                                   rtol=1e-4)


@requires_reference
def test_iteration_trajectories_match_reference(cylinder_clouds):
    """Full per-iteration RMSE / fitness / pose-error trajectories of the
    core method matrix vs the archived iteration_history.csv -- including
    'Ours', whose detection + PCG solver are STUBBED in the public source
    and fully reconstructed here."""
    source, target, T0, T_gt = cylinder_clouds
    source = jnp.asarray(source)
    target = jnp.asarray(target)
    R0, t0 = jnp.asarray(T0[:3, :3]), jnp.asarray(T0[:3, 3])
    params = ICPParams()

    golden = {}
    with open(os.path.join(SIM_RESULTS, "iteration_history.csv")) as f:
        for r in csv.DictReader(f):
            golden[(r["Method"], int(r["Iteration"]))] = r

    methods = {
        "ME-SR": (DetectionMethod.FULL_EVD_MIN_EIGENVALUE,
                  HandlingMethod.SOLUTION_REMAPPING),
        "ME-TSVD": (DetectionMethod.FULL_EVD_MIN_EIGENVALUE,
                    HandlingMethod.TRUNCATED_SVD),
        "ME-TReg": (DetectionMethod.FULL_EVD_MIN_EIGENVALUE,
                    HandlingMethod.STANDARD_REGULARIZATION),
        "FCN-SR": (DetectionMethod.FULL_SVD_CONDITION,
                   HandlingMethod.SOLUTION_REMAPPING),
        "Ours": (DetectionMethod.SCHUR_CONDITION_NUMBER,
                 HandlingMethod.PRECONDITIONED_CG),
    }
    for name, (det, hand) in methods.items():
        res = icp_point_to_plane_so3(source, target, R0, t0, det, hand,
                                     params, T_gt=jnp.asarray(T_gt))
        n = int(res.iterations)
        worst = 0.0
        for k in range(n):
            ref = golden.get((name, k))
            if ref is None:
                continue
            for col, val in (("RMSE", float(res.log.rmse[k])),
                             ("Fitness", float(res.log.fitness[k])),
                             ("TransError", float(res.log.trans_error[k])),
                             ("RotError", float(res.log.rot_error_deg[k]))):
                ref_v = float(ref[col])
                d = abs(val - ref_v) / max(abs(ref_v), 1e-9)
                worst = max(worst, d)
        assert worst < 5e-3, (name, worst)
        # iteration counts match the archive (Ours: 8-10, ME-*: cap 30)
        ref_iters = max(i for (m, i) in golden if m == name) + 1
        assert abs(n - ref_iters) <= 2, (name, n, ref_iters)


@requires_reference
def test_xicp_trajectory_matches_reference(cylinder_clouds):
    """XICP (XICP_INEQUALITY + XICP_CONSTRAINT, the archived variant,
    config/icp.yaml:112) vs the 8 archived iteration_history.csv rows.

    What made this match (each reverse-engineered from the archive):
      * PCL float32 single-pass covariance noise in the precomputed normals
        (ops/normals.py pcl_compat);
      * the reference's CUMULATIVE fitness/rmse accumulators
        (icp_test_runner.cpp:2903-2904 outside the loop);
      * corr_num = the ternary detector's highly-contributing count of the
        last rotation eigenvector (xicp.cpp:828, icp_test_runner.cpp:3121);
      * one damped-GN step == one Ceres LM iteration (xicp.py docstring).

    Tolerances: RMSE/Fitness relative < 5e-3; pose errors absolute
    (TE < 5e-4 m, RE < 0.05 deg) because TE is at the few-mm level where
    the remaining PCL-noise mismatch dominates relatively.  The reference
    converged at 9 iterations (its converged iteration is never logged,
    icp_test_runner.cpp:3327-3334 breaks before push_back); small sub-1e-4
    endgame dx differences make our count larger -- bounded, not asserted
    equal.
    """
    from dcreg_tpu.models.xicp import xicp_register

    source, target, T0, T_gt = cylinder_clouds
    source = jnp.asarray(source)
    target = jnp.asarray(target)
    res = xicp_register(source, target, jnp.asarray(T0[:3, :3]),
                        jnp.asarray(T0[:3, 3]),
                        DetectionMethod.XICP_INEQUALITY,
                        HandlingMethod.XICP_CONSTRAINT,
                        ICPParams(), T_gt=jnp.asarray(T_gt))
    golden = [r for r in csv.DictReader(
        open(os.path.join(SIM_RESULTS, "iteration_history.csv")))
        if r["Method"] == "XICP"]
    assert len(golden) == 8
    n = int(res.iterations)
    assert 8 <= n <= 18, n
    for k, g in enumerate(golden):
        assert abs(float(res.log.rmse[k]) - float(g["RMSE"])) \
            / float(g["RMSE"]) < 5e-3, (k, "rmse")
        assert abs(float(res.log.fitness[k]) - float(g["Fitness"])) \
            / float(g["Fitness"]) < 5e-3, (k, "fitness")
        assert abs(float(res.log.trans_error[k])
                   - float(g["TransError"])) < 5e-4, (k, "TE")
        assert abs(float(res.log.rot_error_deg[k])
                   - float(g["RotError"])) < 0.05, (k, "RE")
        assert abs(int(res.log.corr_num[k]) - int(g["CorrNum"])) <= 8, \
            (k, "corr_num")
    # final accuracy: Table I X-ICP row 0.42 cm / 2.86 deg envelope
    te_f = float(res.log.trans_error[n - 1])
    re_f = float(res.log.rot_error_deg[n - 1])
    assert te_f < 0.01, te_f
    assert abs(re_f - 2.86) < 0.5, re_f
