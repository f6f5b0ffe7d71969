"""Test harness / orchestration (L4): method matrix, Monte-Carlo runs,
statistics, artifact writing.

Rebuild of ``TestRunner::runAllTests / runMethod / runSingleTest``
(icp_test_runner.cpp:299-664).  The harness is deliberately host-side Python
(mirroring the reference's own C++-compute / host-orchestration split): each
method run is ONE jitted device call; everything after is bookkeeping.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import writers
from .config import Config
from .io.pcd import load_pcd
from .models.icp import ICPParams, icp_point_to_plane_so3
from .models.icp_euler import icp_point_to_plane_euler
from .models.xicp import xicp_register
from .models.superloc import superloc_register
from .models.o3d_style import o3d_icp
from .ops import se3
from .ops.degeneracy import DetectionMethod, HandlingMethod
from .ops.knn import nn1
from .ops.metrics import point_to_point_error
from . import telemetry
from .ops.correspondence import find_correspondences
from .ops.degeneracy import analyze
from .ops.gauss_newton import build_system
from .ops.solvers import solve as solve_system


class TestRunner:
    """Drives the configured method matrix over one frame pair."""

    def __init__(self, config: Config, dtype=jnp.float64):
        self.config = config
        self.dtype = dtype
        self.records: List[writers.MethodRunRecord] = []
        self.stats: Dict[str, dict] = {}
        self.source = None
        self.target = None
        self.grid = None

    # -- data ------------------------------------------------------------
    def load_point_clouds(self, source_xyz=None, target_xyz=None):
        """Load from config paths, or accept arrays directly (testing)."""
        if source_xyz is None:
            src_path = os.path.join(self.config.folder_path,
                                    self.config.source_pcd)
            tgt_path = os.path.join(self.config.folder_path,
                                    self.config.target_pcd)
            source_xyz = load_pcd(src_path)["xyz"]
            target_xyz = (source_xyz if os.path.abspath(src_path) ==
                          os.path.abspath(tgt_path)
                          else load_pcd(tgt_path)["xyz"])
        self.source = jnp.asarray(np.asarray(source_xyz), dtype=self.dtype)
        self.target = jnp.asarray(np.asarray(target_xyz), dtype=self.dtype)
        if self.config.use_grid_index:
            # one-time spatial index build (the reference's KD-tree build,
            # utils.hpp:393-424) shared by every method and run
            from .ops.voxel_grid import build_grid_index
            self.grid = build_grid_index(
                np.asarray(self.target), self.config.search_radius,
                dtype=self.dtype)
        return self

    # -- single test ------------------------------------------------------
    def run_single_test(self, method_name: str, detection: DetectionMethod,
                        handling: HandlingMethod, warmup: bool = False):
        cfg = self.config
        T0 = jnp.asarray(cfg.initial_matrix(), dtype=self.dtype)
        T_gt = jnp.asarray(cfg.gt_matrix(), dtype=self.dtype)
        params = cfg.icp_params()

        grid = self.grid
        if method_name == "O3D":
            run = lambda: o3d_icp(
                self.source, self.target, T0[:3, :3], T0[:3, 3],
                params, T_gt=T_gt, grid=grid)
        elif method_name.startswith("XICP"):
            run = lambda: xicp_register(
                self.source, self.target, T0[:3, :3], T0[:3, 3],
                detection, handling, params, cfg.xicp, T_gt=T_gt, grid=grid)
        elif method_name == "SuperLoc":
            run = lambda: superloc_register(
                self.source, self.target, T0[:3, :3], T0[:3, 3],
                params, T_gt=T_gt, grid=grid)
        elif cfg.use_so3_parameterization:
            run = lambda: icp_point_to_plane_so3(
                self.source, self.target, T0[:3, :3], T0[:3, 3],
                detection, handling, params, T_gt=T_gt, grid=grid)
        else:
            run = lambda: icp_point_to_plane_euler(
                self.source, self.target, T0[:3, :3], T0[:3, 3],
                detection, handling, params, T_gt=T_gt, grid=grid)

        if warmup:  # compile outside the timed region
            jax.block_until_ready(run())
        t0 = time.perf_counter()
        result = run()
        jax.block_until_ready(result)
        time_ms = (time.perf_counter() - t0) * 1e3
        superloc_info = None
        if method_name == "SuperLoc":
            result, superloc_info = result
            superloc_info = jax.device_get(superloc_info)
        return jax.device_get(result), time_ms, superloc_info

    # -- method loop ------------------------------------------------------
    def run_method(self, method_name, detection, handling):
        cfg = self.config
        for run_idx in range(cfg.num_runs):
            result, time_ms, superloc_info = self.run_single_test(
                method_name, detection, handling, warmup=(run_idx == 0))
            rec = writers.MethodRunRecord(method_name, run_idx, result,
                                          time_ms)
            if superloc_info is not None:
                rec.superloc = dict(
                    uncertainties=list(superloc_info.uncertainties),
                    cond_full=float(superloc_info.cond_full),
                    cond_rot=float(superloc_info.cond_rot),
                    cond_trans=float(superloc_info.cond_trans),
                    is_degenerate=bool(superloc_info.is_degenerate))
            # final p2p metrics on the aligned cloud
            T = rec.final_transform()
            aligned = self.source @ jnp.asarray(T[:3, :3].T,
                                                dtype=self.dtype) + \
                jnp.asarray(T[:3, 3], dtype=self.dtype)
            rmse, fit, chamfer, n_corr = point_to_point_error(
                aligned, self.target, cfg.error_threshold)
            rec.p2p_rmse = float(rmse)
            rec.p2p_fitness = float(fit)
            rec.chamfer = float(chamfer)
            rec.p2p_corr = int(n_corr)
            self.records.append(rec)

            if run_idx == 0:
                self._fill_iteration_times(rec, method_name, detection,
                                           handling)
            if run_idx == 0 and (cfg.save_pcd or cfg.save_error_pcd):
                self._save_clouds(method_name, np.asarray(aligned))
        return True

    # -- per-iteration timing (utils.hpp:181 iter_time_ms) ----------------
    def _fill_iteration_times(self, rec, method_name, detection, handling):
        """Populate rec.iter_time_ms + rec.iter_time_provenance.

        With cfg.stepped_timing every engine gets MEASURED values:
          - SO(3) family: each recorded iteration's exact work replayed
            as its own device call ("stepped_replay");
          - XICP / SuperLoc / O3D: the engine re-run with
            max_iterations=1 from each recorded pre-iteration pose
            ("engine_1iter_replay" -- includes the engine's per-call
            setup, e.g. O3D's normal estimation, so it upper-bounds the
            pure iteration cost).
        The default mode carries total/n uniformly and says so
        ("uniform_estimate") -- provenance is written to
        iteration_timing_provenance.csv so no synthetic value is ever
        silent (the reference logs a real per-iteration clock for all
        engines, icp_test_runner.cpp:1973)."""
        cfg = self.config
        n = max(rec.n_iters, 1)
        rec.iter_time_ms = [rec.time_ms / n] * rec.n_iters
        rec.iter_time_provenance = "uniform_estimate"
        if not cfg.stepped_timing:
            return
        params = cfg.icp_params()
        grid = self.grid
        source, target = self.source, self.target
        T_gt = jnp.asarray(cfg.gt_matrix(), dtype=self.dtype)

        T0 = np.asarray(cfg.initial_matrix())
        Ts = [T0] + [np.asarray(rec.result.log.transform[k])
                     for k in range(rec.n_iters - 1)]
        poses = [(jnp.asarray(T[:3, :3], self.dtype),
                  jnp.asarray(T[:3, 3], self.dtype)) for T in Ts]

        so3_family = (not method_name.startswith("XICP")
                      and method_name not in ("SuperLoc", "O3D")
                      and cfg.use_so3_parameterization)
        if so3_family:
            @jax.jit
            def step(R, t):
                corr = find_correspondences(source, R, t, target,
                                            params=params.corr,
                                            chunk=params.chunk, grid=grid)
                sysm = build_system(
                    source, R, t, corr,
                    use_weight_derivative=params.use_weight_derivative,
                    weight_slope=params.corr.weight_slope)
                analysis = analyze(sysm.H, detection, params.thresholds)
                dx, _ = solve_system(sysm.H, sysm.g, handling, analysis,
                                     params.thresholds, telemetry=False)
                return dx
            rec.iter_time_ms = telemetry.stepped_iteration_times(step, poses)
            rec.iter_time_provenance = "stepped_replay"
            return

        p1 = params._replace(max_iterations=1)
        if method_name == "O3D":
            step = lambda R, t: o3d_icp(source, target, R, t, p1,
                                        T_gt=T_gt, grid=grid)
        elif method_name.startswith("XICP"):
            step = lambda R, t: xicp_register(source, target, R, t,
                                              detection, handling, p1,
                                              cfg.xicp, T_gt=T_gt,
                                              grid=grid)
        elif method_name == "SuperLoc":
            step = lambda R, t: superloc_register(source, target, R, t,
                                                  p1, T_gt=T_gt, grid=grid)
        else:   # Euler family: one-iteration engine replay
            step = lambda R, t: icp_point_to_plane_euler(
                source, target, R, t, detection, handling, p1,
                T_gt=T_gt, grid=grid)
        rec.iter_time_ms = telemetry.stepped_iteration_times(step, poses)
        rec.iter_time_provenance = "engine_1iter_replay"

    def run_all(self):
        if self.source is None:
            self.load_point_clouds()
        for name, det, hand in self.config.methods():
            self.run_method(name, det, hand)
        self.finalize_statistics()
        self.save_results()
        return self

    # -- statistics (icp_test_runner.cpp:604-664) -------------------------
    def finalize_statistics(self):
        by_method: Dict[str, List[writers.MethodRunRecord]] = {}
        for r in self.records:
            by_method.setdefault(r.method, []).append(r)
        self.stats = {}
        for name, recs in by_method.items():
            te = np.array([r.final_errors()[0] for r in recs])
            re = np.array([r.final_errors()[1] for r in recs])
            times = np.array([r.time_ms for r in recs])
            iters = np.array([r.n_iters for r in recs])
            rmse = np.array([r.final_rmse_fitness()[0] for r in recs])
            fit = np.array([r.final_rmse_fitness()[1] for r in recs])
            corr = np.array([int(r.result.log.effective_points[r.last_iter()])
                             for r in recs])
            conv = np.array([r.converged for r in recs])
            self.stats[name] = dict(
                n_runs=len(recs), n_converged=int(conv.sum()),
                success_rate=float(conv.mean()),
                trans_error_mean=float(te.mean()),
                trans_error_std=float(te.std()),
                trans_error_min=float(te.min()),
                trans_error_max=float(te.max()),
                rot_error_mean=float(re.mean()), rot_error_std=float(re.std()),
                rot_error_min=float(re.min()), rot_error_max=float(re.max()),
                time_mean=float(times.mean()), time_std=float(times.std()),
                iters_mean=float(iters.mean()),
                rmse_mean=float(rmse.mean()), fitness_mean=float(fit.mean()),
                corr_mean=float(corr.mean()),
                p2p_rmse_mean=float(np.mean([r.p2p_rmse for r in recs])),
                p2p_fitness_mean=float(np.mean([r.p2p_fitness for r in recs])),
                p2p_corr_mean=float(np.mean([r.p2p_corr for r in recs])),
                chamfer_mean=float(np.mean([r.chamfer for r in recs])),
            )
        return self.stats

    # -- artifacts --------------------------------------------------------
    def save_results(self):
        cfg = self.config
        out = cfg.output_folder
        if not out:
            return
        os.makedirs(out, exist_ok=True)
        n_src = self.source.shape[0] if self.source is not None else 0
        n_tgt = self.target.shape[0] if self.target is not None else 0
        if cfg.save_statistics:
            writers.write_statistics_summary(
                os.path.join(out, "statistics_summary.txt"), cfg, self.stats,
                (n_src, n_tgt))
            writers.write_complete_log(
                os.path.join(out, "complete_log.txt"), cfg, self.stats)
        if cfg.save_csv:
            writers.write_all_results_csv(
                os.path.join(out, "all_results.csv"), self.records)
            writers.write_iteration_history_csv(
                os.path.join(out, "iteration_history.csv"), self.records)
            writers.write_iteration_details_csv(
                os.path.join(out, "iteration_details_with_dx.csv"),
                self.records)
            writers.write_transform_details_csv(
                os.path.join(out, "transform_details.csv"), self.records)
            writers.write_timing_provenance_csv(
                os.path.join(out, "iteration_timing_provenance.csv"),
                self.records)
            if cfg.num_runs == 1:
                writers.write_condition_numbers_csv(
                    os.path.join(out, "condition_numbers_detailed.csv"),
                    self.records)
        if cfg.save_summary:
            # fig18-style PCG solver telemetry for the first PCG method
            pcg_methods = [m for m, _, h in cfg.methods()
                           if h == HandlingMethod.PRECONDITIONED_CG]
            if pcg_methods:
                rec0 = next((r for r in self.records
                             if r.method == pcg_methods[0] and r.run == 0),
                            None)
                if rec0 is not None:
                    rows = telemetry.pcg_replay_rows(
                        rec0.result.log,
                        kappa_target=cfg.icp_params().thresholds.kappa_target)
                    telemetry.write_pcg_txt(os.path.join(out, "pcg.txt"),
                                            rows)
            writers.write_degeneracy_analysis_txt(
                os.path.join(out, "degeneracy_analysis_first_iter.txt"),
                self.records, first=True)
            writers.write_degeneracy_analysis_txt(
                os.path.join(out, "degeneracy_analysis_last_iter.txt"),
                self.records, first=False)

    def _save_clouds(self, method_name, aligned):
        cfg = self.config
        out = cfg.output_folder
        os.makedirs(out, exist_ok=True)
        tgt = np.asarray(self.target)
        if cfg.save_pcd:
            writers.save_aligned_clouds(
                os.path.join(out, f"{method_name}_aligned_clouds.pcd"),
                aligned, tgt)
            from .io.pcd import save_pcd
            save_pcd(os.path.join(out, f"{method_name}_aligned_clouds_sig.pcd"),
                     aligned)
            save_pcd(os.path.join(out, "initial_clouds.pcd"),
                     np.asarray(self.source @ jnp.asarray(
                         cfg.initial_matrix()[:3, :3].T, dtype=self.dtype)
                         + jnp.asarray(cfg.initial_matrix()[:3, 3],
                                       dtype=self.dtype)))
            save_pcd(os.path.join(out, "target_clouds.pcd"), tgt)
        if cfg.save_error_pcd:
            d_sq, _ = nn1(jnp.asarray(aligned, dtype=self.dtype), self.target)
            writers.save_error_cloud(
                os.path.join(out, f"{method_name}_error.pcd"), aligned,
                np.sqrt(np.asarray(d_sq)), cfg.error_threshold)
