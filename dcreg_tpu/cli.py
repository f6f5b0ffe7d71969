"""CLI entry point (L5): run the configured benchmark.

Rebuild of ``icp_main.cpp`` -- but with the config path as a proper argument
instead of the reference's hard-coded ``../config/icp.yaml``
(icp_main.cpp:11).

Usage:  python -m dcreg_tpu.cli --config configs/cylinder.yaml \
            [--output DIR] [--platform cpu|axon] [--f32]
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="dcreg_tpu benchmark runner")
    ap.add_argument("--config", required=True, help="YAML config path "
                    "(reference icp.yaml format)")
    ap.add_argument("--output", default=None,
                    help="override output folder")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon", "tpu"],
                    help="force a JAX platform")
    ap.add_argument("--f32", action="store_true",
                    help="force float32 (default on TPU)")
    ap.add_argument("--f64", action="store_true",
                    help="force float64 (default on CPU; TPU silently "
                         "degrades f64 to f32, so prefer --f32 there)")
    ap.add_argument("--source", default=None, help="override source PCD path")
    ap.add_argument("--target", default=None, help="override target PCD path")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        plat = "axon" if args.platform == "tpu" else args.platform
        jax.config.update("jax_platforms", plat)
    on_cpu = jax.default_backend() == "cpu"
    use_f64 = args.f64 or (on_cpu and not args.f32)
    if use_f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import dcreg_tpu
    dcreg_tpu.enable_compile_cache(
        jax.default_backend() if hasattr(jax, "default_backend") else "cli")
    from dcreg_tpu.config import load_config
    from dcreg_tpu.harness import TestRunner
    from dcreg_tpu.io.pcd import load_pcd

    config = load_config(args.config)
    if args.output:
        config = config._replace(output_folder=args.output)

    dtype = jnp.float64 if use_f64 else jnp.float32
    runner = TestRunner(config, dtype=dtype)
    if args.source:
        src = load_pcd(args.source)["xyz"]
        tgt = src if args.target in (None, args.source) else \
            load_pcd(args.target)["xyz"]
        runner.load_point_clouds(src, tgt)
    else:
        runner.load_point_clouds()
    runner.run_all()

    for name, s in sorted(runner.stats.items()):
        print(f"{name:>10s}: conv={s['success_rate']*100:5.1f}% "
              f"TE={s['trans_error_mean']:.4f}m RE={s['rot_error_mean']:.4f}deg "
              f"iters={s['iters_mean']:.1f} time={s['time_mean']:.2f}ms")
    if config.output_folder:
        print(f"artifacts -> {config.output_folder}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
