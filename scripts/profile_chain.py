"""Chained single-registration latency: the marginal device cost of one
full B=1 DCReg registration, measured by running R registrations
back-to-back INSIDE one jitted program and differencing two R values --
this cancels both the axon relay round-trip (~20-35 ms/dispatch) and the
fixed program overhead, which profile_b1.py shows dominate any
single-dispatch measurement (an EMPTY 8-trip loop times at ~34 ms).

The reference's 7.79 ms (supp.pdf Table I) is CPU wall time per
registration inside a loop with no dispatch cost, and a deployed
odometry loop runs on-device inside lax.scan -- so marginal-per-
registration is the apples-to-apples number.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import dcreg_tpu
dcreg_tpu.enable_compile_cache(jax.default_backend())
from dcreg_tpu.io.pcd import load_pcd
from dcreg_tpu.models.icp import ICPParams
from dcreg_tpu.models.icp_batch import icp_batch_so3, estimate_num_pairs
from dcreg_tpu.ops.degeneracy import DetectionMethod, HandlingMethod
from dcreg_tpu.ops.block_sparse import build_block_index, morton_argsort
from dcreg_tpu.ops import se3

CYL = "/root/reference/results/simulation/table3_fig9_fig10/target_clouds.pcd"


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    dtype = jnp.float32
    xyz = np.asarray(load_pcd(CYL)["xyz"])
    perm = morton_argsort(xyz)
    xyz = xyz[perm]
    source = jnp.asarray(xyz, dtype)
    target = source
    index = build_block_index(xyz, dtype=dtype, tb=128)
    params = ICPParams()

    nominal = np.array([np.deg2rad(0.1), np.deg2rad(0.1), np.deg2rad(2.0),
                        0.2, 0.8, 0.5])
    R0s = jnp.stack([se3.euler_zyx_to_rot(*map(jnp.asarray, nominal[:3]))
                     ]).astype(dtype)
    t0s = jnp.asarray(nominal[None, 3:], dtype)
    P = estimate_num_pairs(index, xyz,
                           [(np.asarray(R0s[0], np.float64), nominal[3:])],
                           params.corr.search_radius)

    for telem in (False, True):
        pm = params._replace(full_telemetry=telem)

        def make_chain(R):
            @jax.jit
            def chain(R0s_, t0s_):
                def body(i, acc):
                    out = icp_batch_so3(
                        source, target, R0s_ * (1.0 + 0.0 * acc),
                        t0s_, DetectionMethod.SCHUR_CONDITION_NUMBER,
                        HandlingMethod.PRECONDITIONED_CG, pm, index, P)
                    return jnp.sum(out.t) * 0.0
                return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
            return chain

        ts = {}
        for R in (2, 10):
            ts[R] = timeit(make_chain(R), R0s, t0s)
            print(f"telemetry={telem} chain R={R:2d}: {ts[R]*1e3:8.2f} ms")
        marginal = (ts[10] - ts[2]) / 8
        print(f"telemetry={telem} MARGINAL per registration: "
              f"{marginal*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
