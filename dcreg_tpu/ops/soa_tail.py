"""Structure-of-arrays correspondence tail + GN assembly for batched lanes.

The AoS tail (correspondence.correspondence_tail -> gauss_newton.
build_system) carries (B, N, k, 3) / (B, N, 3, 3) intermediates whose
trailing dims land in the minor (sublane, lane) tile positions -- a (3, 3)
trailer uses 9 of 1024 tile slots, so every materialized intermediate pays
~100x its logical bytes in HBM traffic.  Measured on the cylinder batch
(B=32): ~15 ms/iteration for ~70 MFLOP of real work.

This module re-derives the identical math (plane fit ``A x = -1`` in
closed form with rank handling, thickness gate, robust weight, SO(3)
right-perturbation GN rows -- icp_test_runner.cpp:1747-1915) as scalar
component arrays shaped (B, N) / (B, k, N) with the POINT axis minor:
every intermediate is a dense f32 tile, the whole chain fuses, and the
only matmul is the final (6, N) x (N, 6) MXU reduction.  Same-pose output
matches the AoS path to f32 roundoff (tests/test_soa_tail.py).

The one AoS survivor is the neighbor gather ``target[idx]`` -> (B, k, N, 3)
-- XLA's contiguous row gather is ~4x faster than three scalar gathers
(measured), and the component slices fuse into the consumers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .correspondence import CorrespondenceParams
from .gauss_newton import GNSystem


def _eigh3_soa(sxx, sxy, sxz, syy, syz, szz):
    """Closed-form symmetric 3x3 EVD on component arrays (any shape).

    Same trigonometric (Cardano) eigenvalues + cross-product eigenvectors
    as linalg.eigh3_closed, with every intermediate a scalar array.
    Returns (lam: 3-tuple ascending, V: 3-tuple of 3-component columns).
    """
    dt = sxx.dtype
    q = (sxx + syy + szz) / 3.0
    b00, b11, b22 = sxx - q, syy - q, szz - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (sxy * sxy + sxz * sxz + syz * syz)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    tiny = p <= jnp.asarray(1e-30, dt)
    p_safe = jnp.where(tiny, 1.0, p)
    detB = (b00 * (b11 * b22 - syz * syz)
            - sxy * (sxy * b22 - syz * sxz)
            + sxz * (sxy * syz - b11 * sxz))
    r = jnp.clip(detB / (2.0 * p_safe * p_safe * p_safe), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = jnp.asarray(2.0943951023931953, dt)
    w2 = q + 2.0 * p * jnp.cos(phi)
    w0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    w1 = 3.0 * q - w2 - w0
    w0 = jnp.where(tiny, q, w0)
    w1 = jnp.where(tiny, q, w1)
    w2 = jnp.where(tiny, q, w2)

    def null_vector(lam):
        r0x, r0y, r0z = sxx - lam, sxy, sxz
        r1x, r1y, r1z = sxy, syy - lam, syz
        r2x, r2y, r2z = sxz, syz, szz - lam
        c01x = r0y * r1z - r0z * r1y
        c01y = r0z * r1x - r0x * r1z
        c01z = r0x * r1y - r0y * r1x
        c02x = r0y * r2z - r0z * r2y
        c02y = r0z * r2x - r0x * r2z
        c02z = r0x * r2y - r0y * r2x
        c12x = r1y * r2z - r1z * r2y
        c12y = r1z * r2x - r1x * r2z
        c12z = r1x * r2y - r1y * r2x
        n01 = c01x * c01x + c01y * c01y + c01z * c01z
        n02 = c02x * c02x + c02y * c02y + c02z * c02z
        n12 = c12x * c12x + c12y * c12y + c12z * c12z
        use01 = (n01 >= n02) & (n01 >= n12)
        use02 = ~use01 & (n02 >= n12)
        cx = jnp.where(use01, c01x, jnp.where(use02, c02x, c12x))
        cy = jnp.where(use01, c01y, jnp.where(use02, c02y, c12y))
        cz = jnp.where(use01, c01z, jnp.where(use02, c02z, c12z))
        n2 = cx * cx + cy * cy + cz * cz
        ok = n2 > 1e-60
        inv = 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0))
        return cx * inv, cy * inv, cz * inv, ok

    # most-isolated extreme eigenvalue first (best conditioned)
    hi_first = (w2 - w1) >= (w1 - w0)
    lam_a = jnp.where(hi_first, w2, w0)
    lam_b = jnp.where(hi_first, w0, w2)
    ax, ay, az, ok_a = null_vector(lam_a)
    bx, by, bz, ok_b = null_vector(lam_b)
    ax = jnp.where(ok_a, ax, 1.0)
    ay = jnp.where(ok_a, ay, 0.0)
    az = jnp.where(ok_a, az, 0.0)
    # independent fallback: coordinate axis least aligned with va
    aax, aay, aaz = jnp.abs(ax), jnp.abs(ay), jnp.abs(az)
    x_least = (aax <= aay) & (aax <= aaz)
    y_least = ~x_least & (aay <= aaz)
    fx = jnp.where(x_least, 1.0, 0.0)
    fy = jnp.where(y_least, 1.0, 0.0)
    fz = 1.0 - fx - fy
    bx = jnp.where(ok_b, bx, fx)
    by = jnp.where(ok_b, by, fy)
    bz = jnp.where(ok_b, bz, fz)
    dot = bx * ax + by * ay + bz * az
    bx, by, bz = bx - dot * ax, by - dot * ay, bz - dot * az
    nb2 = bx * bx + by * by + bz * bz
    ok_nb = nb2 > 1e-60
    invb = 1.0 / jnp.sqrt(jnp.where(ok_nb, nb2, 1.0))
    # degenerate fallback: va x (least-aligned coordinate axis)
    gx = ay * fz - az * fy
    gy = az * fx - ax * fz
    gz = ax * fy - ay * fx
    g2 = jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-60))
    bx = jnp.where(ok_nb, bx * invb, gx / g2)
    by = jnp.where(ok_nb, by * invb, gy / g2)
    bz = jnp.where(ok_nb, bz * invb, gz / g2)
    # third vector: va x vb (right-handed completion)
    cx = ay * bz - az * by
    cy = az * bx - ax * bz
    cz = ax * by - ay * bx

    # assemble ascending (w0, w1, w2) <-> (a or b order)
    v0 = (jnp.where(hi_first, bx, ax), jnp.where(hi_first, by, ay),
          jnp.where(hi_first, bz, az))
    v2 = (jnp.where(hi_first, ax, bx), jnp.where(hi_first, ay, by),
          jnp.where(hi_first, az, bz))
    v1 = (cx, cy, cz)
    return (w0, w1, w2), (v0, v1, v2)


def batched_tail_system(source_xyz, target_xyz, Rs, ts, sq_d5, idx_kn,
                        params: CorrespondenceParams,
                        use_weight_derivative: bool = True,
                        weight_slope: float = 0.9) -> GNSystem:
    """Fused correspondence tail + GN assembly for all lanes.

    source_xyz (N, 3); target_xyz (M, 3); Rs (B, 3, 3); ts (B, 3);
    sq_d5 (B, N): squared distance of the k-th neighbor (the radius gate);
    idx_kn (B, k, N): neighbor indices, -1 where missing.
    Returns GNSystem with leading (B,) batch dims.
    """
    dt = source_xyz.dtype
    B, k, N = idx_kn.shape
    fk = float(k)

    neigh = target_xyz[jnp.maximum(idx_kn, 0)]            # (B, k, N, 3)
    nx_, ny_, nz_ = neigh[..., 0], neigh[..., 1], neigh[..., 2]  # (B, k, N)

    # centered scatter of the k neighbors (fit_planes' closed form)
    cx = jnp.mean(nx_, axis=1)
    cy = jnp.mean(ny_, axis=1)
    cz = jnp.mean(nz_, axis=1)                            # (B, N)
    dx_ = nx_ - cx[:, None]
    dy_ = ny_ - cy[:, None]
    dz_ = nz_ - cz[:, None]
    sxx = jnp.sum(dx_ * dx_, axis=1)
    sxy = jnp.sum(dx_ * dy_, axis=1)
    sxz = jnp.sum(dx_ * dz_, axis=1)
    syy = jnp.sum(dy_ * dy_, axis=1)
    syz = jnp.sum(dy_ * dz_, axis=1)
    szz = jnp.sum(dz_ * dz_, axis=1)
    lam, V = _eigh3_soa(sxx, sxy, sxz, syy, syz, szz)
    lam = tuple(jnp.maximum(w, 0.0) for w in lam)

    # rank-aware solve of (S + k c c^T) x = -k c in the eigenbasis
    a = tuple(vx * cx + vy * cy + vz * cz for (vx, vy, vz) in V)
    s_dir = tuple(lam[i] + fk * a[i] * a[i] for i in range(3))
    s_max = jnp.maximum(jnp.maximum(s_dir[0], s_dir[1]), s_dir[2])
    eps_rank = 100.0 * jnp.finfo(dt).eps
    active = tuple(s_dir[i] > eps_rank * s_max for i in range(3))
    big = jnp.asarray(jnp.inf, dt)
    mu = jnp.minimum(
        jnp.minimum(jnp.where(active[0], lam[0], big),
                    jnp.where(active[1], lam[1], big)),
        jnp.where(active[2], lam[2], big))
    mu = jnp.where(jnp.isfinite(mu), mu, 0.0)
    r = []
    for i in range(3):
        lam_ok = lam[i] > 1e-30
        ri = jnp.where(lam_ok, mu / jnp.where(lam_ok, lam[i], 1.0), 1.0)
        r.append(jnp.where(active[i], ri, 0.0))
    numx = -(a[0] * r[0] * V[0][0] + a[1] * r[1] * V[1][0]
             + a[2] * r[2] * V[2][0])
    numy = -(a[0] * r[0] * V[0][1] + a[1] * r[1] * V[1][1]
             + a[2] * r[2] * V[2][1])
    numz = -(a[0] * r[0] * V[0][2] + a[1] * r[1] * V[1][2]
             + a[2] * r[2] * V[2][2])
    den = mu / fk + a[0] * a[0] * r[0] + a[1] * a[1] * r[1] \
        + a[2] * a[2] * r[2]
    ok_den = jnp.abs(den) > 1e-30
    inv_den = 1.0 / jnp.where(ok_den, den, 1.0)
    xx = numx * inv_den
    xy = numy * inv_den
    xz = numz * inv_den
    ps_sq = xx * xx + xy * xy + xz * xz
    fit_ok = ok_den & (ps_sq >= 1e-12)
    inv_ps = 1.0 / jnp.sqrt(jnp.where(fit_ok, ps_sq, 1.0))
    nox = xx * inv_ps
    noy = xy * inv_ps
    noz = xz * inv_ps                                     # unit normal
    d_off = inv_ps

    # thickness gate: every neighbor within max_plane_thickness of plane
    pd = (nx_ * nox[:, None] + ny_ * noy[:, None] + nz_ * noz[:, None]
          + d_off[:, None])                               # (B, k, N)
    max_dev = jnp.max(pd * pd, axis=1)
    plane_ok = max_dev < params.max_plane_thickness ** 2

    # world-frame source points per lane (small matmul, MXU)
    p_w = jnp.einsum('nj,bij->bni', source_xyz, Rs) + ts[:, None, :]
    pwx, pwy, pwz = p_w[..., 0], p_w[..., 1], p_w[..., 2]  # (B, N)

    residual = pwx * nox + pwy * noy + pwz * noz + d_off
    s = jnp.maximum(0.0, 1.0 - params.weight_slope * jnp.abs(residual))
    weight_ok = s > params.min_weight
    in_radius = sq_d5 < params.search_radius ** 2
    valid = in_radius & fit_ok & plane_ok & weight_ok
    s = jnp.where(valid, s, 0.0)

    if use_weight_derivative:
        on_ramp = (s > 0.0) & (s < 1.0)
        ds_dr = jnp.where(on_ramp, -weight_slope * jnp.sign(residual), 0.0)
        row_scale = s + residual * ds_dr
    else:
        row_scale = s
    row_scale = jnp.where(valid, row_scale, 0.0)

    # GN rows [-n^T R [p]x, n^T R] = [p x (n^T R), n^T R], componentized
    R = Rs
    nRx = nox * R[:, 0, 0, None] + noy * R[:, 1, 0, None] \
        + noz * R[:, 2, 0, None]
    nRy = nox * R[:, 0, 1, None] + noy * R[:, 1, 1, None] \
        + noz * R[:, 2, 1, None]
    nRz = nox * R[:, 0, 2, None] + noy * R[:, 1, 2, None] \
        + noz * R[:, 2, 2, None]
    px, py, pz = source_xyz[:, 0], source_xyz[:, 1], source_xyz[:, 2]
    J0 = py[None] * nRz - pz[None] * nRy
    J1 = pz[None] * nRx - px[None] * nRz
    J2 = px[None] * nRy - py[None] * nRx
    Js = jnp.stack([J0, J1, J2, nRx, nRy, nRz], axis=1)   # (B, 6, N)
    Js = Js * row_scale[:, None, :]
    b = -(s * residual)                                   # (B, N)

    H = jnp.einsum('bin,bjn->bij', Js, Js)
    g = jnp.einsum('bin,bn->bi', Js, b)

    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
    raw_sq = jnp.where(valid, residual * residual, 0.0)
    rmse = jnp.sqrt(jnp.sum(raw_sq, axis=1)
                    / jnp.maximum(n_valid, 1).astype(dt))
    fitness = jnp.sum(in_radius.astype(dt), axis=1) / float(N)
    objective = 0.5 * jnp.sum(b * b, axis=1)
    return GNSystem(H=H, g=g, num_valid=n_valid, rmse=rmse,
                    fitness=fitness, objective=objective)
