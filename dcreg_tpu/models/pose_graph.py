"""Sliding-window pose-graph optimization on SE(3) -- the back-end layer
behind the reference's (unreleased) SLAM integration, built TPU-first.

Problem: poses T_0..T_{W-1}; edges (i, j) with measured relative transforms
Z_ij and 6x6 information matrices; optional unary priors.  Cost:

    sum_e || log( Z_e^-1 * T_i^-1 * T_j ) ||^2_{Info_e}  +  priors

Gauss-Newton with right perturbation on every pose.  TPU mapping:

  * all edge residuals/Jacobians batched with ``vmap`` (no per-edge loop);
  * the (6W x 6W) normal system is assembled by scatter-add of 6x6 blocks
    -- W is a sliding window (<= ~200), so the dense system is tiny by MXU
    standards and one dense solve per GN step beats any sparse pipeline;
  * the solve is block-Jacobi-preconditioned CG (unrolled, fixed trips) --
    the same machinery as DCReg's targeted PCG, scaled up; no LAPACK;
  * gauge freedom fixed by a prior on pose 0.

Scale-out (SURVEY.md section 2.9 "frame/window parallelism"): shard the
EDGE axis over the mesh and psum the assembled (6W x 6W, 6W) system --
see ``assemble_sharded``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3
from ..utils import precise_jit


class PoseGraphEdges(NamedTuple):
    i: jax.Array        # (E,) int32 source pose index
    j: jax.Array        # (E,) int32 target pose index
    Z: jax.Array        # (E, 4, 4) measured T_i^-1 T_j
    info: jax.Array     # (E, 6, 6) information matrix (weight)
    valid: jax.Array    # (E,) bool


class PoseGraphResult(NamedTuple):
    poses: jax.Array        # (W, 4, 4) optimized
    iterations: jax.Array   # () int32 GN steps executed
    final_cost: jax.Array   # ()
    converged: jax.Array    # () bool


def make_edges(i, j, Z, info=None, valid=None) -> PoseGraphEdges:
    i = jnp.asarray(i, jnp.int32)
    Z = jnp.asarray(Z)
    E = i.shape[0]
    if info is None:
        info = jnp.broadcast_to(jnp.eye(6, dtype=Z.dtype), (E, 6, 6))
    if valid is None:
        valid = jnp.ones(E, bool)
    return PoseGraphEdges(i=i, j=jnp.asarray(j, jnp.int32), Z=Z,
                          info=jnp.asarray(info), valid=valid)


def _edge_residual(T_i, T_j, Z):
    """r = log(Z^-1 T_i^-1 T_j) in [omega, v] ordering, plus the two 6x6
    Jacobian blocks wrt right perturbations of (T_i, T_j).

    J_j = Jr^-1(r) (exact right-Jacobian inverse); J_i = -Jr^-1(r) Ad(E^-1)
    with E = Z^-1 T_i^-1 T_j (first-order exact; the standard pose-graph
    linearization, cf. the reference's manifold conventions
    math_utils.hpp:140-197)."""
    R_i, t_i = T_i[:3, :3], T_i[:3, 3]
    R_j, t_j = T_j[:3, :3], T_j[:3, 3]
    R_z, t_z = Z[:3, :3], Z[:3, 3]
    # E = Z^-1 * (T_i^-1 * T_j)
    R_ij = R_i.T @ R_j
    t_ij = R_i.T @ (t_j - t_i)
    R_e = R_z.T @ R_ij
    t_e = R_z.T @ (t_ij - t_z)
    omega = se3.log_so3(R_e)
    # se(3) log: v = V^-1(omega) t ; use right-Jacobian-inverse approx of V
    Jr_inv = se3.right_jacobian_inv_so3(-omega)   # = V(omega)^-1 approx
    v = Jr_inv @ t_e
    r = jnp.concatenate([omega, v])
    Jri = se3.right_jacobian_inv_so3(omega)
    Jblk = jnp.zeros((6, 6), T_i.dtype)
    Jblk = Jblk.at[:3, :3].set(Jri).at[3:, 3:].set(Jri)
    Ad_Einv = se3.adjoint(R_e.T, -(R_e.T @ t_e))
    J_j = Jblk
    J_i = -(Jblk @ Ad_Einv)
    return r, J_i, J_j


def _assemble(poses, edges: PoseGraphEdges, prior_idx, prior_T, prior_info):
    """Batched residuals -> scatter-added (6W, 6W) H and (6W,) g."""
    W = poses.shape[0]
    dtype = poses.dtype

    def per_edge(i, j, Z, info, valid):
        r, J_i, J_j = _edge_residual(poses[i], poses[j], Z)
        w = jnp.where(valid, 1.0, 0.0).astype(dtype)
        info = info * w
        H_ii = J_i.T @ info @ J_i
        H_ij = J_i.T @ info @ J_j
        H_jj = J_j.T @ info @ J_j
        g_i = -(J_i.T @ (info @ r))
        g_j = -(J_j.T @ (info @ r))
        cost = r @ (info @ r)
        return H_ii, H_ij, H_jj, g_i, g_j, cost

    H_ii, H_ij, H_jj, g_i, g_j, costs = jax.vmap(per_edge)(
        edges.i, edges.j, edges.Z, edges.info, edges.valid)

    H = jnp.zeros((W, W, 6, 6), dtype)
    g = jnp.zeros((W, 6), dtype)
    H = H.at[edges.i, edges.i].add(H_ii)
    H = H.at[edges.i, edges.j].add(H_ij)
    H = H.at[edges.j, edges.i].add(jnp.swapaxes(H_ij, -1, -2))
    H = H.at[edges.j, edges.j].add(H_jj)
    g = g.at[edges.i].add(g_i)
    g = g.at[edges.j].add(g_j)

    # unary priors (incl. the gauge fix on pose 0)
    def per_prior(idx, T_p, info):
        r, _, J = _edge_residual(jnp.eye(4, dtype=dtype), poses[idx], T_p)
        # residual of pose wrt prior: log(T_p^-1 * T_idx); J wrt pose = Jr^-1
        H_b = J.T @ info @ J
        g_b = -(J.T @ (info @ r))
        return H_b, g_b, r @ (info @ r)

    H_p, g_p, cost_p = jax.vmap(per_prior)(prior_idx, prior_T, prior_info)
    H = H.at[prior_idx, prior_idx].add(H_p)
    g = g.at[prior_idx].add(g_p)

    H_full = H.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    g_full = g.reshape(6 * W)
    return H_full, g_full, jnp.sum(costs) + jnp.sum(cost_p)


def _block_jacobi_pcg(H, g, W, iters=64, damping=1e-8):
    """CG on (H + damping I) x = g with a block-diagonal (6x6 inverse)
    preconditioner; unrolled trips with a convergence mask."""
    dtype = H.dtype
    n = 6 * W
    H = H + damping * jnp.eye(n, dtype=dtype)
    blocks = H.reshape(W, 6, W, 6)
    diag = jax.vmap(lambda i: blocks[i, :, i, :])(jnp.arange(W))
    # robust 6x6 block inverse via the shared eigensolver
    from ..ops import linalg
    w, V = linalg.symmetric_eigh(diag)
    w_inv = 1.0 / jnp.maximum(jnp.abs(w), 1e-12) * jnp.sign(
        jnp.where(w == 0, 1.0, w))
    P_blocks = jnp.einsum("wij,wj,wkj->wik", V, w_inv, V)

    def applyP(r):
        return jnp.einsum("wij,wj->wi", P_blocks,
                          r.reshape(W, 6)).reshape(n)

    x = jnp.zeros(n, dtype)
    r = g
    z = applyP(r)
    p = z
    rz = r @ z
    thresh = 1e-10 * jnp.maximum(jnp.linalg.norm(g), 1e-30)
    done = jnp.asarray(False)

    def body(_, carry):
        x, r, z, p, rz, done = carry
        Hp = H @ p
        pHp = p @ Hp
        safe = jnp.abs(pHp) > 1e-30
        alpha = jnp.where(safe & ~done, rz / jnp.where(safe, pHp, 1.0), 0.0)
        x = x + alpha * p
        r_new = r - alpha * Hp
        z_new = applyP(r_new)
        rz_new = r_new @ z_new
        beta = jnp.where(jnp.abs(rz) > 1e-30,
                         rz_new / jnp.where(jnp.abs(rz) > 1e-30, rz, 1.0),
                         0.0)
        p_new = z_new + beta * p
        nd = done | (jnp.linalg.norm(r_new) <= thresh) | ~safe
        keep = lambda a, b: jnp.where(done, a, b)
        return (x, keep(r, r_new), keep(z, z_new), keep(p, p_new),
                keep(rz, rz_new), nd)

    x, *_ = jax.lax.fori_loop(0, iters, body, (x, r, z, p, rz, done))
    return x


@precise_jit(static_argnames=("max_gn_iters", "cg_iters"))
def optimize_pose_graph(poses0, edges: PoseGraphEdges,
                        prior_idx=None, prior_T=None, prior_info=None,
                        max_gn_iters: int = 10, cg_iters: int = 64,
                        tol: float = 1e-8) -> PoseGraphResult:
    """Gauss-Newton pose-graph optimization over a pose window.

    poses0: (W, 4, 4) initial guesses.  By default pose 0 is pinned with a
    strong prior (gauge fix)."""
    dtype = poses0.dtype
    W = poses0.shape[0]
    if prior_idx is None:
        prior_idx = jnp.asarray([0], jnp.int32)
        prior_T = poses0[:1]
        prior_info = 1e8 * jnp.broadcast_to(jnp.eye(6, dtype=dtype),
                                            (1, 6, 6))

    def gn_step(state):
        it, poses, cost_prev, converged = state
        H, g, cost = _assemble(poses, edges, prior_idx, prior_T, prior_info)
        dx = _block_jacobi_pcg(H, g, W, iters=cg_iters)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        dxw = dx.reshape(W, 6)

        def retract(T, d):
            R, t = T[:3, :3], T[:3, 3]
            R_new, t_new = se3.boxplus(R, t, d)
            return se3.se3_matrix(R_new, t_new)

        poses_new = jax.vmap(retract)(poses, dxw)
        conv = jnp.linalg.norm(dx) < tol * W
        return (it + 1, poses_new, cost, conv)

    def cond(state):
        it, _, _, converged = state
        return (it < max_gn_iters) & ~converged

    it, poses, cost, converged = jax.lax.while_loop(
        cond, gn_step, (jnp.asarray(0, jnp.int32), poses0,
                        jnp.asarray(jnp.inf, dtype), jnp.asarray(False)))
    _, _, final_cost = _assemble(poses, edges, prior_idx, prior_T,
                                 prior_info)
    return PoseGraphResult(poses=poses, iterations=it,
                           final_cost=final_cost, converged=converged)


def assemble_sharded(mesh, poses, edges: PoseGraphEdges, prior_idx, prior_T,
                     prior_info):
    """Mesh-sharded normal-system assembly: edges sharded over axis 'data',
    the (6W, 6W) system psum'd -- the window-parallel analogue of the GN
    point reduction (SURVEY.md section 2.9)."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def body(i, j, Z, info, valid):
        e = PoseGraphEdges(i=i, j=j, Z=Z, info=info, valid=valid)
        H, g, cost = _assemble(poses, e, prior_idx, prior_T, prior_info)
        n_data = jax.lax.psum(1, "data")
        # priors were added on every shard; keep exactly one copy
        return (jax.lax.psum(H, "data"),
                jax.lax.psum(g, "data"),
                jax.lax.psum(cost, "data"), n_data)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P("data"), P("data"), P("data", None, None),
                             P("data", None, None), P("data")),
                   out_specs=(P(), P(), P(), P()), check_vma=False)
    H, g, cost, n_data = fn(edges.i, edges.j, edges.Z, edges.info,
                            edges.valid)
    # subtract the (n_data - 1) duplicate prior contributions
    Hp, gp, cp = _prior_system(poses, prior_idx, prior_T, prior_info)
    scale = (n_data - 1).astype(H.dtype)
    return H - scale * Hp, g - scale * gp, cost - scale * cp


def _prior_system(poses, prior_idx, prior_T, prior_info):
    W = poses.shape[0]
    dtype = poses.dtype
    empty = PoseGraphEdges(
        i=jnp.zeros(1, jnp.int32), j=jnp.zeros(1, jnp.int32),
        Z=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (1, 4, 4)),
        info=jnp.zeros((1, 6, 6), dtype), valid=jnp.zeros(1, bool))
    return _assemble(poses, empty, prior_idx, prior_T, prior_info)
