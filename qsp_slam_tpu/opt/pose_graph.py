"""Relative-pose graph optimization over SE(3) or Sim(3).

Parity:
  * SE(3) mode ≈ the camera-object edges `EdgeSE3LieAlgebra`
    (`include/ObjectPoseGraph.h:57-88`, error = log(Z^-1 Ti Tj^-1)) used by
    `JointBundleAdjustment` (`src/Optimizer_util.cc:44-307`);
  * Sim(3) mode ≈ `Optimizer::OptimizeEssentialGraph`
    (`src/Optimizer.cc:785-1049`), the loop-closing pose graph.

Design: vertices hold world->frame transforms T_iw (Sim3: sR | t).  Edge
(i, j) with measurement M_ij ≈ T_iw T_jw^-1 contributes the tangent residual
r = log(M_ij^-1 T_iw T_jw^-1).  Jacobians wrt the left perturbations of both
endpoints come from forward-mode autodiff (12/14 tangents per edge — small),
the dense Hessian assembles with scatter-adds (graphs here are hundreds of
vertices), and LM solves with Jacobi-scaled Cholesky as in `opt.schur`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class PoseGraphEdges(NamedTuple):
    i: jax.Array  # (E,) int32
    j: jax.Array  # (E,) int32
    T_ij: jax.Array  # (E, 4, 4) measured relative transform T_iw T_jw^-1
    weight: jax.Array  # (E,) f32 information scale (0 disables)


def _residual(T_i, T_j, M_ij, sim3: bool):
    rel = jnp.linalg.inv(M_ij) @ T_i @ (lie.inv_sim3(T_j) if sim3 else lie.inv_se3(T_j))
    return lie.log_sim3(rel) if sim3 else lie.log_se3(rel)


@partial(jax.jit, static_argnames=("sim3", "iters"))
def optimize_pose_graph(
    poses: jax.Array,  # (V, 4, 4) T_iw (Sim3: sR block)
    fixed: jax.Array,  # (V,) bool
    edges: PoseGraphEdges,
    sim3: bool = False,
    iters: int = 20,
) -> tuple[jax.Array, jax.Array]:
    """LM pose-graph optimization; returns (poses, final_cost)."""
    V = poses.shape[0]
    d = 7 if sim3 else 6
    exp = lie.exp_sim3 if sim3 else lie.exp_se3

    def edge_res(xi_i, xi_j, T_i, T_j, M):
        return _residual(exp(xi_i) @ T_i, exp(xi_j) @ T_j, M, sim3)

    def build(poses):
        T_i = poses[edges.i]
        T_j = poses[edges.j]
        z = jnp.zeros((edges.i.shape[0], d), poses.dtype)
        r = jax.vmap(lambda a, b, m: edge_res(jnp.zeros(d), jnp.zeros(d), a, b, m))(
            T_i, T_j, edges.T_ij
        )  # (E, d)
        Ji = jax.vmap(
            lambda a, b, m: jax.jacfwd(edge_res, argnums=0)(
                jnp.zeros(d), jnp.zeros(d), a, b, m
            )
        )(T_i, T_j, edges.T_ij)  # (E, d, d)
        Jj = jax.vmap(
            lambda a, b, m: jax.jacfwd(edge_res, argnums=1)(
                jnp.zeros(d), jnp.zeros(d), a, b, m
            )
        )(T_i, T_j, edges.T_ij)
        w = edges.weight
        # Disable updates into fixed vertices at the source.
        free = 1.0 - fixed.astype(poses.dtype)
        Ji = Ji * free[edges.i][:, None, None]
        Jj = Jj * free[edges.j][:, None, None]

        H = jnp.zeros((V, d, V, d), poses.dtype)
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        H = H.at[edges.i, :, edges.i, :].add(jnp.einsum("eri,erj->eij", JiW, Ji))
        H = H.at[edges.j, :, edges.j, :].add(jnp.einsum("eri,erj->eij", JjW, Jj))
        H = H.at[edges.i, :, edges.j, :].add(jnp.einsum("eri,erj->eij", JiW, Jj))
        H = H.at[edges.j, :, edges.i, :].add(jnp.einsum("eri,erj->eij", JjW, Ji))
        g = jnp.zeros((V, d), poses.dtype)
        g = g.at[edges.i].add(-jnp.einsum("eri,er->ei", JiW, r))
        g = g.at[edges.j].add(-jnp.einsum("eri,er->ei", JjW, r))
        cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
        return H.reshape(V * d, V * d), g.reshape(V * d), cost

    def cost_at(poses):
        T_i = poses[edges.i]
        T_j = poses[edges.j]
        r = jax.vmap(lambda a, b, m: _residual(a, b, m, sim3))(T_i, T_j, edges.T_ij)
        return jnp.sum(edges.weight * jnp.sum(r * r, axis=-1))

    fixed_d = jnp.repeat(fixed, d)

    def body(carry, _):
        poses, lmbda, cost = carry
        H, g, _ = build(poses)
        H = jnp.where(fixed_d[:, None] | fixed_d[None, :], 0.0, H)
        diag = jnp.diagonal(H)
        H = H + jnp.diag(lmbda * diag + 1e-8 + fixed_d.astype(poses.dtype))
        g = g * (1.0 - fixed_d.astype(poses.dtype))
        dinv = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(H), 1e-12))
        H_sc = 0.5 * (H + H.T) * dinv[:, None] * dinv[None, :]
        chol, low = jax.scipy.linalg.cho_factor(H_sc, lower=True)
        delta = (jax.scipy.linalg.cho_solve((chol, low), g * dinv) * dinv).reshape(V, d)
        poses_try = jax.vmap(lambda x, T: exp(x) @ T)(delta, poses)
        c_try = cost_at(poses_try)
        accept = c_try < cost
        return (
            jnp.where(accept, poses_try, poses),
            jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-8, 1e6),
            jnp.where(accept, c_try, cost),
        ), None

    init = (poses, jnp.asarray(1e-4, poses.dtype), cost_at(poses))
    (poses, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
    return poses, cost


def relative_measurement(T_iw: jax.Array, T_jw: jax.Array, sim3: bool = False):
    """Build the edge measurement M_ij = T_iw T_jw^-1 from two poses."""
    return T_iw @ (lie.inv_sim3(T_jw) if sim3 else lie.inv_se3(T_jw))
