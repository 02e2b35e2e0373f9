"""Joint camera–point–object bundle adjustment.

Parity: `Optimizer::JointBundleAdjustment` / `LocalJointBundleAdjustment`
(`src/Optimizer_util.cc:44-771`): the pose graph gains object vertices
(state T_ow, world->object), linked to keyframes by relative-pose edges
whose measurement is the per-keyframe reconstruction result T_oc
(`det->SE3Tco`); error = log(M^-1 T_ow T_cw^-1), information 1e3*I, Huber
delta = sqrt(0.1 * 1e3) (`Optimizer_util.cc:80-84,446-450`).

TPU-native: the pose state is ONE stacked array (K cameras then O objects,
all SE3).  Reprojection edges touch the camera rows, camera-object edges
scatter 6x6 blocks into the same dense reduced system that the Schur
point-marginalization produces — no new solver, just extra blocks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics
from . import robust
from .reproj import ReprojEdges, edge_chi2, residuals_and_jacobians
from .schur import build_normal_blocks, _inv3x3_spd, solve_dense_pose_system

OBJ_EDGE_INFO = 1e3  # information scale (reference: 1e3 * Identity)
OBJ_EDGE_HUBER2 = 0.1 * 1e3  # delta^2 = 0.1 * 1e3


class ObjectPoseEdges(NamedTuple):
    cam_idx: jax.Array  # (E2,) int32 — camera vertex (0..K-1)
    obj_idx: jax.Array  # (E2,) int32 — object vertex (0..O-1)
    T_oc: jax.Array  # (E2, 4, 4) measured cam->object transform
    valid: jax.Array  # (E2,) bool


class JointBAResult(NamedTuple):
    Tcw: jax.Array  # (K, 4, 4)
    Tow: jax.Array  # (O, 4, 4)
    points: jax.Array  # (N, 3)
    inlier: jax.Array  # (E,) reprojection edges surviving
    obj_inlier: jax.Array  # (E2,) object edges surviving
    cost: jax.Array


def _obj_edge_residual(xi_c, xi_o, Tcw, Tow, M):
    """r = log(M^-1 exp(xi_o) Tow (exp(xi_c) Tcw)^-1) in se3. (6,)."""
    T_oc_pred = (lie.exp_se3(xi_o) @ Tow) @ lie.inv_se3(lie.exp_se3(xi_c) @ Tcw)
    return lie.log_se3(jnp.linalg.inv(M) @ T_oc_pred)


def _obj_edge_system(Tcw_e, Tow_e, M, w):
    """Residual + Jacobians for one camera-object edge.

    Returns r (6,), Jc (6, 6), Jo (6, 6) already information-weighted by w.
    """
    z6 = jnp.zeros(6, Tcw_e.dtype)
    r = _obj_edge_residual(z6, z6, Tcw_e, Tow_e, M)
    Jc = jax.jacfwd(_obj_edge_residual, argnums=0)(z6, z6, Tcw_e, Tow_e, M)
    Jo = jax.jacfwd(_obj_edge_residual, argnums=1)(z6, z6, Tcw_e, Tow_e, M)
    return r, Jc, Jo


@partial(jax.jit, static_argnames=("iters_robust", "iters_final"))
def joint_bundle_adjustment(
    Tcw: jax.Array,  # (K, 4, 4)
    Tow: jax.Array,  # (O, 4, 4)
    points: jax.Array,  # (N, 3)
    cam_fixed: jax.Array,  # (K,) bool
    obj_fixed: jax.Array,  # (O,) bool
    edges: ReprojEdges,
    obj_edges: ObjectPoseEdges,
    intr: Intrinsics,
    baseline_fx: float = 0.0,
    iters_robust: int = 5,
    iters_final: int = 10,
) -> JointBAResult:
    """Two-stage robust LM over cameras + objects + points."""
    K = Tcw.shape[0]
    O = Tow.shape[0]
    N = points.shape[0]
    V = K + O
    dtype = Tcw.dtype
    delta2 = jnp.where(edges.is_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)

    def stage(Tcw, Tow, pts_in, edge_valid, obj_valid, iters, use_huber):
        e = edges._replace(valid=edge_valid)

        # --- helpers operating on the full state
        def full_cost(Tcw_, Tow_, pts_):
            r, _, _, rm, _ = residuals_and_jacobians(Tcw_, pts_, e, intr, baseline_fx)
            chi2 = jnp.sum(r * r * rm, axis=-1) * e.inv_sigma2
            c1 = jnp.where(use_huber, robust.huber_rho(chi2, delta2), chi2)
            c1 = jnp.sum(jnp.where(rm[..., 0] > 0, c1, 0.0))
            ro = jax.vmap(
                lambda ci, oi, M: _obj_edge_residual(
                    jnp.zeros(6, dtype), jnp.zeros(6, dtype), Tcw_[ci], Tow_[oi], M
                )
            )(obj_edges.cam_idx, obj_edges.obj_idx, obj_edges.T_oc)
            chio = jnp.sum(ro * ro, axis=-1) * OBJ_EDGE_INFO
            c2 = jnp.where(use_huber, robust.huber_rho(chio, OBJ_EDGE_HUBER2), chio)
            c2 = jnp.sum(jnp.where(obj_valid, c2, 0.0))
            return c1 + c2

        def body(carry, _):
            Tcw_, Tow_, pts_, lmbda, cost = carry
            # Reprojection part -> normal blocks (camera rows only).
            r, Jc, Jp, rm, _ = residuals_and_jacobians(Tcw_, pts_, e, intr, baseline_fx)
            chi2 = edge_chi2(r, rm, e.inv_sigma2)
            w_edge = jnp.where(
                use_huber, robust.huber_weight(chi2, delta2), jnp.ones_like(chi2)
            )
            w_row = rm * (e.inv_sigma2 * w_edge)[:, None]
            blocks = build_normal_blocks(
                r, Jc, Jp, w_row, e.kf_idx, e.pt_idx, K, N, cam_fixed
            )

            # Object edges -> extra blocks over the V-dim pose state.
            ro, Jce, Joe = jax.vmap(
                lambda ci, oi, M: _obj_edge_system(Tcw_[ci], Tow_[oi], M, 1.0)
            )(obj_edges.cam_idx, obj_edges.obj_idx, obj_edges.T_oc)
            chio = jnp.sum(ro * ro, axis=-1) * OBJ_EDGE_INFO
            wo = jnp.where(
                use_huber,
                robust.huber_weight(chio, OBJ_EDGE_HUBER2),
                jnp.ones_like(chio),
            )
            wo = wo * OBJ_EDGE_INFO * obj_valid.astype(dtype)
            free_c = 1.0 - cam_fixed.astype(dtype)
            free_o = 1.0 - obj_fixed.astype(dtype)
            Jce = Jce * free_c[obj_edges.cam_idx][:, None, None]
            Joe = Joe * free_o[obj_edges.obj_idx][:, None, None]
            JceW = Jce * wo[:, None, None]
            JoeW = Joe * wo[:, None, None]

            # Assemble the V*6 dense system: Schur-reduced cameras + objects.
            Y = _inv3x3_spd(blocks.H_pp, lmbda)
            A = jnp.einsum("nkac,ncd->nkad", blocks.B_nk, Y)
            U = jnp.einsum("nkad,nqbd->kaqb", A, blocks.B_nk)  # (K,6,K,6)
            S = jnp.zeros((V, 6, V, 6), dtype)
            idxK = jnp.arange(K)
            eye6 = jnp.eye(6, dtype=dtype)
            H_cc_d = blocks.H_cc + lmbda * blocks.H_cc * eye6
            S = S.at[:K, :, :K, :].add(-U)
            S = S.at[idxK, :, idxK, :].add(H_cc_d)
            # object-edge blocks
            oi = K + obj_edges.obj_idx
            ci = obj_edges.cam_idx
            S = S.at[ci, :, ci, :].add(jnp.einsum("eri,erj->eij", JceW, Jce))
            S = S.at[oi, :, oi, :].add(jnp.einsum("eri,erj->eij", JoeW, Joe))
            S = S.at[ci, :, oi, :].add(jnp.einsum("eri,erj->eij", JceW, Joe))
            S = S.at[oi, :, ci, :].add(jnp.einsum("eri,erj->eij", JoeW, Jce))
            # extra Marquardt damping on object diagonal blocks
            idxO = K + jnp.arange(O)
            diagO = S[idxO, :, idxO, :]
            S = S.at[idxO, :, idxO, :].add(lmbda * diagO * eye6)

            Yb = jnp.einsum("nab,nb->na", Y, blocks.b_p)
            rhs = jnp.zeros((V, 6), dtype)
            rhs = rhs.at[:K].add(
                blocks.b_c - jnp.einsum("nkac,nc->ka", blocks.B_nk, Yb)
            )
            rhs = rhs.at[ci].add(-jnp.einsum("eri,er->ei", JceW, ro))
            rhs = rhs.at[oi].add(-jnp.einsum("eri,er->ei", JoeW, ro))

            fixed_v = jnp.concatenate([cam_fixed, obj_fixed])
            delta = solve_dense_pose_system(S, rhs, fixed_v)

            dc = delta[:K]
            do = delta[K:]
            Bt_dc = jnp.einsum("nkac,ka->nc", blocks.B_nk, dc)
            dp = jnp.einsum("nab,nb->na", Y, blocks.b_p - Bt_dc)

            Tcw_try = lie.exp_se3(dc) @ Tcw_
            Tow_try = lie.exp_se3(do) @ Tow_
            pts_try = pts_ + dp
            c_try = full_cost(Tcw_try, Tow_try, pts_try)
            accept = c_try < cost
            return (
                jnp.where(accept, Tcw_try, Tcw_),
                jnp.where(accept, Tow_try, Tow_),
                jnp.where(accept, pts_try, pts_),
                jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
                jnp.where(accept, c_try, cost),
            ), None

        cost0 = full_cost(Tcw, Tow, pts_in)
        init = (Tcw, Tow, pts_in, jnp.asarray(1e-3, dtype), cost0)
        (Tcw_n, Tow_n, pts_n, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
        return Tcw_n, Tow_n, pts_n, cost

    # two-stage schedule with chi2 gating between stages
    Tcw1, Tow1, pts1, _ = stage(
        Tcw, Tow, points, edges.valid, obj_edges.valid, iters_robust, True
    )
    r, _, _, rm, depth = residuals_and_jacobians(Tcw1, pts1, edges, intr, baseline_fx)
    chi2 = edge_chi2(r, rm, edges.inv_sigma2)
    th = jnp.where(edges.is_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
    inlier1 = edges.valid & (chi2 <= th) & (depth > 0)
    ro = jax.vmap(
        lambda ci, oi, M: _obj_edge_residual(
            jnp.zeros(6, dtype), jnp.zeros(6, dtype), Tcw1[ci], Tow1[oi], M
        )
    )(obj_edges.cam_idx, obj_edges.obj_idx, obj_edges.T_oc)
    chio = jnp.sum(ro * ro, axis=-1) * OBJ_EDGE_INFO
    obj_inlier1 = obj_edges.valid & (chio <= 4.0 * OBJ_EDGE_HUBER2)

    edges2_valid = inlier1
    Tcw2, Tow2, pts2, cost = stage(
        Tcw1, Tow1, pts1, edges2_valid, obj_inlier1, iters_final, False
    )

    r, _, _, rm, depth = residuals_and_jacobians(Tcw2, pts2, edges, intr, baseline_fx)
    chi2 = edge_chi2(r, rm, edges.inv_sigma2)
    inlier = edges2_valid & (chi2 <= th) & (depth > 0)
    return JointBAResult(
        Tcw=Tcw2, Tow=Tow2, points=pts2, inlier=inlier,
        obj_inlier=obj_inlier1, cost=cost,
    )
