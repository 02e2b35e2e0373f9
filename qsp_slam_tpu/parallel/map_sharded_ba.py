"""Map-block-sharded bundle adjustment: POINTS sharded over the device mesh.

Complements `parallel/sharded_ba.py` (edges sharded, all state replicated):
here each device OWNS a contiguous block of map points plus every observation
of those points, laid out as a dense per-point slot table.  This is the
"long-context" scaling axis of the SLAM workload (SURVEY.md §5): whole-map
global BA where the map no longer fits one chip.

Memory per device divides by the mesh size for everything point-indexed —
points, H_pp, Y, and crucially the (n, K, 6, 3) camera-point coupling tensor
(the dominant term for big maps).  Camera state (K keyframes) is replicated:
K is thousands at most, while N is hundreds of thousands.

Per LM iteration the communication is two small collectives riding ICI: one
fused psum of the Schur-reduced camera system — (6K)^2 + 6K floats — and one
scalar psum of the candidate cost for the accept test (plus a single upfront
cost psum before the loop).  Point marginalization (3x3 closed-form
inverses), residual/Jacobian evaluation, and back-substitution are fully
local to each shard.

The reference has no equivalent: its global BA is a single-core g2o run over
the whole pointer graph (`src/Optimizer.cc:54`, `GlobalJointBundleAdjustemnt`
`src/Optimizer_util.cc:36`); its only map-scaling tools are culling and local
windows.  This module is the TPU-native answer to the same problem.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import lie
from ..core.camera import Intrinsics
from ..opt import robust
from ..opt.reproj import ReprojEdges, residuals_and_jacobians
from ..opt.schur import _inv3x3_spd, point_slot_table, solve_reduced_camera
from .mesh import make_mesh


class SlotEdges(NamedTuple):
    """Per-point dense observation table: row n = all edges of point n.

    Fixed slot capacity S; `valid` masks empty slots.  A point observes a
    camera at most once, so row n's kf entries are distinct where valid.
    """

    kf: jax.Array  # (N, S) int32 — observing camera (0 where invalid)
    uv: jax.Array  # (N, S, 2)
    u_right: jax.Array  # (N, S) — right-cam u for stereo rows, -1 for mono
    inv_sigma2: jax.Array  # (N, S)
    valid: jax.Array  # (N, S) bool


def required_slots(edges: ReprojEdges, num_points: int) -> int:
    """Slot capacity needed so no observation is dropped (max edges/point)."""
    counts = jnp.bincount(
        jnp.where(edges.valid, edges.pt_idx, num_points),
        length=num_points + 1,
    )[:num_points]
    return int(jnp.max(counts))


def _warn_dropped(dropped) -> None:
    if int(dropped) > 0:
        import warnings

        warnings.warn(
            f"edges_to_slots: {int(dropped)} observations dropped — slot "
            "capacity is smaller than the max observations per point; the "
            "sharded solve is optimizing a reduced graph"
        )


def edges_to_slots(
    edges: ReprojEdges, num_points: int, slots: int | None = None
) -> SlotEdges:
    """Regroup an edge list by point into the (N, S) slot layout.

    Runs once per BA program (the edge structure is fixed across LM
    iterations).  `slots=None` sizes the table from the data (max valid
    observations of any point — requires concrete arrays).  An explicit
    `slots` smaller than that is an error when the inputs are concrete:
    silently dropping the excess observations would make the sharded solve
    optimize a different graph than the single-device one.
    """
    traced = isinstance(edges.pt_idx, jax.core.Tracer)
    if slots is None or not traced:
        need = required_slots(edges, num_points)
        if slots is None:
            slots = max(need, 1)
        elif need > slots:
            raise ValueError(
                f"edges_to_slots: slot capacity {slots} < max observations "
                f"per point {need}; observations would be silently dropped"
            )
    table = point_slot_table(edges.pt_idx, edges.valid, num_points, slots)
    ok = table >= 0
    if traced:
        # Under jit the capacity check above cannot run at trace time;
        # surface any drop at EXECUTION time instead of silently
        # optimizing a reduced graph.
        dropped = jnp.sum(edges.valid) - jnp.sum(ok & edges.valid[jnp.clip(table, 0)])
        jax.debug.callback(_warn_dropped, dropped)
    eid = jnp.clip(table, 0)
    return SlotEdges(
        kf=jnp.where(ok, edges.kf_idx[eid], 0).astype(jnp.int32),
        uv=jnp.where(ok[..., None], edges.uv[eid], 0.0),
        u_right=jnp.where(ok, edges.u_right[eid], -1.0),
        inv_sigma2=jnp.where(ok, edges.inv_sigma2[eid], 0.0),
        valid=ok & edges.valid[eid],
    )


def pad_points_for_mesh(
    points: jax.Array, slots: SlotEdges, num_shards: int
) -> tuple[jax.Array, SlotEdges]:
    """Pad the point axis so it divides the mesh axis size."""
    N = points.shape[0]
    Np = -(-N // num_shards) * num_shards
    if Np == N:
        return points, slots
    pad = Np - N

    def padf(x, fill=0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    return padf(points), SlotEdges(
        kf=padf(slots.kf),
        uv=padf(slots.uv),
        u_right=padf(slots.u_right, -1.0),
        inv_sigma2=padf(slots.inv_sigma2),
        valid=padf(slots.valid, False),
    )


def map_sharded_ba(
    mesh: Mesh,
    Tcw: jax.Array,
    points: jax.Array,
    cam_fixed: jax.Array,
    slots: SlotEdges,
    intr: Intrinsics,
    baseline_fx: float = 0.0,
    iters: int = 10,
    use_huber: bool = True,
    axis: str = "map",
    pre_padded: bool = False,
):
    """LM bundle adjustment with map points sharded over `mesh[axis]`.

    Returns (Tcw, points, cost).  `points` and every SlotEdges array are
    sharded on the point axis; cameras are replicated.  Two collectives per
    iteration (fused reduced-camera-system psum + scalar accept-test psum);
    points never leave their shard.
    """
    K = Tcw.shape[0]
    N_orig = points.shape[0]
    if not pre_padded:
        points, slots = pad_points_for_mesh(points, slots, mesh.shape[axis])

    rep = P()
    shd = P(axis)
    slot_specs = SlotEdges(shd, shd, shd, shd, shd)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, shd, rep, slot_specs),
        out_specs=(rep, shd, rep),
        check_vma=False,
    )
    def run(Tcw0, pts0, fixed0, s):
        n, S = s.kf.shape  # local block of points
        free = 1.0 - fixed0.astype(pts0.dtype)

        # Local slot rows as a flat edge list over this shard's points.
        e = ReprojEdges(
            kf_idx=s.kf.reshape(-1),
            pt_idx=jnp.repeat(jnp.arange(n, dtype=jnp.int32), S),
            uv=s.uv.reshape(-1, 2),
            u_right=s.u_right.reshape(-1),
            inv_sigma2=s.inv_sigma2.reshape(-1),
            valid=s.valid.reshape(-1),
        )
        d2 = jnp.where(e.is_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
        onehot_k = jax.nn.one_hot(s.kf, K, dtype=pts0.dtype)  # (n, S, K)

        def cost_at(T, p):
            r, _, _, row_mask, _ = residuals_and_jacobians(
                T, p, e, intr, baseline_fx
            )
            chi2 = jnp.sum(r * r * row_mask, axis=-1) * e.inv_sigma2
            c = jnp.where(use_huber, robust.huber_rho(chi2, d2), chi2)
            local = jnp.sum(jnp.where(row_mask[..., 0] > 0, c, 0.0))
            return jax.lax.psum(local, axis)

        def body(carry, _):
            T, p, lmbda, cost = carry
            r, Jc, Jp, row_mask, _ = residuals_and_jacobians(
                T, p, e, intr, baseline_fx
            )
            chi2 = jnp.sum(r * r * row_mask, axis=-1) * e.inv_sigma2
            w_edge = jnp.where(
                use_huber, robust.huber_weight(chi2, d2), jnp.ones_like(chi2)
            )
            w = (row_mask * (e.inv_sigma2 * w_edge)[:, None]).reshape(n, S, 3)
            r_s = r.reshape(n, S, 3)
            Jc_s = Jc.reshape(n, S, 3, 6) * free[s.kf][..., None, None]
            Jp_s = Jp.reshape(n, S, 3, 3)
            JcW = Jc_s * w[..., None]
            JpW = Jp_s * w[..., None]

            # Camera-side partials (psum'd below inside the reduced system).
            H_cc = jnp.einsum("nsra,nsrb,nsk->kab", JcW, Jc_s, onehot_k)
            b_c = -jnp.einsum("nsra,nsr,nsk->ka", JcW, r_s, onehot_k)
            # Point-side: fully local.
            H_pp = jnp.einsum("nsra,nsrb->nab", JpW, Jp_s)
            b_p = -jnp.einsum("nsra,nsr->na", JpW, r_s)
            B = jnp.einsum("nsra,nsrb,nsk->nkab", JcW, Jp_s, onehot_k)

            Y = _inv3x3_spd(H_pp, lmbda)  # (n, 3, 3)
            A = jnp.einsum("nkac,ncd->nkad", B, Y)
            U = jnp.einsum("nkad,nqbd->kaqb", A, B)
            Yb = jnp.einsum("nab,nb->na", Y, b_p)
            rhs = b_c - jnp.einsum("nkac,nc->ka", B, Yb)

            # ONE fused psum: the reduced camera system + its diagonal blocks.
            H_cc, U, rhs = jax.lax.psum((H_cc, U, rhs), axis)
            delta_c = solve_reduced_camera(H_cc, U, rhs, lmbda, fixed0)

            # Back-substitution stays on-shard.
            Bt_dc = jnp.einsum("nkac,ka->nc", B, delta_c)
            delta_p = jnp.einsum("nab,nb->na", Y, b_p - Bt_dc)

            T_try = lie.exp_se3(delta_c) @ T
            p_try = p + delta_p
            new_cost = cost_at(T_try, p_try)
            accept = new_cost < cost
            return (
                jnp.where(accept, T_try, T),
                jnp.where(accept, p_try, p),
                jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
                jnp.where(accept, new_cost, cost),
            ), None

        cost0 = cost_at(Tcw0, pts0)
        init = (Tcw0, pts0, jnp.asarray(1e-3, Tcw0.dtype), cost0)
        (T, p, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
        return T, p, cost

    T, p, cost = run(Tcw, points, cam_fixed, slots)
    return T, p[:N_orig], cost


def map_sharded_joint_ba(
    mesh: Mesh,
    Tcw: jax.Array,  # (K, 4, 4)
    Tow: jax.Array,  # (O, 4, 4) object vertices (world->object)
    points: jax.Array,  # (N, 3)
    cam_fixed: jax.Array,  # (K,) bool
    obj_fixed: jax.Array,  # (O,) bool
    slots: SlotEdges,
    obj_edges,  # opt.joint_ba.ObjectPoseEdges (replicated — O(objects) rows)
    intr: Intrinsics,
    baseline_fx: float = 0.0,
    iters: int = 10,
    axis: str = "map",
    pre_padded: bool = False,
):
    """Joint camera-point-OBJECT LM with map points sharded over `mesh[axis]`.

    The distributed form of `opt.joint_ba.joint_bundle_adjustment` (parity:
    `Optimizer::GlobalJointBundleAdjustemnt`, `src/Optimizer_util.cc:36`,
    dispatched post-loop by `RunGlobalJointBundleAdjustment`,
    `src/LoopClosing_util.cc:295`): reprojection work and point
    marginalization are local to each point shard; the camera-object
    relative-pose edges (a few hundred rows at most) are evaluated
    REPLICATED on every device and added to the reduced pose system AFTER
    the one fused psum — identical values everywhere, so no extra
    collective and no double counting.  Returns (Tcw, Tow, points, cost).
    """
    from ..opt.joint_ba import (
        OBJ_EDGE_HUBER2,
        OBJ_EDGE_INFO,
        _obj_edge_residual,
        _obj_edge_system,
    )
    from ..opt.schur import solve_dense_pose_system

    K = Tcw.shape[0]
    O = Tow.shape[0]
    V = K + O
    dtype = Tcw.dtype
    N_orig = points.shape[0]
    if not pre_padded:
        points, slots = pad_points_for_mesh(points, slots, mesh.shape[axis])

    rep = P()
    shd = P(axis)
    slot_specs = SlotEdges(shd, shd, shd, shd, shd)
    oe_specs = type(obj_edges)(rep, rep, rep, rep)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, shd, rep, rep, slot_specs, oe_specs),
        out_specs=(rep, rep, shd, rep),
        check_vma=False,
    )
    def run(Tcw0, Tow0, pts0, cfix, ofix, s, oe):
        n, S_slots = s.kf.shape
        free_c = 1.0 - cfix.astype(dtype)
        free_o = 1.0 - ofix.astype(dtype)
        z6 = jnp.zeros(6, dtype)

        e = ReprojEdges(
            kf_idx=s.kf.reshape(-1),
            pt_idx=jnp.repeat(jnp.arange(n, dtype=jnp.int32), S_slots),
            uv=s.uv.reshape(-1, 2),
            u_right=s.u_right.reshape(-1),
            inv_sigma2=s.inv_sigma2.reshape(-1),
            valid=s.valid.reshape(-1),
        )
        d2 = jnp.where(e.is_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
        onehot_k = jax.nn.one_hot(s.kf, K, dtype=dtype)  # (n, S, K)

        def obj_cost(T, Tw):
            ro = jax.vmap(
                lambda ci, oi, M: _obj_edge_residual(z6, z6, T[ci], Tw[oi], M)
            )(oe.cam_idx, oe.obj_idx, oe.T_oc)
            chio = jnp.sum(ro * ro, axis=-1) * OBJ_EDGE_INFO
            c = robust.huber_rho(chio, OBJ_EDGE_HUBER2)
            return jnp.sum(jnp.where(oe.valid, c, 0.0))

        def cost_at(T, Tw, p):
            r, _, _, row_mask, _ = residuals_and_jacobians(
                T, p, e, intr, baseline_fx
            )
            chi2 = jnp.sum(r * r * row_mask, axis=-1) * e.inv_sigma2
            c = robust.huber_rho(chi2, d2)
            local = jnp.sum(jnp.where(row_mask[..., 0] > 0, c, 0.0))
            # Point cost is sharded (psum); object cost is replicated (not).
            return jax.lax.psum(local, axis) + obj_cost(T, Tw)

        def body(carry, _):
            T, Tw, p, lmbda, cost = carry
            r, Jc, Jp, row_mask, _ = residuals_and_jacobians(
                T, p, e, intr, baseline_fx
            )
            chi2 = jnp.sum(r * r * row_mask, axis=-1) * e.inv_sigma2
            w_edge = robust.huber_weight(chi2, d2)
            w = (row_mask * (e.inv_sigma2 * w_edge)[:, None]).reshape(n, S_slots, 3)
            r_s = r.reshape(n, S_slots, 3)
            Jc_s = Jc.reshape(n, S_slots, 3, 6) * free_c[s.kf][..., None, None]
            Jp_s = Jp.reshape(n, S_slots, 3, 3)
            JcW = Jc_s * w[..., None]
            JpW = Jp_s * w[..., None]

            H_cc = jnp.einsum("nsra,nsrb,nsk->kab", JcW, Jc_s, onehot_k)
            b_c = -jnp.einsum("nsra,nsr,nsk->ka", JcW, r_s, onehot_k)
            H_pp = jnp.einsum("nsra,nsrb->nab", JpW, Jp_s)
            b_p = -jnp.einsum("nsra,nsr->na", JpW, r_s)
            B = jnp.einsum("nsra,nsrb,nsk->nkab", JcW, Jp_s, onehot_k)

            Y = _inv3x3_spd(H_pp, lmbda)
            A = jnp.einsum("nkac,ncd->nkad", B, Y)
            U = jnp.einsum("nkad,nqbd->kaqb", A, B)
            Yb = jnp.einsum("nab,nb->na", Y, b_p)
            rhs_c = b_c - jnp.einsum("nkac,nc->ka", B, Yb)

            # ONE fused psum of the point-marginalized camera system.
            H_cc, U, rhs_c = jax.lax.psum((H_cc, U, rhs_c), axis)

            # Camera-object edges: replicated evaluation, added ONCE.
            ro, Jce, Joe = jax.vmap(
                lambda ci, oi, M: _obj_edge_system(T[ci], Tw[oi], M, 1.0)
            )(oe.cam_idx, oe.obj_idx, oe.T_oc)
            chio = jnp.sum(ro * ro, axis=-1) * OBJ_EDGE_INFO
            wo = robust.huber_weight(chio, OBJ_EDGE_HUBER2)
            wo = wo * OBJ_EDGE_INFO * oe.valid.astype(dtype)
            Jce = Jce * free_c[oe.cam_idx][:, None, None]
            Joe = Joe * free_o[oe.obj_idx][:, None, None]
            JceW = Jce * wo[:, None, None]
            JoeW = Joe * wo[:, None, None]

            eye6 = jnp.eye(6, dtype=dtype)
            H_cc_d = H_cc + lmbda * H_cc * eye6
            Sv = jnp.zeros((V, 6, V, 6), dtype)
            idxK = jnp.arange(K)
            Sv = Sv.at[:K, :, :K, :].add(-U)
            Sv = Sv.at[idxK, :, idxK, :].add(H_cc_d)
            ci = oe.cam_idx
            oi = K + oe.obj_idx
            Sv = Sv.at[ci, :, ci, :].add(jnp.einsum("eri,erj->eij", JceW, Jce))
            Sv = Sv.at[oi, :, oi, :].add(jnp.einsum("eri,erj->eij", JoeW, Joe))
            Sv = Sv.at[ci, :, oi, :].add(jnp.einsum("eri,erj->eij", JceW, Joe))
            Sv = Sv.at[oi, :, ci, :].add(jnp.einsum("eri,erj->eij", JoeW, Jce))
            idxO = K + jnp.arange(O)
            diagO = Sv[idxO, :, idxO, :]
            Sv = Sv.at[idxO, :, idxO, :].add(lmbda * diagO * eye6)

            rhs_v = jnp.zeros((V, 6), dtype)
            rhs_v = rhs_v.at[:K].add(rhs_c)
            rhs_v = rhs_v.at[ci].add(-jnp.einsum("eri,er->ei", JceW, ro))
            rhs_v = rhs_v.at[oi].add(-jnp.einsum("eri,er->ei", JoeW, ro))

            fixed_v = jnp.concatenate([cfix, ofix])
            delta = solve_dense_pose_system(Sv, rhs_v, fixed_v)
            dc, do = delta[:K], delta[K:]

            Bt_dc = jnp.einsum("nkac,ka->nc", B, dc)
            delta_p = jnp.einsum("nab,nb->na", Y, b_p - Bt_dc)

            T_try = lie.exp_se3(dc) @ T
            Tw_try = lie.exp_se3(do) @ Tw
            p_try = p + delta_p
            new_cost = cost_at(T_try, Tw_try, p_try)
            accept = new_cost < cost
            return (
                jnp.where(accept, T_try, T),
                jnp.where(accept, Tw_try, Tw),
                jnp.where(accept, p_try, p),
                jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
                jnp.where(accept, new_cost, cost),
            ), None

        cost0 = cost_at(Tcw0, Tow0, pts0)
        init = (Tcw0, Tow0, pts0, jnp.asarray(1e-3, dtype), cost0)
        (T, Tw, p, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
        return T, Tw, p, cost

    T, Tw, p, cost = run(Tcw, Tow, points, cam_fixed, obj_fixed, slots, obj_edges)
    return T, Tw, p[:N_orig], cost


def make_map_mesh(num_devices: int | None = None, axis: str = "map") -> Mesh:
    return make_mesh(num_devices, axis)
