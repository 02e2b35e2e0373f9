"""Distributed global BA on the LIVE map: MapState in, corrected map out.

This is the product seam for the sharded solvers (`parallel/map_sharded_ba`):
the post-loop whole-map optimization (`LoopClosing::RunGlobalBundleAdjustment`,
`/root/reference/src/LoopClosing.cc:655`; joint variant
`RunGlobalJointBundleAdjustment`, `src/LoopClosing_util.cc:295`) and the
opt-in full-map optimization (`SlamSystem.run_global_ba`).  On one device the
system uses `local_mapping.global_ba_step` / `joint_mapping.joint_ba_step`;
with a multi-device mesh the SAME problem is solved with map points (and all
point-indexed solver state — H_pp, Y, the (n, K, 6, 3) coupling tensor)
sharded over the mesh, two collectives per LM iteration riding ICI.

The conversion from the map's flat edge store to the per-point slot table
runs once per call (loop closures are rare events); slot capacity is bucketed
to powers of two so repeated closures reuse compiled programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..core import lie, quadric
from ..opt.joint_ba import ObjectPoseEdges
from ..opt.reproj import ReprojEdges
from ..parallel.map_sharded_ba import (
    edges_to_slots,
    map_sharded_ba,
    map_sharded_joint_ba,
    required_slots,
)
from .map import MapState
from .objects import ObjectTable
from .tracking import TrackingConfig


def _global_problem(m: MapState, cfg: TrackingConfig):
    """Whole-map BA problem from the SoA store (same setup as
    `local_mapping.global_ba_step`: gauge anchored at KF 0)."""
    Kmax = m.kf_Tcw.shape[0]
    kf_ids = jnp.arange(Kmax, dtype=jnp.int32)
    in_map = kf_ids < m.num_kfs
    cam_fixed = (kf_ids == 0) | ~in_map
    valid = m.ob_valid & in_map[m.ob_kf] & m.pt_valid[m.ob_pt]
    inv_sigma2 = (1.0 / cfg.orb.pyramid.scale_factor ** 2) ** m.ob_octave.astype(
        jnp.float32
    )
    edges = ReprojEdges(
        kf_idx=m.ob_kf,
        pt_idx=m.ob_pt,
        uv=m.ob_uv,
        u_right=m.ob_ur,
        inv_sigma2=inv_sigma2,
        valid=valid,
    )
    return in_map, cam_fixed, edges


def _slots_pow2(edges: ReprojEdges, num_points: int):
    """Slot table with power-of-2 capacity (few distinct compiled shapes)."""
    need = max(int(required_slots(edges, num_points)), 1)
    cap = 1 << (need - 1).bit_length()
    return edges_to_slots(edges, num_points, slots=cap)


def global_ba_sharded(
    m: MapState, cfg: TrackingConfig, mesh: Mesh, iters: int = 10
) -> MapState:
    """Whole-map point BA, map-sharded over `mesh` (the distributed form of
    `local_mapping.global_ba_step`)."""
    in_map, cam_fixed, edges = _global_problem(m, cfg)
    slots = _slots_pow2(edges, m.pt_xyz.shape[0])
    axis = mesh.axis_names[0]
    T, p, _ = map_sharded_ba(
        mesh, m.kf_Tcw, m.pt_xyz, cam_fixed, slots, cfg.intr,
        baseline_fx=cfg.bf, iters=iters, axis=axis,
    )
    return m._replace(
        kf_Tcw=jnp.where(in_map[:, None, None], T, m.kf_Tcw),
        pt_xyz=p,
    )


def global_joint_ba_sharded(
    m: MapState,
    objects: ObjectTable,
    cfg: TrackingConfig,
    mesh: Mesh,
    iters: int = 10,
) -> tuple[MapState, ObjectTable]:
    """Whole-map JOINT camera-point-object BA, map-sharded over `mesh`.

    Object vertex/edge setup mirrors `joint_mapping.joint_ba_step` with the
    window widened to the full map (camera index == keyframe id); objects
    with fewer than 2 measurements stay fixed.
    """
    in_map, cam_fixed, edges = _global_problem(m, cfg)
    slots = _slots_pow2(edges, m.pt_xyz.shape[0])
    axis = mesh.axis_names[0]

    Omax = objects.ellipsoid.shape[0]
    R_e = quadric.euler_to_rotmat(objects.ellipsoid[:, 3:6])
    T_wo = jax.vmap(lie.rt_to_se3)(R_e, objects.ellipsoid[:, 0:3])
    Tow = jax.vmap(lie.inv_se3)(T_wo)

    Mring = objects.pm_kf.shape[1]
    pm_kf = objects.pm_kf.reshape(-1)
    pm_obj = jnp.repeat(jnp.arange(Omax, dtype=jnp.int32), Mring)
    pm_ok = (
        (pm_kf >= 0)
        & (pm_kf < m.num_kfs)
        & objects.valid[pm_obj]
        & ~objects.dynamic[pm_obj]
    )
    obj_edges = ObjectPoseEdges(
        cam_idx=jnp.clip(pm_kf, 0),
        obj_idx=pm_obj,
        T_oc=objects.pm_Toc.reshape(-1, 4, 4),
        valid=pm_ok,
    )
    n_meas = jax.ops.segment_sum(
        pm_ok.astype(jnp.int32), pm_obj, num_segments=Omax
    )
    obj_fixed = ~objects.valid | (n_meas < 2)

    T, Tow_new, p, _ = map_sharded_joint_ba(
        mesh, m.kf_Tcw, Tow, m.pt_xyz, cam_fixed, obj_fixed, slots, obj_edges,
        cfg.intr, baseline_fx=cfg.bf, iters=iters, axis=axis,
    )
    m = m._replace(
        kf_Tcw=jnp.where(in_map[:, None, None], T, m.kf_Tcw),
        pt_xyz=p,
    )
    T_wo_new = jax.vmap(lie.inv_se3)(Tow_new)
    rpy_new = quadric.rotmat_to_euler(T_wo_new[:, :3, :3])
    e_new = jnp.concatenate(
        [T_wo_new[:, :3, 3], rpy_new, objects.ellipsoid[:, 6:9]], axis=-1
    )
    moved = objects.valid & ~obj_fixed
    objects = objects._replace(
        ellipsoid=jnp.where(moved[:, None], e_new, objects.ellipsoid)
    )
    return m, objects
