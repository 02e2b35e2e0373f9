"""Joint camera–point–object BA inside the mapping loop (stereo/KITTI mode).

Parity: `LocalMapping::RunOneTime`'s BA dispatch chooses
`LocalJointBundleAdjustment` for STEREO (`src/LocalMapping.cc:227-246`):
object pose vertices join the local window, constrained by the per-keyframe
camera-object relative-pose measurements (`det->SE3Tco`) accumulated in the
object table's measurement rings.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import lie, quadric
from ..opt.joint_ba import ObjectPoseEdges, joint_bundle_adjustment
from ..opt.reproj import ReprojEdges
from .map import MapState
from .objects import ObjectTable
from .tracking import TrackingConfig


@partial(jax.jit, static_argnames=("cfg", "window"))
def joint_ba_step(
    m: MapState,
    objects: ObjectTable,
    cfg: TrackingConfig,
    window: int = 8,
) -> tuple[MapState, ObjectTable]:
    """Optimize the last `window` keyframes + points + object poses."""
    Kmax = m.kf_Tcw.shape[0]
    start = jnp.maximum(m.num_kfs - window, 0)
    kf_ids = jnp.arange(Kmax, dtype=jnp.int32)
    slot_of = jnp.where(
        (kf_ids >= start) & (kf_ids < m.num_kfs),
        jnp.clip(kf_ids - start, 0, window - 1),
        -1,
    )
    kf_sel = jnp.clip(start + jnp.arange(window, dtype=jnp.int32), 0, Kmax - 1)
    win_valid = (start + jnp.arange(window)) < m.num_kfs
    cam_fixed = (jnp.arange(window) < 2) | ~win_valid

    edge_slot = slot_of[m.ob_kf]
    valid = m.ob_valid & (edge_slot >= 0) & m.pt_valid[m.ob_pt]
    inv_sigma2 = (1.0 / cfg.orb.pyramid.scale_factor ** 2) ** m.ob_octave.astype(
        jnp.float32
    )
    edges = ReprojEdges(
        kf_idx=jnp.clip(edge_slot, 0),
        pt_idx=m.ob_pt,
        uv=m.ob_uv,
        u_right=m.ob_ur,
        inv_sigma2=inv_sigma2,
        valid=valid,
    )

    # Object vertices: rigid world->object from the ellipsoid state.
    Omax = objects.ellipsoid.shape[0]
    R_e = quadric.euler_to_rotmat(objects.ellipsoid[:, 3:6])
    T_wo = jax.vmap(lie.rt_to_se3)(R_e, objects.ellipsoid[:, 0:3])
    Tow = jax.vmap(lie.inv_se3)(T_wo)

    # Flatten measurement rings into the edge list.
    Mring = objects.pm_kf.shape[1]
    pm_kf = objects.pm_kf.reshape(-1)
    pm_slot = jnp.where(pm_kf >= 0, slot_of[jnp.clip(pm_kf, 0)], -1)
    pm_obj = jnp.repeat(jnp.arange(Omax, dtype=jnp.int32), Mring)
    pm_ok = (
        (pm_slot >= 0)
        & objects.valid[pm_obj]
        & ~objects.dynamic[pm_obj]
    )
    obj_edges = ObjectPoseEdges(
        cam_idx=jnp.clip(pm_slot, 0),
        obj_idx=pm_obj,
        T_oc=objects.pm_Toc.reshape(-1, 4, 4),
        valid=pm_ok,
    )
    # Objects with fewer than 2 in-window measurements stay fixed.
    n_meas = jax.ops.segment_sum(
        pm_ok.astype(jnp.int32), pm_obj, num_segments=Omax
    )
    obj_fixed = ~objects.valid | (n_meas < 2)

    res = joint_bundle_adjustment(
        m.kf_Tcw[kf_sel], Tow, m.pt_xyz, cam_fixed, obj_fixed, edges, obj_edges,
        cfg.intr, baseline_fx=cfg.bf,
    )

    m = m._replace(
        kf_Tcw=m.kf_Tcw.at[kf_sel].set(
            jnp.where(win_valid[:, None, None], res.Tcw, m.kf_Tcw[kf_sel])
        ),
        pt_xyz=res.points,
        ob_valid=jnp.where(edge_slot >= 0, res.inlier & m.ob_valid, m.ob_valid),
    )
    # Fold optimized object poses back into the ellipsoid table.
    T_wo_new = jax.vmap(lie.inv_se3)(res.Tow)
    rpy_new = quadric.rotmat_to_euler(T_wo_new[:, :3, :3])
    e_new = jnp.concatenate(
        [T_wo_new[:, :3, 3], rpy_new, objects.ellipsoid[:, 6:9]], axis=-1
    )
    moved = objects.valid & ~obj_fixed
    objects = objects._replace(
        ellipsoid=jnp.where(moved[:, None], e_new, objects.ellipsoid)
    )
    return m, objects
