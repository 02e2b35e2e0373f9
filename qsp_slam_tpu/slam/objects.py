"""Object landmark layer: SoA ellipsoid table, IoU association, refinement.

Parity map:
  * ObjectTable            ≈ `Map::mspMapObjects` + per-object ellipsoid state
                             (`src/MapObject.cc`, `include/Map.h:120-140`)
  * associate_detections   ≈ `Tracking::AssociateObjectsByProjection`
                             ellipsoid-IoU mode (`src/Tracking_util.cc:413-483`):
                             project each live object, IoU against detection
                             bboxes, label gate, best-match assignment
  * integrate_keyframe     ≈ `UpdateDepthEllipsoidEstimation` + object
                             creation (`src/Tracking_util.cc:848-1078`,
                             `LocalMapping_util.cc:293`)
  * refine_objects         ≈ per-object quadric optimization with gravity /
                             support priors (PriorInfer-style)
  * merge_duplicates       ≈ `AssociateObjects3D`/`MergeMapObject` center-
                             distance fusion (`LocalMapping_util.cc:900-960`)

All object state is fixed-capacity, vmap-refined, jit-safe.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie, quadric
from ..opt.quadric_factors import ObjectObservations, refine_object


class ObjectTable(NamedTuple):
    ellipsoid: jax.Array  # (Omax, 9) world-frame minimal vectors
    label: jax.Array  # (Omax,) int32
    prob: jax.Array  # (Omax,) f32 running confidence
    obs_count: jax.Array  # (Omax,) int32
    valid: jax.Array  # (Omax,) bool
    num_objects: jax.Array  # () int32
    # per-object observation ring (bbox history for refinement)
    obs_Tcw: jax.Array  # (Omax, M, 4, 4)
    obs_bbox: jax.Array  # (Omax, M, 4)
    obs_weight: jax.Array  # (Omax, M)
    obs_next: jax.Array  # (Omax,) int32 ring cursor
    # DeepSDF shape state (parity: MapObject's 64-d code + Sim3Two,
    # `src/MapObject.cc`); Tow_shape maps world -> normalized object frame.
    code: jax.Array  # (Omax, C)
    Tow_shape: jax.Array  # (Omax, 4, 4) similarity (sR | t)
    shape_ok: jax.Array  # (Omax,) bool — a reconstruction exists
    # lifecycle (parity: MapObjectCulling + dynamic/static arbitration,
    # `LocalMapping_util.cc:29-93,151-192`)
    last_seen_kf: jax.Array  # (Omax,) int32
    move_votes: jax.Array  # (Omax,) int32 — large single-frame displacements
    dynamic: jax.Array  # (Omax,) bool
    # Dynamic-object motion model (parity: MapObject velocity members +
    # extrapolation, `src/LocalMapping_util.cc:151-192`): EMA world-frame
    # center velocity / yaw rate per keyframe-index unit, and the keyframe
    # the state has been advanced to.
    vel_center: jax.Array  # (Omax, 3) f32
    vel_yaw: jax.Array  # (Omax,) f32
    adv_kf: jax.Array  # (Omax,) int32
    # camera-object relative-pose measurement ring (the reference's
    # `det->SE3Tco` per keyframe, consumed by joint BA)
    pm_Toc: jax.Array  # (Omax, M, 4, 4) measured cam->object SE3
    pm_kf: jax.Array  # (Omax, M) int32 keyframe id (-1 empty)
    pm_next: jax.Array  # (Omax,) int32 ring cursor


def empty_objects(
    omax: int = 32, obs_per_object: int = 16, code_dim: int = 16
) -> ObjectTable:
    return ObjectTable(
        ellipsoid=jnp.zeros((omax, 9), jnp.float32),
        label=jnp.full(omax, -1, jnp.int32),
        prob=jnp.zeros(omax, jnp.float32),
        obs_count=jnp.zeros(omax, jnp.int32),
        valid=jnp.zeros(omax, bool),
        num_objects=jnp.int32(0),
        obs_Tcw=jnp.tile(jnp.eye(4, dtype=jnp.float32), (omax, obs_per_object, 1, 1)),
        obs_bbox=jnp.zeros((omax, obs_per_object, 4), jnp.float32),
        obs_weight=jnp.zeros((omax, obs_per_object), jnp.float32),
        obs_next=jnp.zeros(omax, jnp.int32),
        code=jnp.zeros((omax, code_dim), jnp.float32),
        Tow_shape=jnp.tile(jnp.eye(4, dtype=jnp.float32), (omax, 1, 1)),
        shape_ok=jnp.zeros(omax, bool),
        last_seen_kf=jnp.zeros(omax, jnp.int32),
        move_votes=jnp.zeros(omax, jnp.int32),
        dynamic=jnp.zeros(omax, bool),
        vel_center=jnp.zeros((omax, 3), jnp.float32),
        vel_yaw=jnp.zeros(omax, jnp.float32),
        adv_kf=jnp.zeros(omax, jnp.int32),
        pm_Toc=jnp.tile(jnp.eye(4, dtype=jnp.float32), (omax, obs_per_object, 1, 1)),
        pm_kf=jnp.full((omax, obs_per_object), -1, jnp.int32),
        pm_next=jnp.zeros(omax, jnp.int32),
    )


class Associations(NamedTuple):
    obj_for_det: jax.Array  # (D,) int32 — object id per detection (-1 = new)
    iou: jax.Array  # (D,) f32


@partial(jax.jit, static_argnames=())
def associate_detections(
    table: ObjectTable,
    Tcw: jax.Array,
    K: jax.Array,
    det_bbox: jax.Array,  # (D, 4)
    det_label: jax.Array,  # (D,)
    det_valid: jax.Array,  # (D,)
    iou_threshold: float = 0.3,
) -> Associations:
    """Project live objects, IoU-match against detections with label gate.

    A det_label of -1 matches any class (used by the on-mesh detector mode,
    where single-frame class estimates are noisier than replay labels and a
    hard gate would fragment objects across label flips).
    """
    proj = quadric.project_bbox(table.ellipsoid, Tcw[None], K)  # (O, 4)
    front = quadric.check_observability(table.ellipsoid, Tcw[None])
    iou = quadric.bbox_iou(proj[None, :, :], det_bbox[:, None, :])  # (D, O)
    label_ok = (det_label[:, None] == table.label[None, :]) | (
        det_label[:, None] < 0
    )
    gate = (
        label_ok
        & table.valid[None, :]
        & front[None, :]
        & det_valid[:, None]
        & (iou > iou_threshold)
    )
    iou_g = jnp.where(gate, iou, -1.0)
    best = jnp.argmax(iou_g, axis=1)
    best_iou = jnp.take_along_axis(iou_g, best[:, None], 1)[:, 0]
    # One detection per object: keep the best-IoU claimant.
    obj = jnp.where(best_iou > 0.0, best.astype(jnp.int32), -1)
    obj_safe = jnp.where(obj >= 0, obj, table.ellipsoid.shape[0] - 1)
    best_for_obj = jax.ops.segment_max(
        jnp.where(obj >= 0, best_iou, -1.0),
        obj_safe,
        num_segments=table.ellipsoid.shape[0],
    )
    keep = (obj >= 0) & (best_iou >= best_for_obj[obj_safe])
    return Associations(obj_for_det=jnp.where(keep, obj, -1), iou=best_iou)


@partial(jax.jit, static_argnames=())
def advance_dynamic_objects(table: ObjectTable, kf_id: jax.Array) -> ObjectTable:
    """Extrapolate unobserved DYNAMIC objects to `kf_id` with their velocity.

    Parity: the reference predicts a moving object's pose forward so the
    next association still finds it (`src/LocalMapping_util.cc:151-192`).
    The shape anchor (world -> normalized frame) translates along.  Static
    objects and freshly-observed objects are untouched; adv_kf records the
    advance so repeated calls are idempotent.
    """
    anchor = jnp.maximum(table.adv_kf, table.last_seen_kf)
    dk = jnp.maximum(kf_id - anchor, 0).astype(table.vel_center.dtype)
    move = table.valid & table.dynamic & (dk > 0)
    delta = table.vel_center * dk[:, None]
    dyaw = table.vel_yaw * dk
    e = table.ellipsoid
    e = e.at[:, 0:3].set(
        jnp.where(move[:, None], e[:, 0:3] + delta, e[:, 0:3])
    )
    yaw_adv = (e[:, 4] + dyaw + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    e = e.at[:, 4].set(jnp.where(move, yaw_adv, e[:, 4]))
    sR = table.Tow_shape[:, :3, :3]
    t_new = table.Tow_shape[:, :3, 3] - jnp.einsum("oij,oj->oi", sR, delta)
    t_shape = jnp.where(move[:, None], t_new, table.Tow_shape[:, :3, 3])
    return table._replace(
        ellipsoid=e,
        Tow_shape=table.Tow_shape.at[:, :3, 3].set(t_shape),
        adv_kf=jnp.where(table.valid & (dk > 0), kf_id, table.adv_kf),
    )


def _push_observation(table: ObjectTable, oid, Tcw, bbox, weight):
    """Append one (pose, bbox) observation into the object's ring buffer."""
    M = table.obs_bbox.shape[1]
    cur = table.obs_next[oid] % M
    return table._replace(
        obs_Tcw=table.obs_Tcw.at[oid, cur].set(Tcw),
        obs_bbox=table.obs_bbox.at[oid, cur].set(bbox),
        obs_weight=table.obs_weight.at[oid, cur].set(weight),
        obs_next=table.obs_next.at[oid].add(1),
        obs_count=table.obs_count.at[oid].add(1),
    )


@partial(jax.jit, static_argnames=())
def integrate_keyframe(
    table: ObjectTable,
    Tcw: jax.Array,
    det_bbox: jax.Array,  # (D, 4)
    det_label: jax.Array,
    det_prob: jax.Array,
    det_valid: jax.Array,
    det_ellipsoid_cam: jax.Array,  # (D, 9) single-frame fits (camera frame)
    det_fit_ok: jax.Array,  # (D,) bool
    assoc: Associations,
    kf_id: jax.Array = jnp.int32(0),
    dynamic_dist: float = 0.35,
) -> ObjectTable:
    """Fold one keyframe's detections into the object table.

    Associated detections push a bbox observation (and bump confidence);
    unassociated detections with a good depth fit spawn new objects with the
    camera-frame ellipsoid transformed to world.
    """
    D = det_bbox.shape[0]
    Omax = table.ellipsoid.shape[0]
    T_wc = lie.inv_se3(Tcw)

    def fold_det(i, tb):
        oid = assoc.obj_for_det[i]
        is_assoc = (oid >= 0) & det_valid[i]

        def do_assoc(tb):
            tb = _push_observation(tb, oid, Tcw, det_bbox[i], det_prob[i])
            # Camera-object relative-pose measurement (the reference's
            # `det->SE3Tco`): rigid pose of the single-frame ellipsoid fit.
            M = tb.pm_kf.shape[1]
            cur = tb.pm_next[oid] % M
            R_det = quadric.euler_to_rotmat(det_ellipsoid_cam[i, 3:6])
            T_co = lie.rt_to_se3(R_det, det_ellipsoid_cam[i, 0:3])
            T_oc = lie.inv_se3(T_co)
            tb = jax.lax.cond(
                det_fit_ok[i],
                lambda t: t._replace(
                    pm_Toc=t.pm_Toc.at[oid, cur].set(T_oc),
                    pm_kf=t.pm_kf.at[oid, cur].set(kf_id),
                    pm_next=t.pm_next.at[oid].add(1),
                ),
                lambda t: t,
                tb,
            )
            # Dynamic/static arbitration (`GetNewObservations` `:151-192`):
            # a good single-frame fit landing far from the landmark while the
            # 2D association still matched is a motion vote; repeated votes
            # flag the object dynamic (its bbox history stops being fused).
            e_w_det = quadric.transform_ellipsoid(det_ellipsoid_cam[i], T_wc)
            moved = det_fit_ok[i] & (
                jnp.linalg.norm(e_w_det[0:3] - tb.ellipsoid[oid, 0:3])
                > dynamic_dist
            )
            votes = tb.move_votes[oid] + moved.astype(jnp.int32)
            is_dyn = votes >= 2
            # Velocity model (`LocalMapping_util.cc:151-192`): EMA the
            # per-keyframe-index motion measured landmark -> new fit; once
            # dynamic, the landmark FOLLOWS the measurement (fusing a moving
            # object's history would smear it) and the shape anchor
            # translates with it.
            dk = jnp.maximum(kf_id - tb.last_seen_kf[oid], 1).astype(
                tb.vel_center.dtype
            )
            v_meas = (e_w_det[0:3] - tb.ellipsoid[oid, 0:3]) / dk
            dyaw = e_w_det[4] - tb.ellipsoid[oid, 4]
            dyaw = (dyaw + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
            upd = det_fit_ok[i]
            vel_c = jnp.where(
                upd, 0.6 * tb.vel_center[oid] + 0.4 * v_meas,
                tb.vel_center[oid],
            )
            vel_y = jnp.where(
                upd, 0.6 * tb.vel_yaw[oid] + 0.4 * dyaw / dk, tb.vel_yaw[oid]
            )
            snap = is_dyn & det_fit_ok[i]
            e_new = jnp.where(snap, e_w_det, tb.ellipsoid[oid])
            delta_c = e_new[0:3] - tb.ellipsoid[oid, 0:3]
            sR = tb.Tow_shape[oid, :3, :3]
            t_shape = jnp.where(
                snap,
                tb.Tow_shape[oid, :3, 3] - sR @ delta_c,
                tb.Tow_shape[oid, :3, 3],
            )
            return tb._replace(
                prob=tb.prob.at[oid].set(
                    jnp.minimum(tb.prob[oid] + 0.1 * det_prob[i], 1.0)
                ),
                ellipsoid=tb.ellipsoid.at[oid].set(e_new),
                Tow_shape=tb.Tow_shape.at[oid, :3, 3].set(t_shape),
                vel_center=tb.vel_center.at[oid].set(vel_c),
                vel_yaw=tb.vel_yaw.at[oid].set(vel_y),
                adv_kf=tb.adv_kf.at[oid].set(kf_id),
                last_seen_kf=tb.last_seen_kf.at[oid].set(kf_id),
                move_votes=tb.move_votes.at[oid].set(votes),
                dynamic=tb.dynamic.at[oid].set(is_dyn),
            )

        def do_new(tb):
            # Slot reuse: allocate the first FREE slot (culled/merged
            # objects return their capacity), not a monotone counter — a
            # long sequence would otherwise exhaust the table permanently.
            free = ~tb.valid
            can_new = det_valid[i] & det_fit_ok[i] & jnp.any(free)
            nid = jnp.argmax(free).astype(jnp.int32)
            e_w = quadric.transform_ellipsoid(det_ellipsoid_cam[i], T_wc)

            def create(tb):
                # The creating detection also yields the first camera-object
                # pose measurement (reference: every detection records Tco).
                R_det = quadric.euler_to_rotmat(det_ellipsoid_cam[i, 3:6])
                T_oc0 = lie.inv_se3(
                    lie.rt_to_se3(R_det, det_ellipsoid_cam[i, 0:3])
                )
                M = tb.pm_kf.shape[1]
                tb = tb._replace(
                    ellipsoid=tb.ellipsoid.at[nid].set(e_w),
                    label=tb.label.at[nid].set(det_label[i]),
                    prob=tb.prob.at[nid].set(0.2 * det_prob[i]),
                    valid=tb.valid.at[nid].set(True),
                    num_objects=tb.num_objects + 1,
                    last_seen_kf=tb.last_seen_kf.at[nid].set(kf_id),
                    move_votes=tb.move_votes.at[nid].set(0),
                    dynamic=tb.dynamic.at[nid].set(False),
                    vel_center=tb.vel_center.at[nid].set(0.0),
                    vel_yaw=tb.vel_yaw.at[nid].set(0.0),
                    adv_kf=tb.adv_kf.at[nid].set(kf_id),
                    # Scrub any previous tenant's history from the slot.
                    obs_weight=tb.obs_weight.at[nid].set(0.0),
                    obs_next=tb.obs_next.at[nid].set(0),
                    obs_count=tb.obs_count.at[nid].set(0),
                    shape_ok=tb.shape_ok.at[nid].set(False),
                    code=tb.code.at[nid].set(0.0),
                    pm_Toc=tb.pm_Toc.at[nid].set(
                        jnp.tile(jnp.eye(4, dtype=tb.pm_Toc.dtype), (M, 1, 1))
                        .at[0]
                        .set(T_oc0)
                    ),
                    pm_kf=tb.pm_kf.at[nid].set(
                        jnp.full((M,), -1, tb.pm_kf.dtype).at[0].set(kf_id)
                    ),
                    pm_next=tb.pm_next.at[nid].set(1),
                )
                return _push_observation(tb, nid, Tcw, det_bbox[i], det_prob[i])

            return jax.lax.cond(can_new, create, lambda t: t, tb)

        return jax.lax.cond(is_assoc, do_assoc, do_new, tb)

    return jax.lax.fori_loop(0, D, fold_det, table)


@partial(jax.jit, static_argnames=())
def cull_objects(
    table: ObjectTable,
    current_kf: jax.Array,
    max_age_kf: int = 8,
    min_obs: int = 2,
) -> ObjectTable:
    """Drop weakly-supported stale objects.

    Parity: `LocalMapping::MapObjectCulling` (`LocalMapping_util.cc:29-93`) —
    objects with too few observations that have not been re-observed within
    `max_age_kf` keyframes are removed.
    """
    stale = (current_kf - table.last_seen_kf) > max_age_kf
    weak = table.obs_count < min_obs
    drop = table.valid & stale & weak
    return table._replace(valid=table.valid & ~drop)


@partial(jax.jit, static_argnames=("iters", "img_wh"))
def refine_objects(
    table: ObjectTable,
    K: jax.Array,
    ground_plane_w: jax.Array,
    iters: int = 8,
    support_planes_w: jax.Array | None = None,
    img_wh: tuple | None = None,
) -> ObjectTable:
    """vmapped multi-view LM refinement of every valid object.

    `support_planes_w` (O, 4): per-object supporting plane for the support
    prior (relation refinement — an object on a table snaps to the TABLE);
    defaults to the shared ground plane.
    """
    if support_planes_w is None:
        O = table.ellipsoid.shape[0]
        support_planes_w = jnp.tile(ground_plane_w[None], (O, 1))

    def one(e, Tcw, bbox, w, valid, plane):
        obs = ObjectObservations(Tcw=Tcw, bbox=bbox, weight=w)
        e_new, _ = refine_object(e, obs, K, plane, iters=iters, img_wh=img_wh)
        enough = jnp.sum(w > 0) >= 2
        return jnp.where(valid & enough, e_new, e)

    # Dynamic objects keep their last single-frame estimate: fusing a moving
    # object's bbox history would smear it (`GetNewObservations` semantics).
    refinable = table.valid & ~table.dynamic
    e_ref = jax.vmap(one)(
        table.ellipsoid, table.obs_Tcw, table.obs_bbox, table.obs_weight,
        refinable, support_planes_w,
    )
    return table._replace(ellipsoid=e_ref)


@partial(jax.jit, static_argnames=("iters", "img_wh"))
def refine_objects_mono(
    table: ObjectTable,
    K: jax.Array,
    ground_plane_w: jax.Array,
    aspect_d: jax.Array,  # (L,) per-label half-axis ratio priors
    aspect_e: jax.Array,  # (L,)
    iters: int = 12,
    img_wh: tuple | None = None,
) -> ObjectTable:
    """Monocular refinement: bbox history + gravity/support/ASPECT priors.

    Without depth the viewing-direction extent is weakly observable, so the
    per-label aspect priors carry it (the reference's `EdgePri` /
    `PriFactor` path, `src/core/PriorInfer.cpp`).
    """
    from ..perception.prior_infer import refine_with_priors

    L = aspect_d.shape[0]
    lbl = jnp.clip(table.label, 0, L - 1)

    def one(e, Tcw, bbox, w, valid, ad, ae):
        obs = ObjectObservations(Tcw=Tcw, bbox=bbox, weight=w)
        e_new, _ = refine_with_priors(
            e, obs, K, ground_plane_w, ad, ae, iters=iters, img_wh=img_wh
        )
        enough = jnp.sum(w > 0) >= 2
        return jnp.where(valid & enough, e_new, e)

    refinable = table.valid & ~table.dynamic
    e_ref = jax.vmap(one)(
        table.ellipsoid, table.obs_Tcw, table.obs_bbox, table.obs_weight,
        refinable, aspect_d[lbl], aspect_e[lbl],
    )
    return table._replace(ellipsoid=e_ref)


@partial(jax.jit, static_argnames=())
def merge_duplicates(
    table: ObjectTable, dist_threshold: float = 0.5
) -> ObjectTable:
    """Fuse same-label objects whose centers are near-coincident.

    Parity: `AssociateObjects3D` center-distance merge
    (`LocalMapping_util.cc:900-960`); the lower-id object absorbs the other's
    confidence, the duplicate is invalidated.
    """
    c = table.ellipsoid[:, 0:3]
    d = jnp.linalg.norm(c[:, None, :] - c[None, :, :], axis=-1)
    same = (
        (table.label[:, None] == table.label[None, :])
        & table.valid[:, None]
        & table.valid[None, :]
        & (d < dist_threshold)
    )
    O = c.shape[0]
    ids = jnp.arange(O)
    lower = same & (ids[None, :] < ids[:, None])  # j < i duplicates i
    dup_of_any = lower.any(axis=1)
    absorb = jnp.einsum(
        "ij,i->j", lower.astype(table.prob.dtype), table.prob
    )
    return table._replace(
        valid=table.valid & ~dup_of_any,
        prob=jnp.minimum(table.prob + absorb, 1.0),
    )
