"""Loop closing: appearance detection, geometric Sim3 verification,
pose-graph correction, object-aware map update.

Parity: `LoopClosing::Run/DetectLoop/ComputeSim3/CorrectLoop(+WithObjects)`
(`src/LoopClosing.cc:57-655`, `src/LoopClosing_util.cc:28-293`):
  * detection = place-recognition query above a score floor with a temporal
    guard (BoW-score + consistency-group logic condensed to its effect);
  * verification = descriptor mutual match between the two keyframes'
    snapshots + RANSAC Sim3 on the matched camera-frame 3D points (scale
    fixed for RGB-D, as `mbFixScale`);
  * correction = relative-pose graph over all keyframes (odometry chain +
    the loop edge), then map points / objects are re-anchored through their
    reference keyframe's correction — the essential-graph step;
  * object fusion = center-distance duplicate merge after correction.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import lie, quadric
from ..frontend import matcher
from ..frontend.orb import DESC_BITS
from ..opt.pose_graph import PoseGraphEdges, optimize_pose_graph, relative_measurement
from ..opt.sim3_solver import ransac_sim3
from .map import MapState
from .objects import ObjectTable, merge_duplicates
from .place_recognition import PlaceDatabase, add_signature, bow_signature, empty_database, query


class LoopState(NamedTuple):
    db: PlaceDatabase
    kf_desc: jax.Array  # (Kmax, S, 256) int8 snapshot of each KF's features
    kf_pts_cam: jax.Array  # (Kmax, S, 3) camera-frame 3D points per feature
    kf_pts_ok: jax.Array  # (Kmax, S) bool
    kf_xy: jax.Array  # (Kmax, S, 2) pixel positions (mono triangulation seam)
    kf_feat_ok: jax.Array  # (Kmax, S) bool — feature validity (indep. of depth)


def empty_loop_state(kmax: int = 64, snap: int = 384) -> LoopState:
    return LoopState(
        db=empty_database(kmax),
        kf_desc=jnp.zeros((kmax, snap, DESC_BITS), jnp.int8),
        kf_pts_cam=jnp.zeros((kmax, snap, 3), jnp.float32),
        kf_pts_ok=jnp.zeros((kmax, snap), bool),
        kf_xy=jnp.zeros((kmax, snap, 2), jnp.float32),
        kf_feat_ok=jnp.zeros((kmax, snap), bool),
    )


@jax.jit
def snapshot_keyframe(
    ls: LoopState,
    desc_pm: jax.Array,  # (F, 256)
    feat_valid: jax.Array,  # (F,)
    pts_cam: jax.Array,  # (F, 3) camera-frame backprojections (depth)
    pts_ok: jax.Array,  # (F,)
    xy: jax.Array,  # (F, 2) pixel positions
) -> LoopState:
    """Store a fixed-size snapshot (strongest-first order assumed) + signature."""
    S = ls.kf_desc.shape[1]
    kid = ls.db.count
    sig = bow_signature(desc_pm, feat_valid)
    return LoopState(
        db=add_signature(ls.db, sig),
        kf_desc=ls.kf_desc.at[kid].set(desc_pm[:S]),
        kf_pts_cam=ls.kf_pts_cam.at[kid].set(pts_cam[:S]),
        kf_pts_ok=ls.kf_pts_ok.at[kid].set(pts_ok[:S] & feat_valid[:S]),
        kf_xy=ls.kf_xy.at[kid].set(xy[:S]),
        kf_feat_ok=ls.kf_feat_ok.at[kid].set(feat_valid[:S]),
    )


class LoopDetection(NamedTuple):
    found: jax.Array  # bool
    match_kf: jax.Array  # int32
    T_cur_match: jax.Array  # (4, 4) current-cam <- match-cam similarity
    num_inliers: jax.Array  # int32
    score: jax.Array  # f32 appearance score


@partial(jax.jit, static_argnames=("fix_scale",))
def detect_loop(
    ls: LoopState,
    desc_pm: jax.Array,  # current KF features (F, 256)
    feat_valid: jax.Array,
    pts_cam: jax.Array,  # (F, 3)
    pts_ok: jax.Array,
    key: jax.Array,
    score_min: float = 0.18,
    exclude_recent: int = 10,
    min_inliers: int = 20,
    fix_scale: bool = True,
) -> LoopDetection:
    """Appearance query + Sim3 geometric verification in one fused pass."""
    sig = bow_signature(desc_pm, feat_valid)
    cand, score = query(ls.db, sig, exclude_recent)
    cand_c = jnp.clip(cand, 0)

    # Mutual descriptor match current <-> candidate snapshot.
    m = matcher.mutual_match(
        desc_pm, feat_valid & pts_ok,
        ls.kf_desc[cand_c], ls.kf_pts_ok[cand_c],
        max_dist=matcher.TH_LOW, ratio=0.9,
    )
    midx = jnp.clip(m.idx, 0)
    src = ls.kf_pts_cam[cand_c][midx]  # candidate-frame points
    dst = pts_cam  # current-frame points
    res = ransac_sim3(
        src, dst, m.valid, key, with_scale=not fix_scale, inlier_th=0.12
    )
    found = (score > score_min) & res.ok & (res.num_inliers >= min_inliers)
    return LoopDetection(
        found=found,
        match_kf=cand,
        T_cur_match=res.T_ds,
        num_inliers=res.num_inliers,
        score=score,
    )


@partial(jax.jit, static_argnames=("fix_scale", "iters"))
def correct_loop(
    m: MapState,
    objects: ObjectTable,
    cur_kf: jax.Array,  # int32 — current keyframe id
    det: LoopDetection,
    fix_scale: bool = True,
    iters: int = 15,
) -> tuple[MapState, ObjectTable]:
    """Pose-graph correction + map/object re-anchoring.

    Edges: odometry chain between consecutive keyframes (from current
    estimates) + the verified loop edge.  After optimization every map point
    and object is moved by its anchor keyframe's correction
    T_w_new <- T_w_old.
    """
    Kmax = m.kf_Tcw.shape[0]
    K = m.num_kfs
    poses = m.kf_Tcw  # vertices: T_iw = Tcw per keyframe

    ids = jnp.arange(Kmax, dtype=jnp.int32)
    # odometry edges (i, i+1) for i+1 < K
    odo_i = ids
    odo_j = jnp.clip(ids + 1, 0, Kmax - 1)
    odo_T = jax.vmap(lambda a, b: relative_measurement(a, b, not fix_scale))(
        poses[odo_i], poses[odo_j]
    )
    odo_w = ((odo_j < K) & (odo_i < odo_j)).astype(jnp.float32)
    # loop edge: T_cur_match maps match-cam points into cur-cam:
    # p_cur = T_cm p_match => T_cur_w = T_cm @ T_match_w => measurement
    # M(cur, match) = T_cur_w T_match_w^-1 = T_cm.
    loop_i = cur_kf[None]
    loop_j = det.match_kf[None]
    loop_T = det.T_cur_match[None]
    loop_w = jnp.where(det.found, 5.0, 0.0)[None]

    edges = PoseGraphEdges(
        i=jnp.concatenate([odo_i, loop_i]),
        j=jnp.concatenate([odo_j, loop_j]),
        T_ij=jnp.concatenate([odo_T, loop_T]),
        weight=jnp.concatenate([odo_w, loop_w]),
    )
    fixed = (ids == 0) | (ids >= K)
    # Monocular mode optimizes over Sim(3) — scale drift is the dominant
    # loop error (`OptimizeEssentialGraph` with unfixed scale); RGB-D/stereo
    # keep scale fixed (`mbFixScale`).
    new_poses, _ = optimize_pose_graph(
        poses, fixed, edges, sim3=not fix_scale, iters=iters
    )

    # Correction transform per keyframe: T_corr(k) = T_wk_new @ T_kw_old.
    inv = lie.inv_se3 if fix_scale else lie.inv_sim3
    T_corr = jax.vmap(lambda a, b: inv(a) @ b)(new_poses, poses)

    # Anchor of each point = its first observing keyframe (edge store min).
    Nmax = m.pt_xyz.shape[0]
    anchor = jax.ops.segment_min(
        jnp.where(m.ob_valid, m.ob_kf, Kmax - 1), m.ob_pt, num_segments=Nmax
    )
    anchor = jnp.clip(anchor, 0, Kmax - 1)
    pts_new = jax.vmap(lambda T, p: (T[:3, :3] @ p + T[:3, 3]))(
        T_corr[anchor], m.pt_xyz
    )
    m = m._replace(kf_Tcw=new_poses, pt_xyz=jnp.where(m.pt_valid[:, None], pts_new, m.pt_xyz))

    # Objects: re-anchor through the most recent observing keyframe ring slot.
    M_ring = objects.obs_weight.shape[1]
    last_slot = jnp.clip((objects.obs_next - 1) % M_ring, 0, M_ring - 1)
    # Find each object's anchor KF by matching its stored Tcw against the
    # OLD keyframe poses (exact storage equality is guaranteed by value
    # semantics) — fall back to identity correction when nothing matches.
    def obj_corr(o):
        T_obs = objects.obs_Tcw[o, last_slot[o]]
        diff = jnp.sum(jnp.abs(poses - T_obs[None]), axis=(1, 2))
        k = jnp.argmin(diff)
        good = (diff[k] < 1e-4) & objects.valid[o] & (objects.obs_count[o] > 0)
        return jnp.where(good, k, 0), good

    ks, goods = jax.vmap(obj_corr)(jnp.arange(objects.ellipsoid.shape[0]))
    e_new = jax.vmap(
        lambda e, k: quadric.transform_ellipsoid(e, T_corr[k])
    )(objects.ellipsoid, ks)
    objects = objects._replace(
        ellipsoid=jnp.where((objects.valid & goods)[:, None], e_new, objects.ellipsoid)
    )
    objects = merge_duplicates(objects, dist_threshold=0.5)
    return m, objects
