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
from ..core.camera import project
from ..frontend import matcher
from ..frontend.orb import DESC_BITS
from ..opt.pose_graph import PoseGraphEdges, optimize_pose_graph, relative_measurement
from ..opt.sim3_solver import ransac_sim3_reproj, refine_sim3_reproj, sim3_image_inliers
from .map import MapState
from .objects import ObjectTable, merge_duplicates
from .place_recognition import (
    PlaceDatabase,
    add_signature,
    bow_signature,
    empty_database,
    query,
    query_topk,
)


class LoopState(NamedTuple):
    db: PlaceDatabase
    kf_desc: jax.Array  # (Kmax, S, 256) int8 snapshot of each KF's features
    kf_pts_cam: jax.Array  # (Kmax, S, 3) camera-frame 3D points per feature
    kf_pts_ok: jax.Array  # (Kmax, S) bool
    kf_xy: jax.Array  # (Kmax, S, 2) pixel positions (mono triangulation seam)
    kf_feat_ok: jax.Array  # (Kmax, S) bool — feature validity (indep. of depth)
    kf_octave: jax.Array  # (Kmax, S) int8 pyramid level (Sim3 chi2 scaling)


def empty_loop_state(kmax: int = 64, snap: int = 384) -> LoopState:
    return LoopState(
        db=empty_database(kmax),
        kf_desc=jnp.zeros((kmax, snap, DESC_BITS), jnp.int8),
        kf_pts_cam=jnp.zeros((kmax, snap, 3), jnp.float32),
        kf_pts_ok=jnp.zeros((kmax, snap), bool),
        kf_xy=jnp.zeros((kmax, snap, 2), jnp.float32),
        kf_feat_ok=jnp.zeros((kmax, snap), bool),
        kf_octave=jnp.zeros((kmax, snap), jnp.int8),
    )


@jax.jit
def snapshot_keyframe(
    ls: LoopState,
    desc_pm: jax.Array,  # (F, 256)
    feat_valid: jax.Array,  # (F,)
    pts_cam: jax.Array,  # (F, 3) camera-frame backprojections (depth)
    pts_ok: jax.Array,  # (F,)
    xy: jax.Array,  # (F, 2) pixel positions
    octave: jax.Array | None = None,  # (F,) pyramid level
) -> LoopState:
    """Store a fixed-size snapshot (strongest-first order assumed) + signature.

    Capacity-guarded like the map stores: at capacity the snapshot is
    dropped whole (slot k <-> KF k alignment must never shift by one)."""
    S = ls.kf_desc.shape[1]
    Kmax = ls.kf_desc.shape[0]
    if octave is None:
        octave = jnp.zeros(desc_pm.shape[0], jnp.int8)
    fits = ls.db.count < Kmax
    kid = jnp.clip(ls.db.count, 0, Kmax - 1)
    sig = bow_signature(desc_pm, feat_valid)
    sel = lambda new, old: jnp.where(fits, new, old)

    def fit_rows(x, fill):
        """First S rows, zero-padded when the feature table is smaller."""
        if x.shape[0] >= S:
            return x[:S]
        pad = jnp.full((S - x.shape[0],) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad])

    return LoopState(
        db=add_signature(ls.db, sig),
        kf_desc=ls.kf_desc.at[kid].set(sel(fit_rows(desc_pm, 0), ls.kf_desc[kid])),
        kf_pts_cam=ls.kf_pts_cam.at[kid].set(
            sel(fit_rows(pts_cam, 0.0), ls.kf_pts_cam[kid])
        ),
        kf_pts_ok=ls.kf_pts_ok.at[kid].set(
            sel(fit_rows(pts_ok & feat_valid, False), ls.kf_pts_ok[kid])
        ),
        kf_xy=ls.kf_xy.at[kid].set(sel(fit_rows(xy, 0.0), ls.kf_xy[kid])),
        kf_feat_ok=ls.kf_feat_ok.at[kid].set(
            sel(fit_rows(feat_valid, False), ls.kf_feat_ok[kid])
        ),
        kf_octave=ls.kf_octave.at[kid].set(
            sel(fit_rows(octave.astype(jnp.int8), 0), ls.kf_octave[kid])
        ),
    )


@partial(jax.jit, static_argnames=("num_feats",))
def feature_points_from_matches(
    pt_xyz: jax.Array,  # (N, 3) world map points
    match_pt: jax.Array,  # (N,) int32 feature idx matched per map point
    match_inlier: jax.Array,  # (N,) bool
    Tcw: jax.Array,  # (4, 4)
    num_feats: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-FEATURE camera-frame 3D from this frame's map-point matches.

    The monocular keyframe snapshot seam: mono frames carry no depth, but
    their tracked map points ARE 3D — scattering them onto the feature table
    gives relocalization and loop verification the same geometry the RGB-D
    snapshots get from depth (the reference's mono reloc/loops likewise use
    the keyframe's MapPoints, `src/Tracking.cc:1589`, `src/Sim3Solver.cc:76`).
    """
    pc = lie.transform_points(Tcw, pt_xyz[None])[0]
    tgt = jnp.where(match_inlier, match_pt, num_feats)
    pts = (
        jnp.zeros((num_feats + 1, 3), jnp.float32)
        .at[tgt].set(pc, mode="drop")[:num_feats]
    )
    ok = (
        jnp.zeros(num_feats + 1, bool)
        .at[tgt].set(match_inlier, mode="drop")[:num_feats]
    )
    return pts, ok


def grow_loop_state(ls: LoopState, kmax: int) -> LoopState:
    """Host-side growth matching `map.grow_map` (snapshot slots track KF ids,
    so the two stores must grow together)."""
    k0, snap = ls.kf_desc.shape[:2]
    if kmax <= k0:
        return ls
    tgt = empty_loop_state(kmax, snap)
    rep = {
        name: getattr(tgt, name)
        .at[tuple(slice(0, s) for s in getattr(ls, name).shape)]
        .set(getattr(ls, name))
        for name in LoopState._fields
        if name != "db"
    }
    rep["db"] = tgt.db._replace(
        signatures=tgt.db.signatures.at[:k0].set(ls.db.signatures),
        df=ls.db.df,
        count=ls.db.count,
    )
    return LoopState(**rep)


class LoopDetection(NamedTuple):
    found: jax.Array  # bool
    match_kf: jax.Array  # int32
    T_cur_match: jax.Array  # (4, 4) current-cam <- match-cam similarity
    num_inliers: jax.Array  # int32
    score: jax.Array  # f32 appearance score


class ConsistencyGate:
    """Covisibility-consistency gating over consecutive loop detections.

    Parity: `LoopClosing::DetectLoop`'s consistency groups
    (`src/LoopClosing.cc:113-241`, `mnCovisibilityConsistencyTh=3`): a
    candidate only proceeds to geometric verification after its
    neighborhood has appeared in `required` CONSECUTIVE detection rounds.
    The reference's covisibility groups are approximated by keyframe-id
    neighborhoods; the default width (8 ids ~ a few tens of frames of
    shared view) matches the breadth of the reference's expanded
    candidate-group covisibility sets — a narrow window starves the gate
    when appearance ranking jitters between adjacent revisit keyframes
    (geometric verification remains the correctness backstop).
    Host-side state — tiny, per-keyframe.
    """

    def __init__(self, required: int = 3, neighborhood: int = 8):
        self.required = required
        self.neighborhood = neighborhood
        self.history: list[list[int]] = []

    def update(self, cands, scores) -> int:
        """Feed this round's candidates; returns the best consistent
        candidate id, or -1 if none has a `required`-round streak yet."""
        cands = [int(c) for c in np.asarray(cands)]
        scores = [float(s) for s in np.asarray(scores)]
        best_id, best_score = -1, -np.inf
        have = len(self.history) >= self.required - 1
        for c, s in zip(cands, scores):
            if c < 0:
                continue
            if have and all(
                any(abs(c - c2) <= self.neighborhood for c2 in h)
                for h in self.history[-(self.required - 1):]
            ):
                if s > best_score:
                    best_id, best_score = c, s
        self.history.append([c for c in cands if c >= 0])
        if len(self.history) > self.required:
            self.history = self.history[-self.required:]
        return best_id

    def reset(self):
        self.history = []


@partial(jax.jit, static_argnames=("fix_scale", "scale_factor"))
def verify_loop(
    ls: LoopState,
    cand: jax.Array,  # int32 candidate keyframe id
    desc_pm: jax.Array,  # current KF features (F, 256)
    feat_valid: jax.Array,
    pts_cam: jax.Array,  # (F, 3)
    pts_ok: jax.Array,
    key: jax.Array,
    intr=None,  # Intrinsics — required for image-space gating
    xy: jax.Array | None = None,  # (F, 2) current keypoint pixels
    octave: jax.Array | None = None,  # (F,) current keypoint octaves
    min_inliers: int = 20,
    fix_scale: bool = True,
    scale_factor: float = 1.2,
) -> LoopDetection:
    """Geometric loop verification: vocabulary-gated descriptor match +
    image-space RANSAC Sim3 + SearchBySim3 correspondence growth
    (`LoopClosing::ComputeSim3`, `src/LoopClosing.cc:241`)."""
    if octave is None:
        octave = jnp.zeros(desc_pm.shape[0], jnp.int32)
    cand_c = jnp.clip(cand, 0)
    res, _ = _match_and_solve_sim3(
        ls, cand_c, desc_pm, feat_valid, pts_cam, pts_ok, xy, octave,
        key, fix_scale, intr, scale_factor,
    )
    found = (cand >= 0) & res.ok & (res.num_inliers >= min_inliers)
    return LoopDetection(
        found=found,
        match_kf=cand,
        T_cur_match=res.T_ds,
        num_inliers=res.num_inliers,
        score=jnp.float32(0.0),
    )


def _match_and_solve_sim3(
    ls, cand_c, desc_pm, feat_valid, pts_cam, pts_ok, xy, octave, key,
    fix_scale, intr, scale_factor: float = 1.2, grow_px: float = 7.5,
):
    """Shared loop-verification core.

    1. `SearchByBoW`-style first pass: mutual match restricted to features
       quantized to the same vocabulary word (`src/ORBmatcher.cc:159,522`).
    2. RANSAC Sim3 on the matched pairs, gated by octave-scaled REPROJECTION
       chi2 in both images (`Sim3Solver::CheckInliers` parity — a fixed
       metric threshold rejects every true revisit at stereo driving ranges,
       the round-4 loop-never-fires defect).
    3. `SearchBySim3` growth (`src/ORBmatcher.cc:1102`): project the
       candidate's points into the current IMAGE with the solved Sim3 and
       re-match within an octave-scaled pixel window (`th*scaleFactor^oct`)
       — correspondences the appearance pass missed — then re-solve; keep
       the better of the two solutions.
    """
    from .place_recognition import quantize_words

    cand_desc = ls.kf_desc[cand_c]
    cand_ok = ls.kf_pts_ok[cand_c]
    cand_pts = ls.kf_pts_cam[cand_c]
    cand_xy = ls.kf_xy[cand_c]
    cand_oct = ls.kf_octave[cand_c].astype(jnp.float32)
    sig2_cur = jnp.float32(scale_factor) ** (2.0 * octave.astype(jnp.float32))
    sig2_cand = jnp.float32(scale_factor) ** (2.0 * cand_oct)

    wm = matcher.word_mask(
        quantize_words(desc_pm), quantize_words(cand_desc)
    )
    m = matcher.mutual_match(
        desc_pm, feat_valid & pts_ok, cand_desc, cand_ok,
        max_dist=matcher.TH_LOW, ratio=0.9, pair_mask=wm,
    )
    j = jnp.clip(m.idx, 0)

    def solve(match_idx, match_valid, k):
        ji = jnp.clip(match_idx, 0)
        return ransac_sim3_reproj(
            pts_src=cand_pts[ji], pts_dst=pts_cam,
            uv_src=cand_xy[ji], uv_dst=xy,
            sigma2_src=sig2_cand[ji], sigma2_dst=sig2_cur,
            valid=match_valid, key=k, intr=intr,
            with_scale=not fix_scale,
        )

    res = solve(m.idx, m.valid, key)

    # Growth window: candidate snapshot projected into the current image.
    src_in_cur = lie.transform_points(res.T_ds, cand_pts)
    uv_proj, z_proj = project(src_in_cur, intr)
    r = grow_px * jnp.float32(scale_factor) ** octave.astype(jnp.float32)
    near = (
        jnp.sum((xy[:, None, :] - uv_proj[None, :, :]) ** 2, axis=-1)
        < (r ** 2)[:, None]
    ) & (z_proj > 0)[None, :]
    m2 = matcher.mutual_match(
        desc_pm, feat_valid & pts_ok, cand_desc, cand_ok,
        max_dist=matcher.TH_HIGH, ratio=0.95, pair_mask=near,
    )
    idx2 = jnp.where(m2.valid, m2.idx, m.idx)
    valid2 = (m2.valid | m.valid) & res.ok  # growth only off a real seed
    res2 = solve(idx2, valid2, jax.random.fold_in(key, 1))
    better = res2.ok & (res2.num_inliers > res.num_inliers)
    res = type(res)(
        T_ds=jnp.where(better, res2.T_ds, res.T_ds),
        inliers=jnp.where(better, res2.inliers, res.inliers),
        num_inliers=jnp.where(better, res2.num_inliers, res.num_inliers),
        ok=res.ok | (better & res2.ok),
    )

    # OptimizeSim3 polish (`src/Optimizer.cc:1100` role): the Horn solve is
    # 3D least-squares — far stereo points with meters of depth noise pull
    # the loop-edge translation off by ~0.5 m, which the pose graph then
    # bakes into the whole chain.  Re-optimize against the two-sided image
    # residuals on the winning match set and keep the refined edge when it
    # explains at least as many matches.
    idx_w = jnp.where(better, idx2, j)
    valid_w = jnp.where(better, valid2, m.valid)
    jw = jnp.clip(idx_w, 0)
    T_pol = refine_sim3_reproj(
        res.T_ds, cand_pts[jw], pts_cam, cand_xy[jw], xy,
        sig2_cand[jw], sig2_cur, res.inliers.astype(jnp.float32), intr,
        with_scale=not fix_scale,
    )
    inl_pol = sim3_image_inliers(
        T_pol, cand_pts[jw], pts_cam, cand_xy[jw], xy,
        sig2_cand[jw], sig2_cur, valid_w, intr,
        with_scale=not fix_scale,
    )
    n_pol = jnp.sum(inl_pol)
    keep = res.ok & (n_pol >= res.num_inliers)
    res = type(res)(
        T_ds=jnp.where(keep, T_pol, res.T_ds),
        inliers=jnp.where(keep, inl_pol, res.inliers),
        num_inliers=jnp.where(keep, n_pol, res.num_inliers),
        ok=res.ok,
    )
    return res, m


@partial(jax.jit, static_argnames=("fix_scale", "scale_factor"))
def detect_loop(
    ls: LoopState,
    desc_pm: jax.Array,  # current KF features (F, 256)
    feat_valid: jax.Array,
    pts_cam: jax.Array,  # (F, 3)
    pts_ok: jax.Array,
    key: jax.Array,
    intr=None,
    xy: jax.Array | None = None,
    octave: jax.Array | None = None,
    score_min: float = 0.18,
    exclude_recent: int = 10,
    min_inliers: int = 20,
    fix_scale: bool = True,
    scale_factor: float = 1.2,
) -> LoopDetection:
    """Appearance query + Sim3 geometric verification in one fused pass."""
    if octave is None:
        octave = jnp.zeros(desc_pm.shape[0], jnp.int32)
    sig = bow_signature(desc_pm, feat_valid)
    cand, score = query(ls.db, sig, exclude_recent)
    cand_c = jnp.clip(cand, 0)

    res, _ = _match_and_solve_sim3(
        ls, cand_c, desc_pm, feat_valid, pts_cam, pts_ok, xy, octave,
        key, fix_scale, intr, scale_factor,
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

    Essential graph (parity: `Optimizer::OptimizeEssentialGraph`,
    `src/Optimizer.cc:785-1049`): odometry chain (the spanning tree of the
    sequential keyframe policy) + COVISIBILITY edges mined from the shared-
    observation counts in the edge store + the verified loop edge.  After
    optimization every map point and object is moved by its anchor
    keyframe's correction T_w_new <- T_w_old.
    """
    Kmax = m.kf_Tcw.shape[0]
    K = m.num_kfs
    poses = m.kf_Tcw  # vertices: T_iw = Tcw per keyframe

    ids = jnp.arange(Kmax, dtype=jnp.int32)
    # Covisibility counts: shared-valid-observation counts between keyframe
    # pairs as one int8 MXU matmul over the per-KF point incidence
    # (the reference's covisibility graph, `src/Optimizer.cc:855`).
    Nmax = m.pt_xyz.shape[0]
    seen = jnp.zeros((Kmax, Nmax), jnp.int8).at[
        jnp.where(m.ob_valid, m.ob_kf, 0),
        jnp.where(m.ob_valid, m.ob_pt, 0),
    ].max(m.ob_valid.astype(jnp.int8))
    covis = jax.lax.dot_general(
        seen, seen, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (Kmax, Kmax) shared-point counts

    # Odometry edges (i, i+1) for i+1 < K, COVISIBILITY-WEIGHTED: a
    # consecutive pair sharing no observations got its relative pose from a
    # tracking handoff with no common structure — on a revisit that is the
    # signature of a sheet jump between the old and the double-mapped new
    # map, and its measurement is meaningless.  Uniform weights let two such
    # glitch edges (measured: 2.7 m relative error, covis 0) spread their
    # error over the whole chain; scaling by shared-point count (full trust
    # at >=100, the reference's essential-graph threshold) makes the pose
    # graph break AT the glitch instead (mini-circuit regression: corrected
    # kf-ATE 1.08 -> 0.67).
    odo_i = ids
    odo_j = jnp.clip(ids + 1, 0, Kmax - 1)
    odo_covis = covis[odo_i, odo_j].astype(jnp.float32)
    odo_w = ((odo_j < K) & (odo_i < odo_j)).astype(jnp.float32) * jnp.clip(
        odo_covis / 100.0, 1e-4, 1.0
    )

    pair_ok = (
        (ids[None, :] > ids[:, None] + 1)  # above diagonal, skip adjacent
        & (ids[None, :] < K)
        & m.kf_valid[:, None]
        & m.kf_valid[None, :]
        & (covis >= 20)
    )
    E_cov = 4 * Kmax
    flat = jnp.where(pair_ok, covis, 0).reshape(-1)
    top_c, top_idx = jax.lax.top_k(flat, E_cov)
    cov_i = (top_idx // Kmax).astype(jnp.int32)
    cov_j = (top_idx % Kmax).astype(jnp.int32)
    cov_w = jnp.where(top_c > 0, jnp.clip(top_c / 100.0, 0.2, 1.0), 0.0)

    all_i = jnp.concatenate([odo_i, cov_i, cur_kf[None]])
    all_j = jnp.concatenate([odo_j, cov_j, det.match_kf[None]])
    meas_T = jax.vmap(lambda a, b: relative_measurement(a, b, not fix_scale))(
        poses[all_i[:-1]], poses[all_j[:-1]]
    )
    # loop edge: T_cur_match maps match-cam points into cur-cam:
    # p_cur = T_cm p_match => T_cur_w = T_cm @ T_match_w => measurement
    # M(cur, match) = T_cur_w T_match_w^-1 = T_cm.
    loop_w = jnp.where(det.found, 5.0, 0.0)[None]

    edges = PoseGraphEdges(
        i=all_i,
        j=all_j,
        T_ij=jnp.concatenate([meas_T, det.T_cur_match[None]]),
        weight=jnp.concatenate([odo_w, cov_w, loop_w]),
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
