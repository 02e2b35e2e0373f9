"""Per-frame tracking: feature processing, projection matching, pose solve,
keyframe policy.

Parity map (behavior, not structure — see `src/Tracking.cc:384-627`):
  * `process_frame`      ≈ Frame ctor (ORB extraction + RGB-D depth lookup,
                           `src/Frame.cc` RGB-D ctor; u_right = u - bf/z)
  * `track_frame`        ≈ TrackWithMotionModel + TrackLocalMap collapsed into
                           one batched projection-match + pose optimization
                           against the full (masked) point table — the map IS
                           the local map at synthetic scale; covisibility
                           windowing only changes the mask
  * `need_keyframe`      ≈ NeedNewKeyFrame (`src/Tracking.cc:1101`)
  * `create_keyframe`    ≈ CreateNewKeyFrame (`:1186`): insert observations
                           for tracked points, spawn new points from depth
                           for unmatched features (closest-first)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics, backproject, in_image, project
from ..frontend import matcher
from ..frontend.orb import Features, OrbConfig, extract_features
from ..opt.pose_opt import PoseOptResult, optimize_pose
from ..opt.reproj import ReprojEdges
from . import map as mapmod
from .map import MapState


class TrackingConfig(NamedTuple):
    orb: OrbConfig = OrbConfig()
    fx: float = 520.9
    fy: float = 521.0
    cx: float = 325.1
    cy: float = 249.7
    width: int = 640
    height: int = 480
    baseline: float = 0.08  # RGB-D pseudo-stereo baseline (m)
    depth_min: float = 0.1
    depth_max: float = 8.0
    search_radius: float = 12.0  # px, scaled by octave
    min_track_inliers: int = 20
    # Local-map tracking budget (`Tracking::TrackLocalMap` semantics,
    # `src/Tracking.cc:1054,1443-1587`): 0 = match against the full point
    # table (fine while the map is small); >0 = compact the local map
    # (frustum-visible + recently-observed points, in that priority) into a
    # fixed-size view before the descriptor matmul, so per-frame tracking
    # cost is O(budget) however large the map grows.  The reference bounds
    # the same cost through its covisibility-graph local-map walk.
    local_map_budget: int = 0
    kf_min_interval: int = 3
    kf_max_interval: int = 30
    kf_tracked_ratio: float = 0.75
    new_points_per_kf: int = 256
    # "Close" depth for the stereo/RGB-D keyframe trigger, as a multiple of
    # the baseline (reference ThDepth semantics: 40 x 0.08 m = 3.2 m on TUM,
    # 40 x 0.54 m = 21.6 m on KITTI; `src/Tracking.cc:1129-1135`).
    close_depth_factor: float = 40.0
    # Radial-tangential lens distortion (k1, k2, p1, p2, k3) — the
    # reference's `mDistCoef` (`src/Frame.cc:63`, YAML `Camera.k1..k3`).
    # Features are extracted on the DISTORTED image (and depth sampled at
    # the raw pixel), then keypoint coordinates are undistorted once at
    # extraction; all downstream geometry stays pure pinhole, exactly like
    # `Frame::UndistortKeyPoints` (`src/Frame.cc:89`).  All-zero = off.
    dist_coef: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)
    # Divisor applied when a uint16 depth image is passed (the TUM PNG
    # convention, `DepthMapFactor`); f32 depth is taken as meters as-is.
    # Passing uint8 gray / uint16 depth moves the cast on-device, cutting
    # host->device transfer bytes 62% — on a tunneled TPU the upload is a
    # dominant per-frame cost.
    depth_png_scale: float = 5000.0

    @property
    def intr(self) -> Intrinsics:
        return Intrinsics(
            jnp.float32(self.fx), jnp.float32(self.fy),
            jnp.float32(self.cx), jnp.float32(self.cy),
        )

    @property
    def bf(self) -> float:
        return self.baseline * self.fx


class FrameData(NamedTuple):
    feats: Features
    depth: jax.Array  # (F,) depth at keypoint (0 = invalid)
    u_right: jax.Array  # (F,) pseudo-stereo right coordinate (-1 = none)


class TrackResult(NamedTuple):
    Tcw: jax.Array  # (4, 4) optimized pose
    match_pt: jax.Array  # (N_map,) int32 — feature idx matched per map point (-1)
    match_inlier: jax.Array  # (N_map,) bool — survived pose optimization
    num_matches: jax.Array  # int32
    num_inliers: jax.Array  # int32
    # Deviation of the solution from the motion-model prediction, computed
    # in-jit so the host consistency gate needs no extra device dispatch
    # (log_se3 on a 4x4 costs a full tunnel round trip when done separately).
    pred_dev_t: jax.Array  # float32 — |translation(log(T_new T_pred^-1))|
    pred_dev_r: jax.Array  # float32 — |rotation(log(T_new T_pred^-1))|
    # Close-point census for the stereo/RGB-D keyframe trigger
    # (`Tracking::NeedNewKeyFrame` nTrackedClose/nNonTrackedClose,
    # `src/Tracking.cc:1129-1135`): a forward-moving camera must spawn a
    # keyframe BEFORE it outruns its close map coverage.
    tracked_close: jax.Array  # int32 — inlier-matched features with close depth
    untracked_close: jax.Array  # int32 — close-depth features not yet in the map


def decode_inputs(
    gray: jax.Array, depth_img: jax.Array, cfg: TrackingConfig
) -> tuple[jax.Array, jax.Array]:
    """Dtype-dispatch camera inputs to f32 (trace-time branch, free in-jit).

    uint8 gray -> f32; uint16 depth -> meters via cfg.depth_png_scale.
    """
    if gray.dtype != jnp.float32:
        gray = gray.astype(jnp.float32)
    if depth_img.dtype == jnp.uint16:
        depth_img = depth_img.astype(jnp.float32) / cfg.depth_png_scale
    elif depth_img.dtype != jnp.float32:
        depth_img = depth_img.astype(jnp.float32)
    return gray, depth_img


@partial(jax.jit, static_argnames=("cfg",))
def process_frame(gray: jax.Array, depth_img: jax.Array, cfg: TrackingConfig) -> FrameData:
    """Extract ORB features and per-keypoint depth (RGB-D frame constructor)."""
    gray, depth_img = decode_inputs(gray, depth_img, cfg)
    feats = extract_features(gray, cfg.orb)
    # Depth is sampled at the RAW (distorted-image) pixel — the depth map is
    # registered to the same distorted lens as the gray image.
    xi = jnp.clip(jnp.round(feats.xy[:, 0]).astype(jnp.int32), 0, cfg.width - 1)
    yi = jnp.clip(jnp.round(feats.xy[:, 1]).astype(jnp.int32), 0, cfg.height - 1)
    d = depth_img[yi, xi]
    ok = (d > cfg.depth_min) & (d < cfg.depth_max) & feats.valid
    d = jnp.where(ok, d, 0.0)
    if any(c != 0.0 for c in cfg.dist_coef):
        # Keypoint undistortion (`Frame::UndistortKeyPoints`,
        # `src/Frame.cc:89`): geometry downstream is pure pinhole.
        from ..core.camera import undistort_points

        feats = feats._replace(
            xy=undistort_points(feats.xy, cfg.intr, cfg.dist_coef)
        )
    # u_right from the UNDISTORTED u (reference: mvuRight is computed from
    # mvKeysUn, `Frame::ComputeStereoFromRGBD`, `src/Frame.cc`).
    u_right = jnp.where(ok, feats.xy[:, 0] - cfg.bf / jnp.where(ok, d, 1.0), -1.0)
    return FrameData(feats=feats, depth=d, u_right=u_right)


def _octave_radius(cfg: TrackingConfig, octave: jax.Array) -> jax.Array:
    return cfg.search_radius * cfg.orb.pyramid.scale_factor ** octave.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def track_frame(
    m: MapState, Tcw_pred: jax.Array, frame: FrameData, cfg: TrackingConfig
) -> TrackResult:
    """Projection search against the map + motion-only pose optimization."""
    Nmax = m.pt_xyz.shape[0]
    B = cfg.local_map_budget
    if B and B < Nmax:
        # Local-map compaction: gather the candidate points into a fixed
        # O(budget) view before the (points x features) descriptor matmul.
        # Priority: inside the predicted frustum first, then points
        # observed by the most recent keyframes (covisibility proxy).
        pc = lie.transform_points(Tcw_pred, m.pt_xyz[None])[0]
        uv_all, z_all = project(pc, cfg.intr)
        in_f = (
            m.pt_valid
            & (z_all > cfg.depth_min)
            & in_image(uv_all, cfg.width, cfg.height, border=-40)
        )
        recent_edge = m.ob_valid & (m.ob_kf >= m.num_kfs - 12)
        recent = (
            jnp.zeros(Nmax, jnp.int32).at[m.ob_pt].add(recent_edge.astype(jnp.int32))
            > 0
        ) & m.pt_valid
        prio = in_f.astype(jnp.float32) * 2.0 + recent.astype(jnp.float32)
        take = jnp.argsort(-prio)[:B]  # stable: ties keep id order
        sub = m._replace(
            pt_xyz=m.pt_xyz[take],
            pt_desc=m.pt_desc[take],
            pt_octave=m.pt_octave[take],
            pt_normal=m.pt_normal[take],
            pt_valid=m.pt_valid[take] & (prio[take] > 0.0),
        )
        r = _track_against(sub, Tcw_pred, frame, cfg)
        # Scatter the per-point results back to the global table.
        return r._replace(
            match_pt=jnp.full(Nmax, -1, jnp.int32).at[take].set(r.match_pt),
            match_inlier=jnp.zeros(Nmax, bool).at[take].set(r.match_inlier),
        )
    return _track_against(m, Tcw_pred, frame, cfg)


def _track_against(
    m: MapState, Tcw_pred: jax.Array, frame: FrameData, cfg: TrackingConfig
) -> TrackResult:
    intr = cfg.intr
    # 1. Project all valid map points with the predicted pose.
    pts_cam = lie.transform_points(Tcw_pred, m.pt_xyz[None])[0]
    uv, z = project(pts_cam, intr)
    # Viewing-angle gate (`Tracking::SearchLocalPoints` cos > 0.5): points
    # seen from the back side or at grazing angles match unreliably.
    cam_center = lie.inv_se3(Tcw_pred)[:3, 3]
    view = m.pt_xyz - cam_center
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
    cos_view = jnp.sum(view * m.pt_normal, axis=-1)
    has_normal = jnp.linalg.norm(m.pt_normal, axis=-1) > 0.5
    proj_ok = (
        m.pt_valid
        & (z > cfg.depth_min)
        & in_image(uv, cfg.width, cfg.height, border=-20)
        & (~has_normal | (cos_view > 0.5))
    )
    # 2. Windowed descriptor match (one masked int8 matmul).  If the narrow
    # window finds too few candidates the search re-runs at 2x radius — the
    # reference's enlarge-and-retry fallback (`src/Tracking.cc:1016-1027`),
    # done branch-free by computing both and selecting.
    def run_search(scale):
        radius = _octave_radius(cfg, m.pt_octave) * scale
        mres = matcher.search_by_projection(
            proj_uv=uv,
            proj_valid=proj_ok,
            proj_desc_pm=m.pt_desc,
            proj_octave=m.pt_octave,
            feat_xy=frame.feats.xy,
            feat_valid=frame.feats.valid,
            feat_desc_pm=frame.feats.desc_pm,
            feat_octave=frame.feats.octave,
            radius_per_row=radius,
            max_dist=matcher.TH_HIGH,
            ratio=0.9,
        )
        return matcher.resolve_duplicates(mres, frame.feats.capacity)

    match1 = run_search(1.0)
    match2 = run_search(2.0)
    few = jnp.sum(match1.valid) < 50
    match = matcher.MatchResult(
        idx=jnp.where(few, match2.idx, match1.idx),
        dist=jnp.where(few, match2.dist, match1.dist),
        valid=jnp.where(few, match2.valid, match1.valid),
    )

    # 3. Pose-only optimization on the matched 3D-2D pairs.
    fidx = jnp.clip(match.idx, 0)
    muv = frame.feats.xy[fidx]
    mur = frame.u_right[fidx]
    moct = frame.feats.octave[fidx]
    inv_sigma2 = (1.0 / cfg.orb.pyramid.scale_factor ** 2) ** moct.astype(jnp.float32)
    edges = ReprojEdges(
        kf_idx=jnp.zeros_like(match.idx),
        pt_idx=jnp.arange(m.pt_xyz.shape[0], dtype=jnp.int32),
        uv=muv,
        u_right=mur,
        inv_sigma2=inv_sigma2,
        valid=match.valid,
    )
    res: PoseOptResult = optimize_pose(
        Tcw_pred, m.pt_xyz, edges, intr, baseline_fx=cfg.bf
    )
    dev = lie.log_se3(res.Tcw @ lie.inv_se3(Tcw_pred))
    # Close-point census (see TrackResult), scatter-free: matches are unique
    # per feature after resolve_duplicates, so counting inlier rows whose
    # FEATURE is close equals counting matched close features; the unmapped
    # count is the complement within the close set (depth > 0 already
    # implies feats.valid — process_frame zeroes invalid features' depth).
    close = (frame.depth > 0.0) & (
        frame.depth < cfg.close_depth_factor * cfg.baseline
    )
    tracked_close = jnp.sum(res.inlier & match.valid & close[fidx])
    untracked_close = jnp.sum(close) - tracked_close
    return TrackResult(
        Tcw=res.Tcw,
        match_pt=match.idx,
        match_inlier=res.inlier,
        num_matches=jnp.sum(match.valid),
        num_inliers=res.num_inliers,
        pred_dev_t=jnp.linalg.norm(dev[:3]),
        pred_dev_r=jnp.linalg.norm(dev[3:]),
        tracked_close=tracked_close,
        untracked_close=untracked_close,
    )


@partial(jax.jit, static_argnames=("cfg",))
def process_and_track(
    gray: jax.Array,
    depth_img: jax.Array,
    m: MapState,
    Tcw_pred: jax.Array,
    cfg: TrackingConfig,
) -> tuple[FrameData, TrackResult]:
    """Fused per-frame step: feature processing + tracking in ONE dispatch.

    On tunneled/remote devices each dispatch costs a round trip; fusing the
    two per-frame stages halves that fixed overhead (the separate functions
    remain for the initialization paths).
    """
    frame = process_frame(gray, depth_img, cfg)
    return frame, track_frame(m, Tcw_pred, frame, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def process_frame_stereo(
    gray_left: jax.Array, gray_right: jax.Array, cfg: TrackingConfig
) -> FrameData:
    """Stereo frame constructor in ONE program: extract left+right features,
    scanline-match with subpixel refinement, and produce per-keypoint depth
    DIRECTLY — no dense depth-image scatter, no second left extraction.

    Parity: `Frame::ComputeStereoMatches` feeding the stereo Frame ctor
    (`src/Frame.cc`).  The round-4 path scattered keypoint depth into an
    (H, W) image and re-ran the RGB-D entry (re-extracting the SAME left
    image); that cost 2 extra dispatches per frame on the drive workload.
    """
    gl = gray_left.astype(jnp.float32) if gray_left.dtype != jnp.float32 else gray_left
    gr = gray_right.astype(jnp.float32) if gray_right.dtype != jnp.float32 else gray_right
    from ..frontend.stereo import depth_from_u_right, match_stereo

    fl = extract_features(gl, cfg.orb)
    fr = extract_features(gr, cfg.orb)
    u_r = match_stereo(
        fl, fr, cfg.bf,
        min_depth=cfg.depth_min, max_depth=cfg.depth_max,
        gray_left=gl, gray_right=gr,
    )
    d = depth_from_u_right(fl.xy[:, 0], u_r, cfg.bf)
    ok = (d > cfg.depth_min) & (d < cfg.depth_max) & fl.valid
    return FrameData(
        feats=fl,
        depth=jnp.where(ok, d, 0.0),
        u_right=jnp.where(ok, u_r, -1.0),
    )


@partial(jax.jit, static_argnames=("cfg",))
def process_and_track_stereo(
    gray_left: jax.Array,
    gray_right: jax.Array,
    m: MapState,
    Tcw_pred: jax.Array,
    cfg: TrackingConfig,
) -> tuple[FrameData, TrackResult]:
    """Fused stereo per-frame step: both extractions + stereo matching +
    tracking in ONE dispatch (the stereo sibling of `process_and_track`)."""
    frame = process_frame_stereo(gray_left, gray_right, cfg)
    return frame, track_frame(m, Tcw_pred, frame, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def keyframe_insertion(
    m: MapState,
    Tcw: jax.Array,
    frame: FrameData,
    track: TrackResult,
    cfg: TrackingConfig,
) -> MapState:
    """Insert a keyframe: observations for tracked points + new depth points.

    New map points come from features with valid depth that were NOT matched
    to an existing point, closest-first (`src/Tracking.cc:1313-1373` sorts by
    depth and instantiates close points).
    """
    m, kf_id = mapmod.add_keyframe(m, Tcw)
    F = frame.feats.capacity
    N = m.pt_xyz.shape[0]

    # --- observations of tracked (inlier) map points
    pt_ids = jnp.where(track.match_inlier, jnp.arange(N, dtype=jnp.int32), -1)
    fidx = jnp.clip(track.match_pt, 0)
    m = mapmod.add_observations(
        m,
        kf_id,
        pt_ids=jnp.where(track.match_inlier, pt_ids, -1),
        uv=frame.feats.xy[fidx],
        u_right=frame.u_right[fidx],
        octave=frame.feats.octave[fidx],
    )
    # Descriptor maintenance (role of
    # `MapPoint::ComputeDistinctiveDescriptors`): a saturating majority vote
    # over the ±1 observation history approximates the median descriptor —
    # stable, unlike latest-wins (which ratchets with viewpoint and measurably
    # hurts ATE on the synthetic benchmark).
    pids = jnp.clip(pt_ids, 0)
    acc_old = m.pt_desc_acc[pids]
    acc_new = jnp.clip(
        acc_old.astype(jnp.int16) + frame.feats.desc_pm[fidx].astype(jnp.int16),
        -16, 16,
    ).astype(jnp.int8)
    acc_new = jnp.where(track.match_inlier[:, None], acc_new, acc_old)
    desc_new = jnp.where(
        acc_new > 0, jnp.int8(1),
        jnp.where(acc_new < 0, jnp.int8(-1), m.pt_desc[pids]),
    )
    m = m._replace(
        pt_desc_acc=m.pt_desc_acc.at[pids].set(acc_new),
        pt_desc=m.pt_desc.at[pids].set(desc_new),
    )

    # --- new points from unmatched features with depth, closest-first
    matched_feat = jnp.zeros(F, bool).at[fidx].set(track.match_inlier)
    cand = frame.feats.valid & (frame.depth > 0.0) & ~matched_feat
    order = jnp.argsort(jnp.where(cand, frame.depth, jnp.inf))
    take = order[: cfg.new_points_per_kf]
    take_ok = cand[take]
    T_wc = lie.inv_se3(Tcw)
    p_cam = backproject(frame.feats.xy[take], frame.depth[take], cfg.intr)
    p_w = lie.transform_points(T_wc, p_cam[None])[0]
    view = p_w - T_wc[:3, 3]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
    m, new_ids = mapmod.add_points(
        m,
        xyz=p_w,
        desc=frame.feats.desc_pm[take],
        octave=frame.feats.octave[take],
        normal=view,
        valid=take_ok,
    )
    m = mapmod.add_observations(
        m,
        kf_id,
        pt_ids=new_ids,
        uv=frame.feats.xy[take],
        u_right=frame.u_right[take],
        octave=frame.feats.octave[take],
    )
    return m


def need_keyframe(
    frames_since_kf: int,
    num_inliers: int,
    inliers_at_last_kf: int,
    cfg: TrackingConfig,
    tracked_close: int = 0,
    untracked_close: int = 0,
) -> bool:
    """Host-side keyframe policy (`Tracking::NeedNewKeyFrame` essentials).

    Triggers: max interval, tracked-ratio decay, and the stereo/RGB-D
    close-point census (`src/Tracking.cc:1129-1135` bNeedToInsertClose):
    when fewer than 100 close points are tracked while more than 70 close
    features are unmapped, the camera is OUTRUNNING its map (forward
    driving) and must spawn a keyframe even though the inlier ratio still
    looks healthy."""
    if frames_since_kf < cfg.kf_min_interval:
        return False
    if frames_since_kf >= cfg.kf_max_interval:
        return True
    if tracked_close < 100 and untracked_close > 70:
        return True
    return num_inliers < cfg.kf_tracked_ratio * max(inliers_at_last_kf, 1)
