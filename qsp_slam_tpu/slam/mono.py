"""Monocular pipeline pieces: two-view bootstrap + keyframe triangulation.

Parity:
  * `mono_initialize`        ≈ `Tracking::MonocularInitialization` +
                               `CreateInitialMapMonocular` (`src/Tracking.cc:687-880`)
  * `triangulate_new_points` ≈ `LocalMapping::CreateNewMapPoints`
                               (`src/LocalMapping.cc:137-146` epipolar
                               triangulation against neighbor keyframes,
                               condensed to the previous keyframe)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics, pixel_rays, project, in_image
from ..frontend import matcher
from ..frontend.initializer import TwoViewInit, two_view_init, _triangulate
from ..frontend.orb import Features
from . import map as mapmod
from .map import MapState
from .tracking import FrameData, TrackingConfig


class MonoInitResult(NamedTuple):
    ok: jax.Array
    T_cw2: jax.Array  # (4, 4)
    # match-aligned (capacity = features of frame 2)
    pts_w: jax.Array  # (F, 3)
    pt_ok: jax.Array  # (F,)
    uv1: jax.Array  # (F, 2) pixel in frame 1
    uv2: jax.Array  # (F, 2) pixel in frame 2
    octave2: jax.Array  # (F,)


@partial(jax.jit, static_argnames=("cfg",))
def mono_initialize(
    frame1: FrameData, frame2: FrameData, cfg: TrackingConfig, key: jax.Array
) -> MonoInitResult:
    """Match frames, run dual-model two-view init, return world structure."""
    m = matcher.mutual_match(
        frame1.feats.desc_pm, frame1.feats.valid,
        frame2.feats.desc_pm, frame2.feats.valid,
        max_dist=matcher.TH_LOW, ratio=0.9,
    )
    keep = matcher.rotation_consistency(
        frame1.feats.angle,
        frame2.feats.angle[jnp.clip(m.idx, 0)],
        m.valid,
    )
    f2 = jnp.clip(m.idx, 0)
    uv1 = frame1.feats.xy
    uv2 = frame2.feats.xy[f2]
    init = two_view_init(uv1, uv2, keep, cfg.intr, key)
    return MonoInitResult(
        ok=init.ok,
        T_cw2=init.T_cw2,
        pts_w=init.points,
        pt_ok=init.pt_ok & keep,
        uv1=uv1,
        uv2=uv2,
        octave2=frame2.feats.octave[f2],
    )


@partial(jax.jit, static_argnames=("cfg", "max_new"))
def triangulate_new_points(
    m: MapState,
    prev_desc: jax.Array,  # (S, 256) previous keyframe feature snapshot
    prev_xy: jax.Array,  # (S, 2)
    prev_valid: jax.Array,  # (S,)
    prev_kf: jax.Array,  # int32
    cur_kf: jax.Array,  # int32
    frame: FrameData,
    matched_feat: jax.Array,  # (F,) features already bound to map points
    cfg: TrackingConfig,
    max_new: int = 128,
    min_parallax_deg: float = 1.0,
    max_reproj_px: float = 2.0,
) -> MapState:
    """Triangulate unmatched features against the previous keyframe."""
    intr = cfg.intr
    T1 = m.kf_Tcw[prev_kf]
    T2 = m.kf_Tcw[cur_kf]
    # Epipolar-gated candidate set (`SearchForTriangulation`'s
    # CheckDistEpipolarLine, `src/ORBmatcher.cc:657,747`): at real-image
    # outlier rates a pure descriptor match triangulates ghosts; the gate
    # removes off-line candidates BEFORE the ratio test.
    # sigma 2 px: the gate runs on ESTIMATED keyframe poses, whose error
    # inflates the distance of true correspondences to the predicted line.
    epi = matcher.epipolar_mask(
        prev_xy, frame.feats.xy, T2 @ lie.inv_se3(T1), intr,
        octave_b=frame.feats.octave, scale_factor=cfg.orb.pyramid.scale_factor,
        sigma_px=2.0,
    )
    mm = matcher.mutual_match(
        prev_desc, prev_valid,
        frame.feats.desc_pm, frame.feats.valid & ~matched_feat,
        max_dist=matcher.TH_LOW, ratio=0.85,
        pair_mask=epi,
    )
    f2 = jnp.clip(mm.idx, 0)
    uv1 = prev_xy
    uv2 = frame.feats.xy[f2]
    # Rays in each camera, triangulated in the relative frame then lifted.
    r1 = pixel_rays(uv1, intr)
    r2 = pixel_rays(uv2, intr)
    T_21 = T2 @ lie.inv_se3(T1)  # cam1 -> cam2
    pts_c1, d1, d2 = _triangulate(r1, r2, T_21)
    pts_w = lie.transform_points(lie.inv_se3(T1), pts_c1[None])[0]

    # Gates: both depths positive, parallax, reprojection error in both views.
    c1_w = lie.inv_se3(T1)[:3, 3]
    c2_w = lie.inv_se3(T2)[:3, 3]
    v1 = pts_w - c1_w
    v2 = pts_w - c2_w
    cosang = jnp.sum(v1 * v2, -1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-12
    )
    par_ok = cosang < jnp.cos(jnp.deg2rad(min_parallax_deg))
    uv1_hat, z1 = project(lie.transform_points(T1, pts_w[None])[0], intr)
    uv2_hat, z2 = project(lie.transform_points(T2, pts_w[None])[0], intr)
    rep_ok = (jnp.linalg.norm(uv1_hat - uv1, axis=-1) < max_reproj_px) & (
        jnp.linalg.norm(uv2_hat - uv2, axis=-1) < max_reproj_px
    )
    good = mm.valid & par_ok & rep_ok & (z1 > 0.05) & (z2 > 0.05)

    # Cap the number of new points per keyframe.
    order = jnp.argsort(~good)
    take = order[:max_new]
    take_ok = good[take]
    view = pts_w[take] - c2_w
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
    m, new_ids = mapmod.add_points(
        m,
        xyz=pts_w[take],
        desc=frame.feats.desc_pm[f2[take]],
        octave=frame.feats.octave[f2[take]],
        normal=view,
        valid=take_ok,
    )
    # Observations in both keyframes.
    m = mapmod.add_observations(
        m, prev_kf, new_ids, uv1[take], jnp.full(max_new, -1.0),
        frame.feats.octave[f2[take]],
    )
    m = mapmod.add_observations(
        m, cur_kf, new_ids, uv2[take], jnp.full(max_new, -1.0),
        frame.feats.octave[f2[take]],
    )
    return m
