"""Local mapping: covisibility-window bundle adjustment over the SoA map.

Parity (behavior): `LocalMapping::RunOneTime` BA dispatch
(`src/LocalMapping.cc:227-246`) — after each keyframe insertion the newest
keyframe's covisibility neighborhood is re-optimized with the two-stage
robust schedule, the two oldest in-window cameras anchored
(`LocalBundleAdjustment` fixed-frame semantics, `src/Optimizer.cc:458-784`).
Outlier edges are invalidated in the map's edge store (the reference erases
observations).  Also here: global BA, keyframe culling, map-point fusion,
point culling.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..opt.local_ba import local_bundle_adjustment
from ..opt.reproj import ReprojEdges
from .map import MapState
from .tracking import TrackingConfig


def edge_budget_for(num_obs: int, emax: int, floor: int = 4096) -> int:
    """Power-of-2 bucket >= num_obs (legacy whole-store bucketing; the
    system now uses `window_edge_budget` — local BA cost must scale with
    the WINDOW, not the map)."""
    b = floor
    while b < num_obs and b < emax:
        b *= 2
    return min(b, emax)


def window_edge_budget(window: int, cfg: TrackingConfig, emax: int) -> int:
    """Static edge capacity for a covisibility window: each keyframe
    contributes at most F tracked observations + new-point observations,
    so window * 2F bounds the window's edge count.  One value per config
    -> ONE compiled local-BA program regardless of map size (the previous
    num_obs-bucketing recompiled AND re-processed the whole edge store as
    the map grew — O(map) per keyframe instead of O(window))."""
    need = window * 2 * cfg.orb.num_features
    b = 4096
    while b < need and b < emax:
        b *= 2
    return min(b, emax)


@partial(jax.jit, static_argnames=("cfg", "window", "edge_budget"))
def local_ba_step(
    m: MapState, cfg: TrackingConfig, window: int = 8,
    edge_budget: int | None = None,
) -> MapState:
    """Optimize the last `window` keyframes + all their points in place.

    `edge_budget` (static): the window's edges are COMPACTED into a buffer
    of this capacity before the solve (one argsort gather), so the LM
    iterations touch O(window) edges however large the map has grown.
    """
    Kmax = m.kf_Tcw.shape[0]
    window = min(window, Kmax)  # tiny stores: window cannot exceed capacity
    newest = m.num_kfs - 1

    # Covisibility window selection (parity: the reference's local BA
    # operates on the newest keyframe's covisibility neighborhood,
    # `src/Optimizer.cc:458-540`): count shared valid observations between
    # every keyframe and the newest one, take the top (window-1) + newest.
    kf_ids = jnp.arange(Kmax, dtype=jnp.int32)
    in_map = (kf_ids < m.num_kfs) & m.kf_valid
    Nmax = m.pt_xyz.shape[0]
    seen_by_new = (
        jnp.zeros(Nmax, jnp.int32).at[m.ob_pt].add(
            (m.ob_valid & (m.ob_kf == newest)).astype(jnp.int32)
        )
        > 0
    )
    covis = jax.ops.segment_sum(
        (m.ob_valid & seen_by_new[m.ob_pt]).astype(jnp.int32),
        m.ob_kf,
        num_segments=Kmax,
    )
    covis = jnp.where(in_map & (kf_ids != newest), covis, -1)
    scores, top = jax.lax.top_k(covis, window - 1)
    sel_raw = jnp.concatenate(
        [
            jnp.where(scores > 0, top.astype(jnp.int32), Kmax),
            newest[None].astype(jnp.int32),
        ]
    )
    kf_sorted = jnp.sort(sel_raw)  # invalid selections (= Kmax) sort last
    uniq = jnp.concatenate([jnp.ones(1, bool), kf_sorted[1:] != kf_sorted[:-1]])
    win_valid = uniq & (kf_sorted < Kmax)
    slot_of = (
        jnp.full(Kmax + 1, -1, jnp.int32)
        .at[jnp.where(win_valid, kf_sorted, Kmax)]
        .set(jnp.where(win_valid, jnp.arange(window, dtype=jnp.int32), -1))
    )[:Kmax]
    kf_sel = jnp.clip(kf_sorted, 0, Kmax - 1)
    Tcw_win = m.kf_Tcw[kf_sel]
    # Anchor the two oldest in-window cameras (and any padding slots).
    cam_fixed = (jnp.arange(window) < 2) | ~win_valid

    edge_slot = slot_of[m.ob_kf]
    valid = m.ob_valid & (edge_slot >= 0) & m.pt_valid[m.ob_pt]

    # Guard: a window camera with no surviving edges must not float free
    # (its zero Hessian block would destabilize every LM step).
    slot_edges = jax.ops.segment_sum(
        valid.astype(jnp.int32), jnp.clip(edge_slot, 0), num_segments=window
    )
    cam_fixed = cam_fixed | (slot_edges == 0)
    inv_sigma2 = (1.0 / cfg.orb.pyramid.scale_factor ** 2) ** m.ob_octave.astype(
        jnp.float32
    )
    take = None
    if edge_budget is not None and edge_budget < m.ob_kf.shape[0]:
        # Compact the window's edges into an O(window) buffer: the LM scan
        # then processes `edge_budget` rows however large the edge store is.
        order = jnp.argsort(~valid)  # stable: window edges first
        take = order[:edge_budget]
        edges = ReprojEdges(
            kf_idx=jnp.clip(edge_slot, 0)[take],
            pt_idx=m.ob_pt[take],
            uv=m.ob_uv[take],
            u_right=m.ob_ur[take],
            inv_sigma2=inv_sigma2[take],
            valid=valid[take],
        )
    else:
        edges = ReprojEdges(
            kf_idx=jnp.clip(edge_slot, 0),
            pt_idx=m.ob_pt,
            uv=m.ob_uv,
            u_right=m.ob_ur,
            inv_sigma2=inv_sigma2,
            valid=valid,
        )
    res = local_bundle_adjustment(
        Tcw_win,
        m.pt_xyz,
        cam_fixed,
        edges,
        cfg.intr,
        baseline_fx=cfg.bf,
    )
    # Outlier edges are disabled exactly where the gate rejected an
    # in-window edge; out-of-window edges keep their validity.
    if take is not None:
        ob_valid_new = m.ob_valid.at[take].set(
            jnp.where(valid[take], res.inlier & m.ob_valid[take], m.ob_valid[take])
        )
    else:
        ob_valid_new = jnp.where(edge_slot >= 0, res.inlier & m.ob_valid, m.ob_valid)
    # Write back optimized window poses and all points (invalid slots write
    # into a dump row so duplicate clamped ids can't clobber real poses).
    kf_write = jnp.where(win_valid, kf_sel, Kmax)
    kf_Tcw_ext = jnp.concatenate([m.kf_Tcw, jnp.zeros((1, 4, 4), m.kf_Tcw.dtype)])
    m = m._replace(
        kf_Tcw=kf_Tcw_ext.at[kf_write].set(res.Tcw)[:Kmax],
        pt_xyz=res.points,
        ob_valid=ob_valid_new,
    )
    return m


@partial(jax.jit, static_argnames=("cfg", "iters"))
def global_ba_step(m: MapState, cfg: TrackingConfig, iters: int = 10) -> MapState:
    """Whole-map BA (parity: `RunGlobalJointBundleAdjustment` after a loop,
    `src/LoopClosing_util.cc:295`, 10 iterations; gauge anchored at KF 0)."""
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
    res = local_bundle_adjustment(
        m.kf_Tcw, m.pt_xyz, cam_fixed, edges, cfg.intr,
        baseline_fx=cfg.bf, iters_robust=iters // 2, iters_final=iters - iters // 2,
    )
    return m._replace(
        kf_Tcw=jnp.where(in_map[:, None, None], res.Tcw, m.kf_Tcw),
        pt_xyz=res.points,
        ob_valid=jnp.where(in_map[m.ob_kf], res.inlier & m.ob_valid, m.ob_valid),
    )


@partial(jax.jit, static_argnames=("window_pts",))
def fuse_map_points(
    m: MapState,
    window_pts: int = 2048,
    radius: float = 0.02,
    desc_th: int = 25,
) -> MapState:
    """Merge duplicate map points (same surface point triangulated twice).

    Parity: the map-point fusion of `LocalMapping::SearchInNeighbors` /
    `ORBmatcher::Fuse` (`src/LocalMapping.cc:146`, `src/ORBmatcher.cc:825`).
    TPU-native: pairwise 3D-distance + descriptor-distance tests over the
    most recent `window_pts` points (recent points are the fusion
    candidates — older ones were already deduplicated); duplicates collapse
    into the lower id and their observation edges are re-pointed.
    """
    Nmax = m.pt_xyz.shape[0]
    window_pts = min(window_pts, Nmax)
    start = jnp.clip(m.num_pts - window_pts, 0, Nmax - window_pts)
    idx = start + jnp.arange(window_pts)
    xyz = m.pt_xyz[idx]
    desc = m.pt_desc[idx]
    valid = m.pt_valid[idx] & (idx < m.num_pts)

    d2 = jnp.sum((xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    dots = jax.lax.dot_general(
        desc, desc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    ham = (desc.shape[1] - dots) // 2
    ii = jnp.arange(window_pts)
    # Co-observation exclusion: two points seen in the SAME keyframe are two
    # real features, however close — true duplicates arise from independent
    # triangulations in DIFFERENT keyframes.  (Without this, fusing nearby
    # wall points injects contradictory same-KF measurements into BA and
    # measurably degrades ATE.)
    Kmax = m.kf_Tcw.shape[0]
    in_win_edge = (m.ob_pt >= start) & (m.ob_pt < start + window_pts) & m.ob_valid
    local_pt = jnp.clip(m.ob_pt - start, 0, window_pts - 1)
    obs_mask = jnp.zeros((window_pts, Kmax), jnp.float32).at[
        jnp.where(in_win_edge, local_pt, 0),
        jnp.where(in_win_edge, m.ob_kf, 0),
    ].max(in_win_edge.astype(jnp.float32))
    co_observed = (obs_mask @ obs_mask.T) > 0.0
    mergeable = (
        (d2 < radius * radius)
        & (ham < desc_th)
        & ~co_observed
        & valid[:, None]
        & valid[None, :]
        & (ii[None, :] < ii[:, None])  # partner must have a LOWER index
    )
    has_partner = mergeable.any(axis=1)
    partner = jnp.argmax(mergeable, axis=1)  # lowest such index wins argmax? no:
    # argmax returns the FIRST True along the row = lowest index ✓
    target = jnp.where(has_partner, partner, ii)
    # Resolve chains (a -> b -> c) with two contractions.
    target = target[target]
    target = target[target]

    # Remap edges: window-local ids -> global.
    global_target = start + target
    in_window = (m.ob_pt >= start) & (m.ob_pt < start + window_pts)
    local = jnp.clip(m.ob_pt - start, 0, window_pts - 1)
    ob_pt_new = jnp.where(in_window, global_target[local], m.ob_pt)
    dead = has_partner
    pt_valid_new = m.pt_valid.at[idx].set(m.pt_valid[idx] & ~dead)
    return m._replace(ob_pt=ob_pt_new, pt_valid=pt_valid_new)


@partial(jax.jit, static_argnames=())
def cull_keyframes(m: MapState, redundancy: float = 0.9) -> MapState:
    """Deactivate redundant keyframes.

    Parity: `LocalMapping::KeyFrameCulling` (`src/LocalMapping.cc:245`) — a
    keyframe (not the first, not the newest) whose tracked points are ≥90%
    observed by ≥3 keyframes is redundant; it is marked invalid and its
    observations leave the optimization.  Slots are kept (ids stay stable for
    snapshots/anchors); the BA window's zero-edge guard handles the rest.
    """
    Kmax = m.kf_Tcw.shape[0]
    Nmax = m.pt_xyz.shape[0]
    obs_per_pt = jax.ops.segment_sum(
        m.ob_valid.astype(jnp.int32), m.ob_pt, num_segments=Nmax
    )
    well_observed = obs_per_pt >= 3
    per_kf_total = jax.ops.segment_sum(
        m.ob_valid.astype(jnp.int32), m.ob_kf, num_segments=Kmax
    )
    per_kf_redund = jax.ops.segment_sum(
        (m.ob_valid & well_observed[m.ob_pt]).astype(jnp.int32),
        m.ob_kf,
        num_segments=Kmax,
    )
    kf_ids = jnp.arange(Kmax)
    frac = per_kf_redund / jnp.maximum(per_kf_total, 1)
    cullable = (
        m.kf_valid
        & (kf_ids > 0)
        & (kf_ids < m.num_kfs - 4)  # keep the recent window intact
        & (m.num_kfs >= 8)  # small maps need every constraint
        & (per_kf_total > 0)
        & (frac >= redundancy)
    )
    # Cull at most ONE keyframe per call: removing several at once could
    # push shared points below the 3-observer bar simultaneously.
    first = jnp.argmax(cullable)
    do = cullable[first]
    kf_valid = m.kf_valid.at[first].set(jnp.where(do, False, m.kf_valid[first]))
    ob_valid = jnp.where(do & (m.ob_kf == first), False, m.ob_valid)
    return m._replace(kf_valid=kf_valid, ob_valid=ob_valid)


@partial(jax.jit, static_argnames=())
def cull_points(m: MapState, min_obs: int = 2) -> MapState:
    """Disable points whose surviving observation count fell below min_obs.

    Parity: `LocalMapping::MapPointCulling` (`src/LocalMapping.cc:137`).
    """
    obs = jax.ops.segment_sum(
        m.ob_valid.astype(jnp.int32), m.ob_pt, num_segments=m.pt_xyz.shape[0]
    )
    keep = m.pt_valid & (obs >= min_obs)
    return m._replace(pt_valid=keep, pt_obs_count=obs)
