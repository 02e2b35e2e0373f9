"""Local mapping: sliding-window bundle adjustment over the SoA map.

Parity (behavior): `LocalMapping::RunOneTime` BA dispatch
(`src/LocalMapping.cc:227-246`) — after each keyframe insertion the local
window is re-optimized with the two-stage robust schedule.  The reference
selects the window by covisibility; at this stage we use the last `window`
keyframes (equivalent for exploratory trajectories) with the two oldest
anchored, matching `LocalBundleAdjustment`'s fixed-frame semantics
(`src/Optimizer.cc:458-784`).  Outlier edges are invalidated in the map's
edge store (the reference erases observations).
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
    """Power-of-2 bucket >= num_obs: early keyframes optimize small problems
    instead of paying for full capacity (few distinct buckets -> few compiles)."""
    b = floor
    while b < num_obs and b < emax:
        b *= 2
    return min(b, emax)


@partial(jax.jit, static_argnames=("cfg", "window", "edge_budget"))
def local_ba_step(
    m: MapState, cfg: TrackingConfig, window: int = 8,
    edge_budget: int | None = None,
) -> MapState:
    """Optimize the last `window` keyframes + all their points in place."""
    if edge_budget is not None and edge_budget < m.ob_kf.shape[0]:
        mm = m._replace(
            ob_kf=m.ob_kf[:edge_budget],
            ob_pt=m.ob_pt[:edge_budget],
            ob_uv=m.ob_uv[:edge_budget],
            ob_ur=m.ob_ur[:edge_budget],
            ob_octave=m.ob_octave[:edge_budget],
            ob_valid=m.ob_valid[:edge_budget]
            & (jnp.arange(edge_budget) < m.num_obs),
        )
        out = local_ba_step(mm, cfg, window, None)
        return m._replace(
            kf_Tcw=out.kf_Tcw,
            pt_xyz=out.pt_xyz,
            ob_valid=m.ob_valid.at[:edge_budget].set(out.ob_valid),
        )
    Kmax = m.kf_Tcw.shape[0]
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
    # Write back optimized window poses and all points (invalid slots write
    # into a dump row so duplicate clamped ids can't clobber real poses).
    kf_write = jnp.where(win_valid, kf_sel, Kmax)
    kf_Tcw_ext = jnp.concatenate([m.kf_Tcw, jnp.zeros((1, 4, 4), m.kf_Tcw.dtype)])
    m = m._replace(
        kf_Tcw=kf_Tcw_ext.at[kf_write].set(res.Tcw)[:Kmax],
        pt_xyz=res.points,
        # Outlier edges are disabled exactly where the gate rejected an
        # in-window edge; out-of-window edges keep their validity.
        ob_valid=jnp.where(edge_slot >= 0, res.inlier & m.ob_valid, m.ob_valid),
    )
    return m


@partial(jax.jit, static_argnames=("cfg",))
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
