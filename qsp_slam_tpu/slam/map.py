"""SoA map state: keyframes, points, observations as capacity-padded arrays.

Replaces the reference's pointer-graph map (`src/Map.cc`, `KeyFrame`,
`MapPoint` with mutexes — `include/Map.h:88-211`) with a functional
value-type state: fixed-capacity arrays + validity masks + monotone counters.
All mutating "methods" are pure functions returning a new MapState; under
jit, donation makes them in-place.

Layout:
  keyframes   Tcw (Kmax, 4, 4), valid mask
  points      xyz (Nmax, 3), descriptor (±1 int8, for MXU matching),
              reference octave, view normal, observation count, valid mask
  observations edge table (Emax,): kf_idx, pt_idx, uv, u_right, octave,
              valid — exactly the edge format the BA solver consumes
              (opt.reproj.ReprojEdges), so BA requires no graph traversal.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..frontend.orb import DESC_BITS


class MapState(NamedTuple):
    # keyframes
    kf_Tcw: jax.Array  # (Kmax, 4, 4) f32
    kf_valid: jax.Array  # (Kmax,) bool
    num_kfs: jax.Array  # () int32
    # points
    pt_xyz: jax.Array  # (Nmax, 3) f32
    pt_desc: jax.Array  # (Nmax, 256) int8 — matching form (±1, sign of acc)
    pt_desc_acc: jax.Array  # (Nmax, 256) int8 — majority-vote accumulator
    pt_octave: jax.Array  # (Nmax,) int32
    pt_normal: jax.Array  # (Nmax, 3) f32 mean viewing direction
    pt_obs_count: jax.Array  # (Nmax,) int32
    pt_valid: jax.Array  # (Nmax,) bool
    num_pts: jax.Array  # () int32
    # observations (BA edge store)
    ob_kf: jax.Array  # (Emax,) int32
    ob_pt: jax.Array  # (Emax,) int32
    ob_uv: jax.Array  # (Emax, 2) f32
    ob_ur: jax.Array  # (Emax,) f32  (-1 for mono)
    ob_octave: jax.Array  # (Emax,) int32
    ob_valid: jax.Array  # (Emax,) bool
    num_obs: jax.Array  # () int32

    @property
    def capacity(self) -> tuple[int, int, int]:
        return self.kf_Tcw.shape[0], self.pt_xyz.shape[0], self.ob_kf.shape[0]


def empty_map(kmax: int = 64, nmax: int = 8192, emax: int = 65536) -> MapState:
    return MapState(
        kf_Tcw=jnp.tile(jnp.eye(4, dtype=jnp.float32), (kmax, 1, 1)),
        kf_valid=jnp.zeros(kmax, bool),
        num_kfs=jnp.int32(0),
        pt_xyz=jnp.zeros((nmax, 3), jnp.float32),
        pt_desc=jnp.zeros((nmax, DESC_BITS), jnp.int8),
        pt_desc_acc=jnp.zeros((nmax, DESC_BITS), jnp.int8),
        pt_octave=jnp.zeros(nmax, jnp.int32),
        pt_normal=jnp.zeros((nmax, 3), jnp.float32),
        pt_obs_count=jnp.zeros(nmax, jnp.int32),
        pt_valid=jnp.zeros(nmax, bool),
        num_pts=jnp.int32(0),
        ob_kf=jnp.zeros(emax, jnp.int32),
        ob_pt=jnp.zeros(emax, jnp.int32),
        ob_uv=jnp.zeros((emax, 2), jnp.float32),
        ob_ur=jnp.full(emax, -1.0, jnp.float32),
        ob_octave=jnp.zeros(emax, jnp.int32),
        ob_valid=jnp.zeros(emax, bool),
        num_obs=jnp.int32(0),
    )


def add_keyframe(m: MapState, Tcw: jax.Array) -> tuple[MapState, jax.Array]:
    """Append a keyframe; returns (map, kf_id) — kf_id is -1 when full.

    Capacity guard: under jit, out-of-range scatter indices clamp, so an
    unguarded write at capacity would silently overwrite the LAST keyframe
    (corrupting the KF-id <-> loop-snapshot alignment invariant).  At
    capacity the write is dropped instead; hosts grow the store ahead of
    time via `grow_map` (see `SlamSystem._ensure_capacity`).
    """
    Kmax = m.kf_Tcw.shape[0]
    fits = m.num_kfs < Kmax
    kid = jnp.clip(m.num_kfs, 0, Kmax - 1)
    return (
        m._replace(
            kf_Tcw=m.kf_Tcw.at[kid].set(jnp.where(fits, Tcw, m.kf_Tcw[kid])),
            kf_valid=m.kf_valid.at[kid].set(m.kf_valid[kid] | fits),
            num_kfs=m.num_kfs + fits.astype(jnp.int32),
        ),
        jnp.where(fits, m.num_kfs, -1),
    )


def add_points(
    m: MapState,
    xyz: jax.Array,  # (P, 3)
    desc: jax.Array,  # (P, 256) int8
    octave: jax.Array,  # (P,)
    normal: jax.Array,  # (P, 3)
    valid: jax.Array,  # (P,) bool
) -> tuple[MapState, jax.Array]:
    """Append a fixed-size batch of points (masked rows are skipped).

    Valid rows are compacted to the front so capacity is not wasted on
    padding; returns (map, ids (P,)) with ids == -1 for invalid rows.
    """
    P = xyz.shape[0]
    Nmax = m.pt_xyz.shape[0]
    order = jnp.argsort(~valid)  # valid rows first, stable
    xyz, desc = xyz[order], desc[order]
    octave, normal, valid_s = octave[order], normal[order], valid[order]
    offsets = jnp.cumsum(valid_s.astype(jnp.int32)) - 1
    # Capacity guard: rows past Nmax are dropped, not clamped onto the last
    # real point.  cumsum ordering means exactly the first free slots fill.
    # Invalid/overflow rows park at index Nmax; mode="drop" skips them
    # (a parking slot INSIDE the array would collide with real writes).
    valid_s = valid_s & (m.num_pts + offsets < Nmax)
    ids = jnp.where(valid_s, m.num_pts + offsets, Nmax)
    new = m._replace(
        pt_xyz=m.pt_xyz.at[ids].set(xyz, mode="drop"),
        pt_desc=m.pt_desc.at[ids].set(desc, mode="drop"),
        pt_desc_acc=m.pt_desc_acc.at[ids].set(desc, mode="drop"),
        pt_octave=m.pt_octave.at[ids].set(octave, mode="drop"),
        pt_normal=m.pt_normal.at[ids].set(normal, mode="drop"),
        pt_valid=m.pt_valid.at[ids].set(True, mode="drop"),
        num_pts=m.num_pts + jnp.sum(valid_s.astype(jnp.int32)),
    )
    # Return ids in the caller's original row order.
    inv = jnp.argsort(order)
    ids_out = jnp.where(valid_s, ids, -1)[inv]
    return new, ids_out


def add_observations(
    m: MapState,
    kf_id: jax.Array,
    pt_ids: jax.Array,  # (P,) int32, -1 = skip
    uv: jax.Array,  # (P, 2)
    u_right: jax.Array,  # (P,)
    octave: jax.Array,  # (P,)
) -> MapState:
    """Append observation edges for one keyframe (masked-compacted).

    Drops rows past capacity and whole batches with kf_id < 0 (a dropped
    keyframe) instead of clamp-corrupting the last edge slot.
    """
    Emax = m.ob_kf.shape[0]
    valid = (pt_ids >= 0) & (kf_id >= 0)
    order = jnp.argsort(~valid)
    pt_s, uv_s = pt_ids[order], uv[order]
    ur_s, oct_s, val_s = u_right[order], octave[order], valid[order]
    offsets = jnp.cumsum(val_s.astype(jnp.int32)) - 1
    val_s = val_s & (m.num_obs + offsets < Emax)
    slots = jnp.where(val_s, m.num_obs + offsets, Emax)  # park out of range
    m = m._replace(
        ob_kf=m.ob_kf.at[slots].set(jnp.full_like(pt_s, kf_id), mode="drop"),
        ob_pt=m.ob_pt.at[slots].set(pt_s, mode="drop"),
        ob_uv=m.ob_uv.at[slots].set(uv_s, mode="drop"),
        ob_ur=m.ob_ur.at[slots].set(ur_s, mode="drop"),
        ob_octave=m.ob_octave.at[slots].set(oct_s, mode="drop"),
        ob_valid=m.ob_valid.at[slots].set(True, mode="drop"),
        num_obs=m.num_obs + jnp.sum(val_s.astype(jnp.int32)),
        pt_obs_count=m.pt_obs_count.at[
            jnp.where(val_s, pt_s, m.pt_xyz.shape[0])
        ].add(1, mode="drop"),
    )
    return m


# ---------------------------------------------------------------------------
# Store maintenance: compaction (reclaim slots of culled/fused entries) and
# host-side growth.  The reference's pointer map frees memory implicitly on
# erase (`Map::EraseKeyFrame`, `MapPoint` deletion); the SoA design reclaims
# explicitly so full-length sequences never exhaust capacity while most slots
# are dead.
# ---------------------------------------------------------------------------


@jax.jit
def compact_edges(m: MapState) -> MapState:
    """Pack live observation edges to the front of the edge store.

    Edges whose point or keyframe died (culling, fusion) are first
    invalidated, then all invalid slots move to the tail and `num_obs`
    resets to the live count.  Edge identity is positional only inside BA
    calls, never across them, so reordering between keyframes is safe.
    """
    alive = m.ob_valid & m.pt_valid[m.ob_pt] & m.kf_valid[m.ob_kf]
    order = jnp.argsort(~alive)  # stable: live edges keep relative order
    alive_s = alive[order]
    return m._replace(
        ob_kf=jnp.where(alive_s, m.ob_kf[order], 0),
        ob_pt=jnp.where(alive_s, m.ob_pt[order], 0),
        ob_uv=jnp.where(alive_s[:, None], m.ob_uv[order], 0.0),
        ob_ur=jnp.where(alive_s, m.ob_ur[order], -1.0),
        ob_octave=jnp.where(alive_s, m.ob_octave[order], 0),
        ob_valid=alive_s,
        num_obs=jnp.sum(alive.astype(jnp.int32)),
        pt_obs_count=jax.ops.segment_sum(
            alive.astype(jnp.int32), m.ob_pt, num_segments=m.pt_xyz.shape[0]
        ),
    )


@jax.jit
def compact_points(m: MapState) -> MapState:
    """Pack live points to the front; remap the edge store's point ids.

    Point ids are only referenced by the edge store and by per-frame match
    results (recomputed every frame), so compaction between a track step and
    the next is safe.  Must NOT be applied between tracking and keyframe
    insertion of the same frame (ids in the TrackResult would dangle) — the
    system calls it at frame start.
    """
    order = jnp.argsort(~m.pt_valid)  # live first, stable
    inv = jnp.argsort(order)  # old id -> new id
    valid_s = m.pt_valid[order]
    edge_alive = m.ob_valid & m.pt_valid[m.ob_pt]
    return m._replace(
        pt_xyz=jnp.where(valid_s[:, None], m.pt_xyz[order], 0.0),
        pt_desc=jnp.where(valid_s[:, None], m.pt_desc[order], 0),
        pt_desc_acc=jnp.where(valid_s[:, None], m.pt_desc_acc[order], 0),
        pt_octave=jnp.where(valid_s, m.pt_octave[order], 0),
        pt_normal=jnp.where(valid_s[:, None], m.pt_normal[order], 0.0),
        pt_obs_count=jnp.where(valid_s, m.pt_obs_count[order], 0),
        pt_valid=valid_s,
        num_pts=jnp.sum(m.pt_valid.astype(jnp.int32)),
        ob_pt=jnp.where(edge_alive, inv[m.ob_pt], 0),
        ob_valid=edge_alive,
    )


def grow_map(
    m: MapState,
    kmax: int | None = None,
    nmax: int | None = None,
    emax: int | None = None,
) -> MapState:
    """Host-side capacity growth: pad every store to the new cap.

    Ids (keyframe, point, edge slot) are all preserved, so loop snapshots,
    anchors, and in-flight match results stay valid.  Growth changes jitted
    stage signatures — call in power-of-2 steps so recompiles stay rare.
    """
    k0, n0, e0 = m.capacity
    tgt = empty_map(max(kmax or k0, k0), max(nmax or n0, n0), max(emax or e0, e0))
    rep = {}
    for name in MapState._fields:
        src, dst = getattr(m, name), getattr(tgt, name)
        if src.ndim == 0:
            rep[name] = src
        else:
            rep[name] = dst.at[tuple(slice(0, s) for s in src.shape)].set(src)
    return MapState(**rep)
