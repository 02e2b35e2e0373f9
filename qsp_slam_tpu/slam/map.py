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
    """Append a keyframe; returns (map, kf_id)."""
    kid = m.num_kfs
    return (
        m._replace(
            kf_Tcw=m.kf_Tcw.at[kid].set(Tcw),
            kf_valid=m.kf_valid.at[kid].set(True),
            num_kfs=kid + 1,
        ),
        kid,
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
    ids = jnp.where(valid_s, m.num_pts + offsets, Nmax - 1)  # park invalid writes
    new = m._replace(
        pt_xyz=m.pt_xyz.at[ids].set(jnp.where(valid_s[:, None], xyz, m.pt_xyz[ids])),
        pt_desc=m.pt_desc.at[ids].set(
            jnp.where(valid_s[:, None], desc, m.pt_desc[ids])
        ),
        pt_desc_acc=m.pt_desc_acc.at[ids].set(
            jnp.where(valid_s[:, None], desc, m.pt_desc_acc[ids])
        ),
        pt_octave=m.pt_octave.at[ids].set(jnp.where(valid_s, octave, m.pt_octave[ids])),
        pt_normal=m.pt_normal.at[ids].set(
            jnp.where(valid_s[:, None], normal, m.pt_normal[ids])
        ),
        pt_valid=m.pt_valid.at[ids].set(m.pt_valid[ids] | valid_s),
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
    """Append observation edges for one keyframe (masked-compacted)."""
    Emax = m.ob_kf.shape[0]
    valid = pt_ids >= 0
    order = jnp.argsort(~valid)
    pt_s, uv_s = pt_ids[order], uv[order]
    ur_s, oct_s, val_s = u_right[order], octave[order], valid[order]
    offsets = jnp.cumsum(val_s.astype(jnp.int32)) - 1
    slots = jnp.where(val_s, m.num_obs + offsets, Emax - 1)
    sel = lambda new, old: jnp.where(val_s, new, old)
    m = m._replace(
        ob_kf=m.ob_kf.at[slots].set(sel(jnp.full_like(pt_s, kf_id), m.ob_kf[slots])),
        ob_pt=m.ob_pt.at[slots].set(sel(pt_s, m.ob_pt[slots])),
        ob_uv=m.ob_uv.at[slots].set(
            jnp.where(val_s[:, None], uv_s, m.ob_uv[slots])
        ),
        ob_ur=m.ob_ur.at[slots].set(sel(ur_s, m.ob_ur[slots])),
        ob_octave=m.ob_octave.at[slots].set(sel(oct_s, m.ob_octave[slots])),
        ob_valid=m.ob_valid.at[slots].set(m.ob_valid[slots] | val_s),
        num_obs=m.num_obs + jnp.sum(val_s.astype(jnp.int32)),
        pt_obs_count=m.pt_obs_count.at[pt_s].add(val_s.astype(jnp.int32)),
    )
    return m
