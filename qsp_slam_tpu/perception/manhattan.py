"""Manhattan-frame dominant-plane tracking.

Parity: `PlaneExtractorManhattan` (`src/plane/PlaneExtractorManhattan.h:11-45`)
— per-frame plane extraction keeps planes perpendicular/parallel to the
ground; recurring planes accumulate votes into a dominant set (target 5)
used by the relation extractor and structural refinement.

TPU-native: multi-plane extraction = sequential masked RANSAC rounds (fixed
count) on the same subsampled cloud; the cross-frame tracker is a small
fixed-capacity table matched by normal angle + offset distance.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import plane as plane_mod
from .groundplane import ransac_plane


class PlaneSet(NamedTuple):
    planes: jax.Array  # (P, 4) world frame
    votes: jax.Array  # (P,) int32
    valid: jax.Array  # (P,) bool


def empty_plane_set(pmax: int = 8) -> PlaneSet:
    return PlaneSet(
        planes=jnp.zeros((pmax, 4), jnp.float32),
        votes=jnp.zeros(pmax, jnp.int32),
        valid=jnp.zeros(pmax, bool),
    )


@partial(jax.jit, static_argnames=("rounds",))
def extract_manhattan_planes(
    pts: jax.Array,  # (M, 3) camera-frame cloud
    valid: jax.Array,
    ground_cam: jax.Array,  # (4,) ground plane, camera frame
    key: jax.Array,
    rounds: int = 3,
    inlier_th: float = 0.03,
    min_inliers: int = 150,
    angle_tol: float = 0.15,
):
    """Fixed number of masked RANSAC rounds; keeps planes ⊥ or ∥ to ground.

    Returns (planes (rounds, 4), ok (rounds,)).
    """
    up = ground_cam[:3] / jnp.linalg.norm(ground_cam[:3])
    planes = []
    oks = []
    remaining = valid
    for r in range(rounds):
        key, k = jax.random.split(key)
        pi, inl = ransac_plane(pts, remaining, k, inlier_th=inlier_th)
        align = jnp.abs(jnp.dot(pi[:3], up))
        manhattan = (align > 1.0 - angle_tol) | (align < angle_tol)
        ok = (inl >= min_inliers) & manhattan
        planes.append(pi)
        oks.append(ok)
        dist = jnp.abs(pts @ pi[:3] + pi[3])
        remaining = remaining & (dist > inlier_th)
    return jnp.stack(planes), jnp.stack(oks)


@jax.jit
def update_plane_set(
    ps: PlaneSet,
    new_planes_w: jax.Array,  # (R, 4) world frame
    new_ok: jax.Array,  # (R,)
    angle_tol: float = 0.15,
    dist_tol: float = 0.15,
) -> PlaneSet:
    """Vote-merge new planes into the dominant set (or claim empty slots)."""
    P = ps.planes.shape[0]

    def fold(r, ps):
        pi = plane_mod.normalize(new_planes_w[r])
        cosang = jnp.abs(jnp.einsum("pi,i->p", ps.planes[:, :3], pi[:3]))
        doff = jnp.abs(jnp.abs(ps.planes[:, 3]) - jnp.abs(pi[3]))
        same = ps.valid & (cosang > 1 - angle_tol) & (doff < dist_tol)
        has_match = same.any()
        match = jnp.argmax(same)
        free = jnp.argmin(ps.valid)  # first empty slot (or 0 if full)
        can_add = ~ps.valid.all()

        def do_match(ps):
            return ps._replace(votes=ps.votes.at[match].add(1))

        def do_add(ps):
            return jax.lax.cond(
                can_add,
                lambda ps: ps._replace(
                    planes=ps.planes.at[free].set(pi),
                    votes=ps.votes.at[free].set(1),
                    valid=ps.valid.at[free].set(True),
                ),
                lambda ps: ps,
                ps,
            )

        return jax.lax.cond(
            new_ok[r], lambda ps: jax.lax.cond(has_match, do_match, do_add, ps),
            lambda ps: ps, ps,
        )

    return jax.lax.fori_loop(0, new_planes_w.shape[0], fold, ps)


def dominant_planes(ps: PlaneSet, min_votes: int = 3):
    """Host helper: the confirmed Manhattan structure."""
    import numpy as np

    keep = np.asarray(ps.valid) & (np.asarray(ps.votes) >= min_votes)
    return np.asarray(ps.planes)[keep]
