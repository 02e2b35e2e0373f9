"""Object-plane relation typing: supporting / leaning.

Parity: `RelationExtractor::ExtractSupporttingRelations`
(`src/Relationship/Relationship.h:49`, `.cpp`) — each (object, plane) pair is
typed SUPPORT (=1: the object's bottom rests on a horizontal plane) or
LEAN_ON (=2: an object side touches a vertical plane); relations feed the
supporting-plane refinement of the extractor
(`Tracking::RefineObjectsWithRelations`, `src/Tracking_util.cc:1116`).

Fully batched over the (O, P) pair grid.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import quadric

NONE = 0
SUPPORT = 1
LEAN_ON = 2


class Relations(NamedTuple):
    kind: jax.Array  # (O, P) int32 in {NONE, SUPPORT, LEAN_ON}
    distance: jax.Array  # (O, P) contact distance


@partial(jax.jit, static_argnames=())
def extract_relations(
    ellipsoids: jax.Array,  # (O, 9) world frame
    obj_valid: jax.Array,  # (O,)
    planes: jax.Array,  # (P, 4) world frame
    plane_valid: jax.Array,  # (P,)
    up_w: jax.Array,  # (3,) world up direction
    contact_tol: float = 0.08,
    horiz_tol: float = 0.15,
) -> Relations:
    up = up_w / jnp.linalg.norm(up_w)
    R = quadric.euler_to_rotmat(ellipsoids[:, 3:6])  # (O, 3, 3)
    centers = ellipsoids[:, 0:3]
    half = ellipsoids[:, 6:9]
    bottom = centers - R[:, :, 2] * half[:, 2:3]  # (O, 3)

    n = planes[:, :3] / jnp.maximum(
        jnp.linalg.norm(planes[:, :3], axis=-1, keepdims=True), 1e-9
    )
    d = planes[:, 3] / jnp.maximum(jnp.linalg.norm(planes[:, :3], axis=-1), 1e-9)
    horizontal = jnp.abs(n @ up) > 1.0 - horiz_tol  # (P,)
    vertical = jnp.abs(n @ up) < horiz_tol

    # SUPPORT: object's bottom point lies on a horizontal plane.
    bot_dist = jnp.abs(jnp.einsum("oi,pi->op", bottom, n) + d[None, :])
    support = horizontal[None, :] & (bot_dist < contact_tol)

    # LEAN_ON: the ellipsoid surface touches a vertical plane — center
    # distance within the ellipsoid's support radius along the normal.
    c_dist = jnp.abs(jnp.einsum("oi,pi->op", centers, n) + d[None, :])
    # support radius along plane normal: |n^T R diag(half)| norm
    Rn = jnp.einsum("oji,pj->opi", R, n)  # normal in object frame
    radius = jnp.linalg.norm(Rn * half[:, None, :], axis=-1)  # (O, P)
    lean = vertical[None, :] & (jnp.abs(c_dist - radius) < contact_tol)

    gate = obj_valid[:, None] & plane_valid[None, :]
    kind = jnp.where(
        gate & support, SUPPORT, jnp.where(gate & lean, LEAN_ON, NONE)
    )
    dist = jnp.where(support, bot_dist, jnp.abs(c_dist - radius))
    return Relations(kind=kind, distance=dist)


@jax.jit
def support_planes_for_objects(
    rel: Relations,
    planes_w: jax.Array,  # (P, 4) world frame
    plane_valid: jax.Array,  # (P,)
    ground_w: jax.Array,  # (4,) fallback
) -> jax.Array:
    """Per-object supporting plane from the relation grid (O, 4).

    Objects with a SUPPORT relation take their closest supporting plane
    (normal oriented up); others keep the ground plane — this feeds the
    support prior of `refine_objects` (the `RefineObjectsWithRelations`
    role, `src/Tracking_util.cc:1116`)."""
    up = ground_w[:3] / jnp.linalg.norm(ground_w[:3])
    nrm = jnp.maximum(jnp.linalg.norm(planes_w[:, :3], axis=-1, keepdims=True), 1e-9)
    n = planes_w[:, :3] / nrm
    d = planes_w[:, 3] / nrm[:, 0]
    s = jnp.sign(jnp.where(n @ up == 0.0, 1.0, n @ up))
    planes_up = jnp.concatenate([n * s[:, None], (d * s)[:, None]], axis=-1)

    dist = jnp.where(
        (rel.kind == SUPPORT) & plane_valid[None, :], rel.distance, jnp.inf
    )  # (O, P)
    best = jnp.argmin(dist, axis=1)
    has = jnp.isfinite(jnp.min(dist, axis=1))
    return jnp.where(has[:, None], planes_up[best], ground_w[None])


@jax.jit
def select_support_plane(
    pts: jax.Array,  # (N, 3) candidate object points (camera frame)
    ok: jax.Array,  # (N,)
    planes_cam: jax.Array,  # (P, 4) Manhattan set, camera frame
    plane_valid: jax.Array,  # (P,)
    ground_cam: jax.Array,  # (4,) fallback ground plane
    horiz_tol: float = 0.15,
    below_tol: float = 0.08,
) -> jax.Array:
    """Pick the horizontal plane that actually supports a point set.

    Parity: `RefineObjectsWithRelations` (`src/Tracking_util.cc:1116`) —
    an object standing on a TABLE must be completed down to the table top,
    not the floor; the reference re-extracts with the relation's supporting
    plane.  Selection rule: among horizontal planes lying (just) below the
    points, take the closest one; fall back to the ground plane.
    Returns a (4,) plane whose normal points up (away from the plane
    toward the object).
    """
    up = ground_cam[:3] / jnp.linalg.norm(ground_cam[:3])
    nrm = jnp.maximum(jnp.linalg.norm(planes_cam[:, :3], axis=-1, keepdims=True), 1e-9)
    n = planes_cam[:, :3] / nrm
    d = planes_cam[:, 3] / nrm[:, 0]
    # Orient every normal upward so "above the plane" is positive.
    s = jnp.sign(jnp.where(n @ up == 0.0, 1.0, n @ up))
    n = n * s[:, None]
    d = d * s
    horizontal = (n @ up) > 1.0 - horiz_tol

    # 5th-percentile height of the object points above each plane.
    h = pts @ n.T + d[None, :]  # (N, P)
    big = jnp.sort(jnp.where(ok[:, None], h, jnp.inf), axis=0)
    cnt = jnp.maximum(jnp.sum(ok), 1)
    low = big[jnp.clip((cnt * 5) // 100, 0, pts.shape[0] - 1)]  # (P,)

    cand = plane_valid & horizontal & (low > -below_tol)
    score = jnp.where(cand, low, jnp.inf)
    best = jnp.argmin(score)
    use = cand[best] & jnp.isfinite(score[best])
    pick = jnp.concatenate([n[best], d[best][None]])
    g = jnp.concatenate(
        [ground_cam[:3] / jnp.linalg.norm(ground_cam[:3]),
         (ground_cam[3] / jnp.linalg.norm(ground_cam[:3]))[None]]
    )
    return jnp.where(use, pick, g)
