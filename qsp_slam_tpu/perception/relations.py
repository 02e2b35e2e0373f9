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
