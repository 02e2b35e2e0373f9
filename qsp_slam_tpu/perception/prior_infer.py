"""Semantic-prior ellipsoid inference — the monocular object path.

Parity: `PriorInfer` (`include/core/PriorInfer.h:40-89`,
`src/core/PriorInfer.cpp`): with no depth, an object's ellipsoid is inferred
from its 2D bbox + the ground plane + per-label aspect-ratio priors
(d = a/c, e = b/c loaded from config — `PriFactor`), then refined against
the bbox-projection factor with gravity/support/aspect priors (`EdgePri`).
Used by `GetObjectDetectionsMono` (`src/Tracking_util.cc:213`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie, quadric
from ..core.camera import Intrinsics, pixel_rays
from ..opt.quadric_factors import (
    ObjectObservations,
    bbox_residual,
    border_edge_mask,
    gravity_residual,
    support_residual,
)


class AspectPriors(NamedTuple):
    """Per-label shape priors: half-axis ratios a/c and b/c ('d'/'e' in the
    reference's `PriFactor` tables)."""

    d: jax.Array  # (L,)
    e: jax.Array  # (L,)
    weight: jax.Array  # (L,) prior strength (0 disables)


def default_priors(num_labels: int = 16) -> AspectPriors:
    return AspectPriors(
        d=jnp.ones(num_labels),
        e=jnp.ones(num_labels),
        weight=jnp.full(num_labels, 1.0),
    )


@partial(jax.jit, static_argnames=())
def generate_init_guess(
    bbox: jax.Array,  # (4,) detection bbox
    ground_plane_cam: jax.Array,  # (4,)
    intr: Intrinsics,
    aspect_d: jax.Array = 1.0,
    aspect_e: jax.Array = 1.0,
) -> jax.Array:
    """Monocular bbox-only ellipsoid init (`PriorInfer::GenerateInitGuess`).

    Geometry: the ray through the bbox's bottom-center pierces the ground
    plane at the object's footprint; the bbox height at that distance sets
    the vertical size; aspect priors set the horizontal axes.  Returns the
    camera-frame minimal 9-vector.
    """
    n = ground_plane_cam[:3]
    d0 = ground_plane_cam[3]
    up = n / jnp.linalg.norm(n)

    bc = jnp.stack([(bbox[0] + bbox[2]) * 0.5, bbox[3]])  # bottom-center px
    ray = pixel_rays(bc, intr)  # (3,)
    # ground intersection: t such that n.(t ray) + d0 = 0
    denom = jnp.dot(n, ray)
    t = -d0 / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    t = jnp.clip(t, 0.3, 50.0)
    foot = ray * t  # camera-frame ground contact

    # Vertical size from bbox pixel height at that depth.
    h_px = jnp.maximum(bbox[3] - bbox[1], 4.0)
    depth = foot[2]
    height = h_px * depth / intr.fy
    half_c = jnp.maximum(height * 0.5, 0.03)
    half_a = half_c * aspect_d
    half_b = half_c * aspect_e

    center = foot + up * half_c
    # Object frame: z = up; yaw unknown -> x axis toward the camera's right
    # projected to the ground.
    a_ref = jnp.where(
        jnp.abs(up[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
    )
    ex = a_ref - up * jnp.dot(a_ref, up)
    ex = ex / jnp.linalg.norm(ex)
    ey = jnp.cross(up, ex)
    R = jnp.stack([ex, ey, up], axis=1)
    rpy = quadric.rotmat_to_euler(R)
    return jnp.concatenate([center, rpy, jnp.stack([half_a, half_b, half_c])])


@partial(jax.jit, static_argnames=("iters", "img_wh"))
def refine_with_priors(
    e_init: jax.Array,  # (9,) world frame
    obs: ObjectObservations,
    K: jax.Array,
    ground_plane_w: jax.Array,
    aspect_d: jax.Array,
    aspect_e: jax.Array,
    iters: int = 12,
    w_bbox: float = 1.0,
    w_gravity: float = 20.0,
    w_support: float = 20.0,
    w_aspect: float = 10.0,
    bbox_sigma: float = 10.0,
    img_wh: tuple | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Multi-view bbox refinement with gravity + support + aspect priors.

    The aspect residual is the reference's 2-dof `EdgePri`
    (`PriorInfer.h:61-75`): log-ratio errors on (a/c, b/c).  The plane
    priors are deliberately SOFTER than the RGB-D path's: the mono ground
    comes from a sparse gauge-free map and is the least reliable signal, so
    multi-view bbox parallax must be able to override it.
    """

    def residual_vec(e):
        rb = jax.vmap(lambda T, b: bbox_residual(e, T, K, b))(obs.Tcw, obs.bbox)
        if img_wh is not None:
            rb = jnp.where(border_edge_mask(obs.bbox, img_wh), 0.0, rb)
        w = jnp.sqrt(jnp.maximum(obs.weight, 0.0))[:, None] * (w_bbox / bbox_sigma)
        rb = (rb * w).reshape(-1)
        rg = gravity_residual(e, -ground_plane_w[:3]) * w_gravity
        rs = support_residual(e, ground_plane_w) * w_support
        ra = (
            jnp.stack(
                [
                    jnp.log(e[6] / e[8]) - jnp.log(aspect_d),
                    jnp.log(e[7] / e[8]) - jnp.log(aspect_e),
                ]
            )
            * w_aspect
        )
        return jnp.concatenate([rb, rg, rs, ra])

    def cost(e):
        r = residual_vec(e)
        return jnp.sum(r * r)

    def body(carry, _):
        e, lmbda, c = carry
        r = residual_vec(e)
        J = jax.jacfwd(residual_vec)(e)
        H = J.T @ J
        g = -J.T @ r
        eye = jnp.eye(9, dtype=e.dtype)
        delta = jnp.linalg.solve(H + lmbda * H * eye + 1e-8 * eye, g)
        e_try = e + delta
        e_try = e_try.at[6:9].set(jnp.clip(e_try[6:9], 0.02, 5.0))
        c_try = cost(e_try)
        accept = c_try < c
        return (
            jnp.where(accept, e_try, e),
            jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
            jnp.where(accept, c_try, c),
        ), None

    init = (e_init, jnp.asarray(1e-2, e_init.dtype), cost(e_init))
    (e, _, c), _ = jax.lax.scan(body, init, None, length=iters)
    return e, c
