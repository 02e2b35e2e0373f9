"""Quadric (ellipsoid) factors and per-object multi-view refinement.

Parity: the quadric g2o types of the reference —
`EdgeSE3EllipsoidProj` (project dual quadric -> conic -> bbox 4-vector,
`include/core/BasicEllipsoidEdges.h:118-135`), the gravity-plane prior
(`EdgeEllipsoidGravityPlanePrior`, `:138-146`), and the per-object
optimization loops of `src/pca/EllipsoidExtractorEdges.cpp` / PriorInfer.

TPU-native shape: every object's refinement is an INDEPENDENT small LM
problem over its 9-vector given fixed keyframe poses, so the whole object
table refines as one vmap over objects with capacity-padded observation
lists.  Jacobians come from `jax.jacfwd` — the residual is a handful of
flops, so autodiff is cheaper than hand-derivation and exactly matches the
projection math in `core.quadric`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import quadric


class ObjectObservations(NamedTuple):
    """Padded per-object observation list (one object's view history).

    Leading axis = observation slot (max capacity per object).
    """

    Tcw: jax.Array  # (M, 4, 4) keyframe poses (fixed)
    bbox: jax.Array  # (M, 4) detected bboxes
    weight: jax.Array  # (M,) detection confidence (0 = empty slot)


def bbox_residual(e: jax.Array, Tcw: jax.Array, K: jax.Array, bbox: jax.Array):
    """4-vector bbox-projection residual (EdgeSE3EllipsoidProj error)."""
    return quadric.project_bbox(e, Tcw, K) - bbox


def border_edge_mask(bbox: jax.Array, img_wh: tuple, margin: float = 2.0):
    """(..., 4) bool — True where a detected bbox edge hugs the image border.

    A border-clamped edge is a truncation artifact, not an object boundary;
    using it in the bbox residual drags the ellipsoid toward the clipped
    side (the reference skips border detections via its `CalibBoundary`/
    border checks in `Tracking_util.cc`).  Shape matches bbox[..., 4] with
    edge order (xmin, ymin, xmax, ymax).
    """
    W, H = img_wh
    return jnp.stack(
        [
            bbox[..., 0] <= margin,
            bbox[..., 1] <= margin,
            bbox[..., 2] >= W - 1 - margin,
            bbox[..., 3] >= H - 1 - margin,
        ],
        axis=-1,
    )


def gravity_residual(e: jax.Array, ground_normal_w: jax.Array) -> jax.Array:
    """2-vector residual: object z-axis alignment with the world up vector."""
    R = quadric.euler_to_rotmat(e[3:6])
    z_axis = R[:, 2]
    up = ground_normal_w / jnp.linalg.norm(ground_normal_w)
    # Components of the object z-axis orthogonal to up (0 when aligned).
    a = jnp.where(
        jnp.abs(up[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
    )
    b1 = a - up * jnp.dot(a, up)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(up, b1)
    return jnp.stack([jnp.dot(z_axis, b1), jnp.dot(z_axis, b2)])


def support_residual(e: jax.Array, ground_plane_w: jax.Array) -> jax.Array:
    """1-vector residual: object bottom touching the supporting plane.

    Bottom = center - halfz * z_axis; residual = its signed plane distance.
    (Parity: the supporting-plane constraint of
    `RefineObjectsWithRelations`, `src/Tracking_util.cc:1116`.)
    """
    R = quadric.euler_to_rotmat(e[3:6])
    bottom = e[0:3] - R[:, 2] * e[8]
    n = ground_plane_w[:3]
    nn = jnp.linalg.norm(n)
    return jnp.atleast_1d((jnp.dot(bottom, n) + ground_plane_w[3]) / nn)


@partial(jax.jit, static_argnames=("iters", "img_wh"))
def refine_object(
    e_init: jax.Array,  # (9,)
    obs: ObjectObservations,
    K: jax.Array,  # (3, 3) intrinsics
    ground_plane_w: jax.Array,  # (4,)
    iters: int = 10,
    w_bbox: float = 1.0,
    w_gravity: float = 100.0,
    w_support: float = 100.0,
    bbox_sigma: float = 10.0,
    img_wh: tuple | None = None,
) -> tuple[jax.Array, jax.Array]:
    """LM refinement of one ellipsoid against its bbox observation history
    plus gravity + support priors.  Returns (e_refined, final_cost).

    vmap over the leading axis of (e_init, obs) to refine the whole object
    table at once.  `img_wh` masks border-clamped bbox edges out of the
    residual (see `border_edge_mask`).
    """

    def residual_vec(e):
        rb = jax.vmap(lambda T, b: bbox_residual(e, T, K, b))(obs.Tcw, obs.bbox)
        if img_wh is not None:
            rb = jnp.where(border_edge_mask(obs.bbox, img_wh), 0.0, rb)
        w = jnp.sqrt(jnp.maximum(obs.weight, 0.0))[:, None] * (w_bbox / bbox_sigma)
        rb = (rb * w).reshape(-1)
        rg = gravity_residual(e, -ground_plane_w[:3]) * w_gravity
        rs = support_residual(e, ground_plane_w) * w_support
        return jnp.concatenate([rb, rg, rs])

    def cost(e):
        r = residual_vec(e)
        return jnp.sum(r * r)

    def body(carry, _):
        e, lmbda, c = carry
        r = residual_vec(e)
        J = jax.jacfwd(residual_vec)(e)  # (R, 9)
        H = J.T @ J
        g = -J.T @ r
        eye = jnp.eye(9, dtype=e.dtype)
        H_d = H + lmbda * H * eye + 1e-8 * eye
        delta = jnp.linalg.solve(H_d, g)
        e_try = e + delta
        e_try = e_try.at[6:9].set(jnp.clip(e_try[6:9], 0.02, 5.0))
        c_try = cost(e_try)
        accept = c_try < c
        return (
            jnp.where(accept, e_try, e),
            jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
            jnp.where(accept, c_try, c),
        ), None

    init = (e_init, jnp.asarray(1e-3, e_init.dtype), cost(e_init))
    (e, _, c), _ = jax.lax.scan(body, init, None, length=iters)
    return e, c
