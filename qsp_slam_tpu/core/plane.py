"""Plane algebra: 4-vector planes (n, d) with |n| = 1, point distances and
transforms.

Parity: `g2o::plane` (`include/core/Plane.h`) — planes stored as pi = (a,b,c,d)
with ax + by + cz + d = 0; transform by camera pose; distance and angle
queries used by the Manhattan extractor and the relation extractor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(pi: jax.Array) -> jax.Array:
    """Scale so the normal part has unit norm. (..., 4) -> (..., 4)."""
    n = jnp.linalg.norm(pi[..., :3], axis=-1, keepdims=True)
    return pi / jnp.where(n == 0.0, 1.0, n)


def from_normal_point(normal: jax.Array, point: jax.Array) -> jax.Array:
    """Plane through `point` with normal `normal`. (...,3),(...,3) -> (...,4)."""
    n = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    d = -jnp.sum(n * point, axis=-1, keepdims=True)
    return jnp.concatenate([n, d], axis=-1)


def point_distance(pi: jax.Array, pts: jax.Array) -> jax.Array:
    """Signed distance of points (..., N, 3) to plane (..., 4) -> (..., N)."""
    pi = normalize(pi)
    return jnp.einsum("...ni,...i->...n", pts, pi[..., :3]) + pi[..., 3:4]


def transform(pi: jax.Array, T: jax.Array) -> jax.Array:
    """Transform plane by T (points map as x' = T x): pi' = T^-T pi.

    pi: (..., 4), T: (..., 4, 4) -> (..., 4).
    """
    Tinv_T = jnp.swapaxes(jnp.linalg.inv(T), -1, -2)
    return normalize(jnp.einsum("...ij,...j->...i", Tinv_T, pi))


def angle_between(pi_a: jax.Array, pi_b: jax.Array) -> jax.Array:
    """Unsigned angle (radians, in [0, pi/2]) between plane normals."""
    na = pi_a[..., :3] / jnp.linalg.norm(pi_a[..., :3], axis=-1, keepdims=True)
    nb = pi_b[..., :3] / jnp.linalg.norm(pi_b[..., :3], axis=-1, keepdims=True)
    c = jnp.abs(jnp.sum(na * nb, axis=-1))
    return jnp.arccos(jnp.clip(c, 0.0, 1.0))
