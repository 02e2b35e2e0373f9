"""Pinhole camera model and batched projection utilities.

Parity: covers the projection semantics used throughout the reference
(`src/Frame.cc` keypoint unprojection, `include/core/Ellipsoid.h:118-146`
projection matrices P = K [R|t]).  All functions broadcast over leading batch
dimensions and are jit/vmap-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole intrinsics. All fields are scalars (or broadcastable arrays)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(jnp.asarray(self.fx))
        o = jnp.ones_like(jnp.asarray(self.fx))
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    @staticmethod
    def from_K(K: jax.Array) -> "Intrinsics":
        return Intrinsics(K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2])


def project(pts_cam: jax.Array, intr: Intrinsics) -> tuple[jax.Array, jax.Array]:
    """Project camera-frame points (..., 3) -> pixel coords (..., 2), depth (...).

    Depth <= 0 points still produce finite (garbage) pixels; callers mask on the
    returned depth.
    """
    z = pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = intr.fx * pts_cam[..., 0] / z_safe + intr.cx
    v = intr.fy * pts_cam[..., 1] / z_safe + intr.cy
    return jnp.stack([u, v], axis=-1), z


def backproject(uv: jax.Array, depth: jax.Array, intr: Intrinsics) -> jax.Array:
    """Unproject pixels (..., 2) at depth (...) to camera-frame points (..., 3)."""
    x = (uv[..., 0] - intr.cx) / intr.fx * depth
    y = (uv[..., 1] - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def pixel_rays(uv: jax.Array, intr: Intrinsics) -> jax.Array:
    """Unit-depth rays K^-1 [u, v, 1] for pixels (..., 2) -> (..., 3)."""
    x = (uv[..., 0] - intr.cx) / intr.fx
    y = (uv[..., 1] - intr.cy) / intr.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def projection_matrix(T_cw: jax.Array, intr: Intrinsics) -> jax.Array:
    """P = K [R|t] from a world->camera transform (..., 4, 4) -> (..., 3, 4).

    Parity: `g2o::ellipsoid::generateProjectionMatrix`
    (`include/core/Ellipsoid.h:126`).
    """
    return jnp.einsum("...ij,...jk->...ik", intr.K, T_cw[..., :3, :4])


def in_image(uv: jax.Array, width: int, height: int, border: int = 0) -> jax.Array:
    """Boolean mask for pixels inside the image bounds (exclusive of border)."""
    u, v = uv[..., 0], uv[..., 1]
    return (u >= border) & (u < width - border) & (v >= border) & (v < height - border)
