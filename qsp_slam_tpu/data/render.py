"""Synthetic RGB-D sequence renderer: a textured box room, raycast per pixel.

Stands in for the TUM RGB-D datasets (`src/tum_rgbd/io.h`) in tests and
benches: exact ground-truth poses and depth with realistic image structure
(band-passed noise textures -> full-entropy ORB descriptors).  The whole
render is one jitted program: pixel rays x 6 planes, nearest positive hit,
bilinear texture lookup.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics


class BoxRoom(NamedTuple):
    """6 axis-aligned planes enclosing [-hx,hx] x [-hy,hy] x [-hz,hz]."""

    normals: jax.Array  # (6, 3) inward normals
    offsets: jax.Array  # (6,)   n . p + d = 0
    axes_u: jax.Array  # (6, 3) plane-local u axis
    axes_v: jax.Array  # (6, 3) plane-local v axis
    textures: jax.Array  # (6, T, T) f32 grayscale


def make_room(
    half_extent=(4.0, 2.2, 4.0), tex_size: int = 512, seed: int = 0
) -> BoxRoom:
    hx, hy, hz = half_extent
    rng = np.random.default_rng(seed)

    def band_noise():
        n = rng.normal(size=(tex_size, tex_size)).astype(np.float32)
        # cheap band-pass via FFT masking (scipy-free)
        F = np.fft.rfft2(n)
        fy = np.fft.fftfreq(tex_size)[:, None]
        fx = np.fft.rfftfreq(tex_size)[None, :]
        r = np.sqrt(fx * fx + fy * fy)
        F *= np.exp(-((r - 0.08) ** 2) / (2 * 0.05**2))
        out = np.fft.irfft2(F, s=(tex_size, tex_size))
        out = (out - out.min()) / (out.max() - out.min())
        return (40.0 + 180.0 * out).astype(np.float32)

    # plane list: +x, -x, +y, -y, +z, -z walls (inward normals)
    normals = np.array(
        [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
        np.float32,
    )
    offsets = np.array([hx, hx, hy, hy, hz, hz], np.float32)
    axes_u = np.array(
        [[0, 0, 1], [0, 0, 1], [1, 0, 0], [1, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32
    )
    axes_v = np.array(
        [[0, 1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1], [0, 1, 0], [0, 1, 0]], np.float32
    )
    tex = np.stack([band_noise() for _ in range(6)])
    return BoxRoom(
        normals=jnp.asarray(normals),
        offsets=jnp.asarray(offsets),
        axes_u=jnp.asarray(axes_u),
        axes_v=jnp.asarray(axes_v),
        textures=jnp.asarray(tex),
    )


@partial(jax.jit, static_argnames=("height", "width"))
def render_frame(
    room: BoxRoom,
    T_cw: jax.Array,
    intr: Intrinsics,
    height: int = 480,
    width: int = 640,
) -> tuple[jax.Array, jax.Array]:
    """Render (gray (H, W), depth (H, W)) for camera pose T_cw (world->cam)."""
    T_wc = lie.inv_se3(T_cw)
    R_wc = T_wc[:3, :3]
    c_w = T_wc[:3, 3]

    yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    rays_c = jnp.stack(
        [(xx - intr.cx) / intr.fx, (yy - intr.cy) / intr.fy, jnp.ones_like(xx)],
        axis=-1,
    )  # (H, W, 3), z = 1 so hit parameter t == camera depth
    rays_w = jnp.einsum("ij,hwj->hwi", R_wc, rays_c)

    n = room.normals  # (6, 3)
    denom = jnp.einsum("pi,hwi->hwp", n, rays_w)
    numer = -(jnp.einsum("pi,i->p", n, c_w) + room.offsets)  # (6,)
    t = numer[None, None, :] / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    t = jnp.where((t > 0.05) & (denom < 0.0), t, jnp.inf)  # facing, in front
    best = jnp.argmin(t, axis=-1)  # (H, W)
    depth = jnp.take_along_axis(t, best[..., None], axis=-1)[..., 0]
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)

    hit_w = c_w + rays_w * depth[..., None]  # (H, W, 3)
    au = room.axes_u[best]  # (H, W, 3)
    av = room.axes_v[best]
    T = room.textures.shape[-1]
    scale = T / 10.0  # texture meters->texels (10 m wraps once)
    u = jnp.einsum("hwi,hwi->hw", hit_w, au) * scale
    v = jnp.einsum("hwi,hwi->hw", hit_w, av) * scale
    u = jnp.mod(u, T - 1.0)
    v = jnp.mod(v, T - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu, fv = u - u0, v - v0

    def samp(vi, ui):
        return room.textures[best, vi, ui]

    g = (
        samp(v0, u0) * (1 - fu) * (1 - fv)
        + samp(v0, u0 + 1) * fu * (1 - fv)
        + samp(v0 + 1, u0) * (1 - fu) * fv
        + samp(v0 + 1, u0 + 1) * fu * fv
    )
    return g, depth


def orbit_trajectory(num_frames: int, step: float = 0.02) -> np.ndarray:
    """Smooth camera arc inside the room with CONSTANT per-frame motion.

    `step` is the arc parameter increment per frame (radians); at the default
    the inter-frame image motion is ~10 px at 4 m depth — the 30 fps handheld
    regime the tracking search windows are tuned for (as in TUM sequences).
    Returns T_cw stack (F, 4, 4), float32.
    """
    poses = []
    for i in range(num_frames):
        th = i * step
        cpos = np.array(
            [2.2 * np.sin(th), 0.25 * np.sin(2 * th), 1.1 * (np.cos(th) - 1.0)]
        )
        yaw = 0.54 * np.sin(th)
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = cpos
        poses.append(np.linalg.inv(T_wc))
    return np.stack(poses).astype(np.float32)
