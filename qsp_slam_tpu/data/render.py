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
    # Texture period in meters (the full T-texel image wraps once per
    # period).  Must keep texels at >= a pixel for the viewing distances of
    # the scene: sub-pixel texels alias into per-frame shimmering noise that
    # no descriptor can match across frames (a 10 m period is right for
    # room-scale scenes at 2-4 m; driving scenes at 10-40 m need ~80 m).
    tex_period: jax.Array = jnp.float32(10.0)


def make_room(
    half_extent=(4.0, 2.2, 4.0), tex_size: int = 512, seed: int = 0,
    tex_period: float = 10.0,
) -> BoxRoom:
    hx, hy, hz = half_extent
    rng = np.random.default_rng(seed)

    def band_noise():
        # Two-band noise: low band gives large-scale structure, high band
        # gives the corner density of real indoor surfaces (wood grain /
        # carpet / road) so FAST fires on floors too, not just walls —
        # sparse mono ground estimation needs actual floor features.
        n = rng.normal(size=(tex_size, tex_size)).astype(np.float32)
        # cheap band-pass via FFT masking (scipy-free)
        F = np.fft.rfft2(n)
        fy = np.fft.fftfreq(tex_size)[:, None]
        fx = np.fft.rfftfreq(tex_size)[None, :]
        r = np.sqrt(fx * fx + fy * fy)
        lo = F * np.exp(-((r - 0.08) ** 2) / (2 * 0.05**2))
        hi = F * np.exp(-((r - 0.22) ** 2) / (2 * 0.08**2))

        def norm(Fm):
            out = np.fft.irfft2(Fm, s=(tex_size, tex_size))
            return (out - out.min()) / (out.max() - out.min())

        out = 0.65 * norm(lo) + 0.35 * norm(hi)
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
        tex_period=jnp.float32(tex_period),
    )


class Scene(NamedTuple):
    """Room + ellipsoid objects (ground-truth object landmarks) + optional
    horizontal slabs (table tops — Manhattan structure for the relation
    pipeline)."""

    room: BoxRoom
    ellipsoids: jax.Array  # (O, 9) minimal vectors in world frame
    labels: jax.Array  # (O,) int32 semantic labels
    albedo: jax.Array  # (O,) f32 base gray value
    slabs: jax.Array = jnp.zeros((0, 5), jnp.float32)  # (S, 5) cx, y, cz, hx, hz
    slab_albedo: jax.Array = jnp.zeros((0,), jnp.float32)


def make_scene(
    num_objects: int = 4,
    seed: int = 1,
    half_extent=(4.0, 2.2, 4.0),
    num_tables: int = 0,
    table_height: float = 0.75,
    half_range=((0.12, 0.10, 0.12), (0.35, 0.30, 0.35)),
    z_range=None,
    tex_period: float = 10.0,
) -> Scene:
    """Room with ellipsoid objects resting on the floor (y = +hy, y down).

    With `num_tables` > 0, horizontal table slabs are added and the FIRST
    `num_tables` objects rest on them instead of the floor (the supporting-
    plane / relation test scenario, `src/Relationship/Relationship.cpp`).
    `half_range` bounds the per-axis object half-extents (car-sized scenes
    pass car-sized bounds); `z_range` overrides the forward placement band.
    """
    room = make_room(half_extent=half_extent, seed=seed, tex_period=tex_period)
    rng = np.random.default_rng(seed + 100)
    hx, hy, hz = half_extent
    if z_range is None:
        z_range = (0.8, hz * 0.9)
    slabs, slab_albedo = [], []
    for t in range(num_tables):
        cx = rng.uniform(-hx * 0.4, hx * 0.4)
        cz = rng.uniform(1.6, hz * 0.8)
        y_top = hy - table_height  # table top surface height (y down)
        slabs.append([cx, y_top, cz, rng.uniform(0.7, 1.0), rng.uniform(0.5, 0.8)])
        slab_albedo.append(rng.uniform(90.0, 150.0))
    els, labels, albedo = [], [], []
    for i in range(num_objects):
        half = rng.uniform(half_range[0], half_range[1])
        yaw = rng.uniform(0, np.pi)
        if i < num_tables:
            # resting on table i (inside its footprint)
            s = slabs[i]
            x = s[0] + rng.uniform(-0.4, 0.4) * s[3]
            z = s[2] + rng.uniform(-0.4, 0.4) * s[4]
            y = s[1] - half[1]
        else:
            x = rng.uniform(-hx * 0.6, hx * 0.6)
            z = rng.uniform(*z_range)
            # resting on floor: camera-up is -y, floor at y=+hy
            y = hy - half[1]
        # rotation about the world up axis (-y): roll/pitch zero in a frame
        # whose z is up; build via euler (rot about y)
        els.append([x, y, z, 0.0, yaw, 0.0, half[0], half[1], half[2]])
        # Label must have a visual correlate (the reference's classes are
        # semantic categories a detector can SEE); tie it to an albedo band
        # so the on-mesh detector's class head is a learnable function of
        # the image, not an arbitrary index.
        label = i % 3
        labels.append(label)
        albedo.append(115.0 + 55.0 * label + rng.uniform(-18.0, 18.0))
    return Scene(
        room=room,
        ellipsoids=jnp.asarray(np.array(els, np.float32).reshape(-1, 9)),
        labels=jnp.asarray(np.array(labels, np.int32)),
        albedo=jnp.asarray(np.array(albedo, np.float32)),
        slabs=jnp.asarray(np.array(slabs, np.float32).reshape(-1, 5)),
        slab_albedo=jnp.asarray(np.array(slab_albedo, np.float32)),
    )


def _ray_ellipsoid(e: jax.Array, origin: jax.Array, rays: jax.Array):
    """Batched ray-ellipsoid intersection.

    e (9,), origin (3,), rays (..., 3) -> t (...,) (inf if miss) and unit
    normals (..., 3) at the hit point (world frame).
    """
    from ..core import quadric as _q

    Tsim = _q.similarity_transform(e)  # sphere -> world
    R = _q.euler_to_rotmat(e[3:6])
    inv_scale = 1.0 / e[6:9]
    # world -> unit-sphere coords: x' = S^-1 R^T (x - c)
    o_l = (R.T @ (origin - e[0:3])) * inv_scale
    d_l = jnp.einsum("ij,...j->...i", R.T, rays) * inv_scale
    a = jnp.sum(d_l * d_l, axis=-1)
    b = 2.0 * jnp.einsum("...i,i->...", d_l, o_l)
    c = jnp.sum(o_l * o_l) - 1.0
    disc = b * b - 4 * a * c
    hit = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2 * a)
    t = jnp.where(hit & (t0 > 0.05), t0, jnp.inf)
    # normal: gradient of implicit fn in world frame
    p_l = o_l + d_l * t[..., None]
    n_w = jnp.einsum("ij,...j->...i", R, p_l * inv_scale)
    n_w = n_w / jnp.maximum(jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-9)
    return t, n_w


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
    scale = T / room.tex_period  # texture meters->texels (one wrap/period)
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


@partial(jax.jit, static_argnames=("height", "width"))
def render_scene(
    scene: Scene,
    T_cw: jax.Array,
    intr: Intrinsics,
    height: int = 480,
    width: int = 640,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Render (gray, depth, instance_id) with objects composited over the room.

    instance_id (H, W) int32 is -1 for background — the ground-truth mask
    used by the synthetic detector (the `detect_online:false` replay seam).
    """
    gray_bg, depth_bg = render_frame(scene.room, T_cw, intr, height, width)
    T_wc = lie.inv_se3(T_cw)
    R_wc = T_wc[:3, :3]
    c_w = T_wc[:3, 3]
    yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    rays_c = jnp.stack(
        [(xx - intr.cx) / intr.fx, (yy - intr.cy) / intr.fy, jnp.ones_like(xx)],
        axis=-1,
    )
    rays_w = jnp.einsum("ij,hwj->hwi", R_wc, rays_c)

    def one_obj(e, alb, label):
        t, n = _ray_ellipsoid(e, c_w, rays_w)
        # Lambert shading + surface ripple so ORB finds texture on objects.
        # Ripple frequency is CLASS-dependent (shading-invariant visual
        # correlate of the semantic label, so the on-mesh detector's class
        # head has something physical to learn).
        light = jnp.asarray([0.4, -0.8, 0.45])
        light = light / jnp.linalg.norm(light)
        lam = jnp.clip(jnp.einsum("hwi,i->hw", n, light), 0.15, 1.0)
        p_w = c_w + rays_w * t[..., None]
        f = 18.0 + 13.0 * label.astype(jnp.float32)
        ripple = 0.5 + 0.5 * jnp.sin(f * p_w[..., 0]) * jnp.sin(
            0.83 * f * p_w[..., 1]
        ) * jnp.sin(1.26 * f * p_w[..., 2])
        g = alb * lam * (0.75 + 0.45 * ripple)
        return t, g

    # Horizontal slabs (table tops): ray ∩ plane y = y_top, bounded extent.
    if scene.slabs.shape[0] > 0:

        def one_slab(s, alb):
            cx, y_top, cz, shx, shz = s[0], s[1], s[2], s[3], s[4]
            dy = rays_w[..., 1]
            t = (y_top - c_w[1]) / jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
            p = c_w + rays_w * t[..., None]
            inside = (jnp.abs(p[..., 0] - cx) < shx) & (jnp.abs(p[..., 2] - cz) < shz)
            t = jnp.where((t > 0.05) & inside, t, jnp.inf)
            ripple = 0.5 + 0.5 * jnp.sin(17.0 * p[..., 0]) * jnp.sin(13.0 * p[..., 2])
            g = alb * (0.8 + 0.4 * ripple)
            return t, g

        ts_s, gs_s = jax.vmap(one_slab)(scene.slabs, scene.slab_albedo)
        t_slab = jnp.min(ts_s, axis=0)
        s_best = jnp.argmin(ts_s, axis=0)
        slab_hit = jnp.isfinite(t_slab) & ((t_slab < depth_bg) | (depth_bg <= 0.0))
        gray_bg = jnp.where(
            slab_hit, jnp.take_along_axis(gs_s, s_best[None], 0)[0], gray_bg
        )
        depth_bg = jnp.where(slab_hit, t_slab, depth_bg)

    if scene.ellipsoids.shape[0] == 0:  # object-free scene: background only
        return gray_bg, depth_bg, jnp.full(gray_bg.shape, -1, jnp.int32)
    ts, gs = jax.vmap(one_obj)(
        scene.ellipsoids, scene.albedo, scene.labels
    )  # (O, H, W)
    t_best = jnp.min(ts, axis=0)
    o_best = jnp.argmin(ts, axis=0).astype(jnp.int32)
    obj_hit = jnp.isfinite(t_best) & ((t_best < depth_bg) | (depth_bg <= 0.0))
    gray = jnp.where(obj_hit, jnp.take_along_axis(gs, o_best[None], 0)[0], gray_bg)
    depth = jnp.where(obj_hit, t_best, depth_bg)
    inst = jnp.where(obj_hit, o_best, -1)
    return gray, depth, inst


def gt_detections(
    scene: Scene, T_cw, intr: Intrinsics, width=640, height=480,
    min_pixels: int = 400, instance=None,
):
    """Synthetic detector: GT-projected bboxes (+labels) for one frame.

    This is the framework's cached-detection replay seam (the reference's
    `detect_online: false` path, `reconstruct/mono_sequence.py:111-115`):
    deterministic detections decoupled from any learned detector.
    Returns dict with bbox (O, 4), label (O,), prob (O,), valid (O,);
    when the per-pixel `instance` image from `render_scene` is given, also
    "mask" (O, H, W) bool instance masks (the reference detector's mask
    channel, `reconstruct/detector2d.py:106-118`).
    """
    from ..core import quadric as _q

    e = scene.ellipsoids
    bbox = _q.project_bbox(e, jnp.asarray(T_cw), intr.K)
    vis = _q.check_observability(e, jnp.asarray(T_cw))
    b = jnp.stack(
        [
            jnp.clip(bbox[:, 0], 0, width - 1),
            jnp.clip(bbox[:, 1], 0, height - 1),
            jnp.clip(bbox[:, 2], 0, width - 1),
            jnp.clip(bbox[:, 3], 0, height - 1),
        ],
        axis=-1,
    )
    area = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    valid = vis & (area > min_pixels)
    out = {
        "bbox": b,
        "label": scene.labels,
        "prob": jnp.where(valid, 0.99, 0.0),
        "valid": valid,
    }
    if instance is not None:
        ids = jnp.arange(e.shape[0], dtype=jnp.int32)
        out["mask"] = jnp.asarray(instance)[None] == ids[:, None, None]
    return out


def orbit_trajectory(
    num_frames: int, step: float = 0.02, pitch: float = 0.0
) -> np.ndarray:
    """Smooth camera arc inside the room with CONSTANT per-frame motion.

    `step` is the arc parameter increment per frame (radians); at the default
    the inter-frame image motion is ~10 px at 4 m depth — the 30 fps handheld
    regime the tracking search windows are tuned for (as in TUM sequences).
    `pitch` tilts the camera down (radians) so floor objects enter the FOV
    (a level camera at head height never sees the floor 2 m below it).
    Returns T_cw stack (F, 4, 4), float32.
    """
    cp, sp = np.cos(pitch), np.sin(pitch)
    R_pitch = np.array([[1, 0, 0], [0, cp, sp], [0, -sp, cp]], np.float32)
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
        T_wc[:3, :3] = R_wc @ R_pitch
        T_wc[:3, 3] = cpos
        poses.append(np.linalg.inv(T_wc))
    return np.stack(poses).astype(np.float32)
