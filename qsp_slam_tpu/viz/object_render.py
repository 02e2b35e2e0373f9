"""Offscreen object renderer: shaded ellipsoids + DeepSDF shapes as PNGs.

Parity: the reference renders reconstructed object meshes with an OpenGL
pipeline (`include/ObjectRenderer.h:42-93`, GLSL shaders in
`include/Renderer.hpp:23-…`, driven by `ObjectDrawer::DrawObjects`,
`include/ObjectDrawer.h:43`).  The TPU deployment is headless and has no
GL, so the same capability is provided as a RENDERER, not a viewer:

* Ellipsoid landmarks are ray-traced ANALYTICALLY — each pixel ray is
  mapped into the unit-sphere frame by the inverse similarity transform
  and intersected in closed form (one quadratic per pixel x object).
  This is one fused elementwise program over an (H, W, O) grid: no
  triangle rasterization, no scatters, MXU/VPU-friendly.
* DeepSDF-reconstructed shapes are SPHERE-TRACED through the decoder
  itself (`models/deepsdf.decode_sdf`) on a crop around the object's
  projected bbox — the renderer consumes the latent code directly, the
  exact analogue of the reference decoding a mesh from the code before
  rasterizing it (`reconstruct/optimizer.py:292`), minus the mesh.
  A fixed-step `lax.scan` keeps the march jit-compatible.

Both paths produce linear depth + Lambert-shaded color and composite by
z-buffer minimum, which is what the GL pipeline's depth test does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie, quadric
from ..core.camera import Intrinsics

# Label palette (matches viz.frame_draw bbox colors).
_PALETTE = np.array(
    [
        (66, 133, 244), (219, 68, 55), (244, 180, 0), (15, 157, 88),
        (171, 71, 188), (0, 172, 193),
    ],
    np.float32,
) / 255.0

_LIGHT_DIR = np.array([0.4, -0.7, -0.6], np.float32)  # camera-frame, toward scene
_AMBIENT = 0.35


def _pixel_ray_grid(H: int, W: int, intr: Intrinsics) -> jax.Array:
    """Unit camera-frame ray directions for every pixel center. (H, W, 3)."""
    u = jnp.arange(W, dtype=jnp.float32) + 0.5
    v = jnp.arange(H, dtype=jnp.float32) + 0.5
    x = (u - intr.cx) / intr.fx
    y = (v - intr.cy) / intr.fy
    d = jnp.stack(
        [jnp.broadcast_to(x[None, :], (H, W)),
         jnp.broadcast_to(y[:, None], (H, W)),
         jnp.ones((H, W), jnp.float32)],
        axis=-1,
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _shade(normal_cam: jax.Array, base_rgb: jax.Array) -> jax.Array:
    """Lambert + ambient in camera frame. normal (..., 3), rgb (..., 3)."""
    light = jnp.asarray(_LIGHT_DIR)
    light = light / jnp.linalg.norm(light)
    lam = jnp.clip(-jnp.sum(normal_cam * light, axis=-1), 0.0, 1.0)
    return base_rgb * (_AMBIENT + (1.0 - _AMBIENT) * lam)[..., None]


# ---------------------------------------------------------------------------
# Analytic ellipsoid ray tracing
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("H", "W"))
def render_ellipsoids(
    ellipsoids: jax.Array,  # (O, 9) world-frame minimal vectors
    valid: jax.Array,  # (O,) bool
    label: jax.Array,  # (O,) int32 — palette index
    Tcw: jax.Array,  # (4, 4)
    intr: Intrinsics,
    H: int,
    W: int,
) -> tuple[jax.Array, jax.Array]:
    """Ray-trace all ellipsoids. Returns (depth (H, W), rgb (H, W, 3)).

    depth = +inf where no hit.  In the unit-sphere frame the pixel ray
    (o + t d) hits where |o + t d|^2 = 1; the surface normal in that frame
    IS the hit point, mapped back by the inverse-transpose.
    """
    rays = _pixel_ray_grid(H, W, intr)  # (H, W, 3) camera frame, unit
    T_wc = lie.inv_se3(Tcw)
    R_wc = T_wc[:3, :3]
    cam_origin_w = T_wc[:3, 3]

    def one(e, ok, lbl):
        Tws = quadric.similarity_transform(e)  # unit sphere -> world
        # world -> sphere frame: x_s = diag(1/s) R^T (x_w - t)
        R = quadric.euler_to_rotmat(e[3:6])
        inv_s = 1.0 / jnp.maximum(e[6:9], 1e-6)
        o_s = inv_s * (R.T @ (cam_origin_w - e[0:3]))  # (3,)
        d_w = rays @ R_wc.T  # (H, W, 3) world-frame directions
        d_s = (d_w @ R) * inv_s[None, None, :]  # (H, W, 3)
        a = jnp.sum(d_s * d_s, -1)
        b = 2.0 * jnp.sum(d_s * o_s, -1)
        c = jnp.sum(o_s * o_s) - 1.0
        disc = b * b - 4.0 * a * c
        t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / jnp.maximum(2.0 * a, 1e-12)
        hit = ok & (disc > 0.0) & (t > 1e-3)
        # Hit point in sphere frame = normal direction in sphere frame.
        p_s = o_s + t[..., None] * d_s
        # Normal transforms by inverse-transpose of the sphere->world map:
        # n_w ∝ R diag(1/s) p_s.
        n_w = (p_s * inv_s[None, None, :]) @ R.T
        n_w = n_w / jnp.maximum(jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-9)
        n_c = n_w @ Tcw[:3, :3].T
        # Linear z-depth of the hit in the camera frame.
        p_w = cam_origin_w + t[..., None] * d_w * 1.0
        z = (p_w @ Tcw[:3, :3].T + Tcw[:3, 3])[..., 2]
        depth = jnp.where(hit & (z > 0.0), z, jnp.inf)
        base = jnp.asarray(_PALETTE)[lbl % _PALETTE.shape[0]]
        rgb = _shade(n_c, base[None, None, :])
        return depth, rgb

    depths, rgbs = jax.vmap(one)(ellipsoids, valid, label)  # (O, H, W[, 3])
    best = jnp.argmin(depths, axis=0)  # (H, W)
    depth = jnp.min(depths, axis=0)
    rgb = jnp.take_along_axis(rgbs, best[None, ..., None], axis=0)[0]
    rgb = jnp.where(jnp.isfinite(depth)[..., None], rgb, 0.0)
    return depth, rgb


# ---------------------------------------------------------------------------
# DeepSDF sphere tracing (bbox crop)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "res", "steps"))
def render_shape_crop(
    params,
    cfg,
    code: jax.Array,  # (C,)
    Tow_shape: jax.Array,  # (4, 4) world -> normalized object frame (sR | t)
    Tcw: jax.Array,
    intr: Intrinsics,
    bbox: jax.Array,  # (4,) [x0, y0, x1, y1] pixel crop to trace
    label: jax.Array,
    res: int = 96,
    steps: int = 24,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sphere-trace the decoder over a res x res crop of the image.

    Returns (uv (res, res, 2) pixel coords, depth (res, res) camera z or
    +inf, rgb (res, res, 3)).  The march runs in the NORMALIZED object
    frame (where the decoder's SDF lives); Tow_shape's scale converts
    world ray lengths to object units.
    """
    from ..models.deepsdf import decode_sdf

    x0, y0, x1, y1 = bbox[0], bbox[1], bbox[2], bbox[3]
    us = x0 + (x1 - x0) * (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    vs = y0 + (y1 - y0) * (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    uv = jnp.stack(jnp.meshgrid(us, vs, indexing="xy"), -1)  # (res, res, 2)
    x = (uv[..., 0] - intr.cx) / intr.fx
    y = (uv[..., 1] - intr.cy) / intr.fy
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)

    T_wc = lie.inv_se3(Tcw)
    # Camera origin / ray directions in the normalized object frame.
    sR = Tow_shape[:3, :3]
    s = jnp.linalg.norm(sR[:, 0])  # world -> object scale
    o_obj = sR @ T_wc[:3, 3] + Tow_shape[:3, 3]
    d_obj = (d_cam @ T_wc[:3, :3].T) @ sR.T  # length ≈ s per world unit
    d_len = jnp.maximum(jnp.linalg.norm(d_obj, axis=-1, keepdims=True), 1e-9)
    d_obj = d_obj / d_len

    # Start each ray on its entry into the |x|_inf <= 1.1 bounding cube
    # (the decoder is only trained inside the unit box).
    t_lo = (-1.1 - o_obj[None, None, :]) / jnp.where(
        jnp.abs(d_obj) < 1e-9, 1e-9, d_obj
    )
    t_hi = (1.1 - o_obj[None, None, :]) / jnp.where(
        jnp.abs(d_obj) < 1e-9, 1e-9, d_obj
    )
    t_near = jnp.max(jnp.minimum(t_lo, t_hi), -1)
    t_far = jnp.min(jnp.maximum(t_lo, t_hi), -1)
    inside = t_far > jnp.maximum(t_near, 0.0)
    t0 = jnp.maximum(t_near, 0.0)

    def march(t, _):
        p = o_obj + t[..., None] * d_obj
        sdf = decode_sdf(params, cfg, code, p)
        # Conservative step (tanh output compresses large distances, so
        # cap relative step size rather than trusting sdf far away).
        t_new = t + jnp.clip(sdf, -0.05, 0.25)
        return t_new, sdf

    t_hit, sdfs = jax.lax.scan(march, t0, None, length=steps)
    converged = jnp.abs(sdfs[-1]) < 0.01
    hit = inside & converged & (t_hit < t_far + 0.05)

    p_obj = o_obj + t_hit[..., None] * d_obj
    # Normal by central differences of the decoder SDF.
    eps = 0.01
    offs = jnp.eye(3, dtype=jnp.float32) * eps

    def grad_axis(off):
        return decode_sdf(params, cfg, code, p_obj + off) - decode_sdf(
            params, cfg, code, p_obj - off
        )

    n_obj = jnp.stack([grad_axis(offs[i]) for i in range(3)], -1)
    n_obj = n_obj / jnp.maximum(jnp.linalg.norm(n_obj, axis=-1, keepdims=True), 1e-9)
    # object -> world for directions: x_w = (sR)^-1 (x_o - t); normals use
    # the transpose of the inverse map's linear part, i.e. sR^T (up to scale).
    n_w = n_obj @ sR
    n_w = n_w / jnp.maximum(jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-9)
    n_c = n_w @ Tcw[:3, :3].T

    # Camera-frame z of the hit: world hit point = R_ws^T (p_obj - t) / ...
    # Use the ray parameterization instead: t_hit object units = t_hit / s
    # world units along d_cam (unit) from the camera center.
    z = (t_hit / jnp.maximum(s, 1e-9)) * d_cam[..., 2]
    depth = jnp.where(hit & (z > 0.0), z, jnp.inf)
    base = jnp.asarray(_PALETTE)[label % _PALETTE.shape[0]]
    rgb = _shade(n_c, base[None, None, :])
    return uv, depth, rgb


# ---------------------------------------------------------------------------
# Scene compositing
# ---------------------------------------------------------------------------

def render_objects_png(
    path: str,
    objects,  # slam.objects.ObjectTable
    Tcw: np.ndarray,
    intr: Intrinsics,
    H: int,
    W: int,
    gray: np.ndarray | None = None,
    shape_prior: tuple | None = None,  # (params, DeepSDFConfig)
) -> np.ndarray:
    """Render the object map from a camera and save a PNG. Returns the RGB
    uint8 array.  Ellipsoid landmarks always render; objects with a
    reconstruction additionally sphere-trace the decoder (drawn on top,
    nearer-depth wins — the GL depth test's role)."""
    Tcw = jnp.asarray(Tcw, jnp.float32)
    depth, rgb = render_ellipsoids(
        objects.ellipsoid, objects.valid, objects.label, Tcw, intr, H, W
    )
    depth = np.asarray(depth).copy()
    rgb = np.asarray(rgb).copy()

    if shape_prior is not None:
        params, cfg = shape_prior[:2]
        ok = np.asarray(objects.valid & objects.shape_ok)
        for o in np.nonzero(ok)[0]:
            e = objects.ellipsoid[o]
            bb = np.asarray(
                quadric.project_bbox(e, Tcw, intr.K)
            )
            bb = np.array(
                [max(bb[0] - 5, 0), max(bb[1] - 5, 0),
                 min(bb[2] + 5, W), min(bb[3] + 5, H)], np.float32
            )
            if bb[2] <= bb[0] or bb[3] <= bb[1]:
                continue
            uv, d_c, rgb_c = render_shape_crop(
                params, cfg, objects.code[o], objects.Tow_shape[o],
                Tcw, intr, jnp.asarray(bb), objects.label[o],
            )
            uv = np.asarray(uv)
            d_c = np.asarray(d_c)
            rgb_c = np.asarray(rgb_c)
            xi = np.clip(np.round(uv[..., 0]).astype(int), 0, W - 1)
            yi = np.clip(np.round(uv[..., 1]).astype(int), 0, H - 1)
            m = np.isfinite(d_c) & (d_c < depth[yi, xi])
            # Several crop samples can round to one pixel; fancy assignment
            # is last-write-wins, so write farthest-first and the NEAREST
            # sample lands last (the GL depth test's result).
            ys, xs, ds, cs = yi[m], xi[m], d_c[m], rgb_c[m]
            order = np.argsort(-ds)
            depth[ys[order], xs[order]] = ds[order]
            rgb[ys[order], xs[order]] = cs[order]

    if gray is not None:
        bg = np.clip(np.asarray(gray, np.float32) / 255.0, 0, 1)[..., None]
        bg = np.broadcast_to(bg, bg.shape[:2] + (3,)).copy()
    else:
        bg = np.full((H, W, 3), 1.0, np.float32)
    covered = np.isfinite(depth)
    out = np.where(covered[..., None], 0.25 * bg + 0.75 * rgb, bg)
    img = (np.clip(out, 0, 1) * 255).astype(np.uint8)
    if path:
        from PIL import Image

        Image.fromarray(img).save(path)
    return img
