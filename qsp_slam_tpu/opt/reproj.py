"""Reprojection factors: residuals + analytic Jacobians, batched over edges.

Replaces the g2o edge types used by the reference BA
(`g2o::EdgeSE3ProjectXYZ` / `EdgeStereoSE3ProjectXYZ` via
`src/Optimizer.cc:54-784`).  Everything is vmapped-by-construction: an "edge"
array of (kf_idx, pt_idx, measurement) rows; gathers pull the camera/point
states; residuals and Jacobians evaluate in one fused pass.

Camera state is T_cw (world->camera), perturbed on the LEFT:
T_cw' = exp(xi) T_cw with xi = [v, w] (see core.lie).  For a camera-frame
point p_c = R p_w + t:
    d p_c / d xi = [ I | -hat(p_c) ]          (2x? -> (3, 6))
    d p_c / d p_w = R                          (3, 3)
and the pinhole derivative
    d uv / d p_c = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics


class ReprojEdges(NamedTuple):
    """SoA edge table for (stereo-)reprojection factors.

    Fixed-capacity arrays; `valid` masks padding and culled outliers.
    For monocular edges `u_right < 0` (same convention as the reference's
    `mvuRight`, `src/Frame.cc`), and the third residual row is masked out.
    """

    kf_idx: jax.Array  # (E,) int32 — camera index
    pt_idx: jax.Array  # (E,) int32 — point index
    uv: jax.Array  # (E, 2) f32 — measured pixel
    u_right: jax.Array  # (E,) f32 — right-cam u for stereo edges, -1 for mono
    inv_sigma2: jax.Array  # (E,) f32 — per-edge information (1/sigma^2 by octave)
    valid: jax.Array  # (E,) bool

    @property
    def is_stereo(self) -> jax.Array:
        return self.u_right >= 0.0


def pinhole_jacobian(p_cam: jax.Array, intr: Intrinsics) -> jax.Array:
    """d uv / d p_cam for camera-frame points (..., 3) -> (..., 2, 3)."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([intr.fx * iz, zero, -intr.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, intr.fy * iz, -intr.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def residuals_and_jacobians(
    Tcw: jax.Array,
    points: jax.Array,
    edges: ReprojEdges,
    intr: Intrinsics,
    baseline_fx: jax.Array | float = 0.0,
):
    """Evaluate all reprojection residuals and analytic Jacobians in one pass.

    Returns (r, Jc, Jp, row_mask, depth):
      r        (E, 3)    residual rows [du, dv, du_right]
      Jc       (E, 3, 6) d r / d camera tangent
      Jp       (E, 3, 3) d r / d point
      row_mask (E, 3)    1.0 where the row participates (third row: stereo only)
      depth    (E,)      camera-frame depth (for cheirality gating by callers)

    `baseline_fx` = fx * stereo_baseline (the reference's `mbf`).
    """
    T_e = Tcw[edges.kf_idx]  # (E, 4, 4)
    p_w = points[edges.pt_idx]  # (E, 3)
    R = T_e[..., :3, :3]
    p_c = jnp.einsum("eij,ej->ei", R, p_w) + T_e[..., :3, 3]
    x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)

    u = intr.fx * x / z_safe + intr.cx
    v = intr.fy * y / z_safe + intr.cy
    u_r = u - baseline_fx / z_safe

    r = jnp.stack(
        [u - edges.uv[..., 0], v - edges.uv[..., 1], u_r - edges.u_right], axis=-1
    )

    # d uv / d p_c, extended with the right-cam row:
    # u_r = u - bf/z  =>  d u_r/d p_c = d u/d p_c + [0, 0, bf/z^2]
    J_pin = pinhole_jacobian(p_c, intr)  # (E, 2, 3)
    iz2 = 1.0 / (z_safe * z_safe)
    bf_row = J_pin[..., 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), baseline_fx * iz2], axis=-1
    )
    J_proj = jnp.concatenate([J_pin, bf_row[..., None, :]], axis=-2)  # (E, 3, 3)

    # d p_c / d xi = [I | -hat(p_c)]  (left perturbation, [v, w] ordering)
    dpc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=p_c.dtype), p_c.shape[:-1] + (3, 3)), -lie.hat(p_c)],
        axis=-1,
    )  # (E, 3, 6)
    Jc = jnp.einsum("eij,ejk->eik", J_proj, dpc_dxi)  # (E, 3, 6)
    Jp = jnp.einsum("eij,ejk->eik", J_proj, R)  # (E, 3, 3)

    stereo = edges.is_stereo
    ones = jnp.ones_like(z)
    row_mask = jnp.stack([ones, ones, stereo.astype(z.dtype)], axis=-1)
    row_mask = row_mask * edges.valid[..., None].astype(z.dtype)
    return r, Jc, Jp, row_mask, z


def edge_chi2(r: jax.Array, row_mask: jax.Array, inv_sigma2: jax.Array) -> jax.Array:
    """Per-edge chi2 = |r|^2 * inv_sigma2 over active rows. (E,)."""
    return jnp.sum(r * r * row_mask, axis=-1) * inv_sigma2
