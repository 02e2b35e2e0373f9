"""Ellipsoid / dual-quadric algebra.

An ellipsoid landmark is carried as a SoA-friendly minimal 9-vector
  e = [x, y, z, roll, pitch, yaw, a, b, c]
(center, XYZ-Euler rotation, axis half-lengths), matching the reference's
`g2o::ellipsoid::vec_minimal` layout (`include/core/Ellipsoid.h:40`).  All ops
broadcast over leading batch dims so whole object tables project in one shot.

Key operations (parity anchors):
  * `dual_quadric`         — Q* = T diag(a^2,b^2,c^2,-1) T^T
                             (`Ellipsoid.h:128` generateQuadric)
  * `project_to_conic`     — C* = P Q* P^T (`Ellipsoid.h:118-125`)
  * `conic_bbox`           — bbox of the projected ellipse (`Ellipsoid.h:131-146`)
  * `bbox_iou`             — IoU used for projection-based data association
                             (`src/Tracking_util.cc:413-483`)
  * `ellipsoid_log_error`  — 9-dof tangent error used by the quadric g2o edges
                             (`include/core/BasicEllipsoidEdges.h:14-76`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------


def euler_to_rotmat(rpy: jax.Array) -> jax.Array:
    """XYZ Euler (roll, pitch, yaw) -> R = Rz(yaw) Ry(pitch) Rx(roll)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    R = jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )
    return R


def rotmat_to_euler(R: jax.Array) -> jax.Array:
    """Inverse of `euler_to_rotmat` (gimbal-safe via clipping)."""
    sp = -R[..., 2, 0]
    p = jnp.arcsin(jnp.clip(sp, -1.0, 1.0))
    r = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    y = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([r, p, y], axis=-1)


def pose_of(e: jax.Array) -> jax.Array:
    """Minimal vector -> object-to-world SE(3) pose Two (..., 4, 4)."""
    R = euler_to_rotmat(e[..., 3:6])
    return lie.rt_to_se3(R, e[..., 0:3])


def scale_of(e: jax.Array) -> jax.Array:
    """Axis half-lengths (..., 3)."""
    return e[..., 6:9]


def from_pose_scale(Two: jax.Array, scale: jax.Array) -> jax.Array:
    """SE(3) pose + half-axes -> minimal 9-vector."""
    rpy = rotmat_to_euler(Two[..., :3, :3])
    return jnp.concatenate([Two[..., :3, 3], rpy, scale], axis=-1)


def similarity_transform(e: jax.Array) -> jax.Array:
    """T = [[R diag(s), t], [0, 1]] mapping the unit sphere to the ellipsoid.

    Parity: `g2o::ellipsoid::similarityTransform` (`Ellipsoid.h:112`).
    """
    R = euler_to_rotmat(e[..., 3:6])
    Rs = R * e[..., None, 6:9]
    return lie.rt_to_se3(Rs, e[..., 0:3])


def dual_quadric(e: jax.Array) -> jax.Array:
    """Dual quadric Q* = T diag(1,1,1,-1) T^T, normalized so Q*[3,3] = -1."""
    T = similarity_transform(e)
    D = jnp.ones(4, dtype=e.dtype).at[3].set(-1.0)
    return jnp.einsum("...ij,j,...kj->...ik", T, D, T)


def transform_ellipsoid(e: jax.Array, T: jax.Array) -> jax.Array:
    """Apply a rigid (or similarity) transform T to the ellipsoid.

    For similarity transforms, the scalar scale multiplies the half-axes.
    Parity: `g2o::ellipsoid::transform_from` (`Ellipsoid.h:94`).
    """
    s = lie.sim3_scale(T)
    R_T = T[..., :3, :3] / s[..., None, None]
    Two = pose_of(e)
    R_new = jnp.einsum("...ij,...jk->...ik", R_T, Two[..., :3, :3])
    t_new = (
        jnp.einsum("...ij,...j->...i", T[..., :3, :3], Two[..., :3, 3]) + T[..., :3, 3]
    )
    rpy = rotmat_to_euler(R_new)
    return jnp.concatenate([t_new, rpy, e[..., 6:9] * s[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------


def project_to_conic(e: jax.Array, P: jax.Array) -> jax.Array:
    """Project the dual quadric with P = K[R|t] (..., 3, 4) -> dual conic (..., 3, 3).

    The conic is normalized so C[2, 2] = -1 (sign convention: interior points x
    satisfy x^T C_primal x < 0).
    """
    Q = dual_quadric(e)
    C = jnp.einsum("...ij,...jk,...lk->...il", P, Q, P)
    return C / jnp.where(jnp.abs(C[..., 2:3, 2:3]) < 1e-12, 1e-12, -C[..., 2:3, 2:3])


def conic_center(C: jax.Array) -> jax.Array:
    """Center of the dual conic: (C02/C22, C12/C22)."""
    return jnp.stack([C[..., 0, 2] / C[..., 2, 2], C[..., 1, 2] / C[..., 2, 2]], axis=-1)


def conic_bbox(C: jax.Array) -> jax.Array:
    """Axis-aligned bbox [umin, vmin, umax, vmax] of the dual conic's ellipse.

    For a dual conic C* (normalized C[2,2] = -1), the extremal image lines
    tangent to the ellipse satisfy l^T C* l = 0; for axis-aligned lines this
    gives u = C02 ± sqrt(C02^2 - C00*C22) etc.  Degenerate (hyperbolic /
    behind-camera) projections produce NaN-free but meaningless boxes; callers
    gate on `is_ellipse`.
    """
    c00, c11, c22 = C[..., 0, 0], C[..., 1, 1], C[..., 2, 2]
    c02, c12 = C[..., 0, 2], C[..., 1, 2]
    # Tangent vertical line l = (1, 0, -u): l^T C* l = 0 gives
    # u = (c02 ± sqrt(c02^2 - c00 c22)) / c22; with c22 = -1 the center is
    # c02/c22 and the half-extent sqrt(c02^2 - c00 c22)/|c22|.
    du = jnp.sqrt(jnp.maximum(c02 * c02 - c00 * c22, 0.0)) / jnp.abs(c22)
    dv = jnp.sqrt(jnp.maximum(c12 * c12 - c11 * c22, 0.0)) / jnp.abs(c22)
    u0 = c02 / c22
    v0 = c12 / c22
    return jnp.stack([u0 - du, v0 - dv, u0 + du, v0 + dv], axis=-1)


def is_ellipse(C: jax.Array) -> jax.Array:
    """True where the projected dual conic is a real ellipse."""
    c00, c11, c22 = C[..., 0, 0], C[..., 1, 1], C[..., 2, 2]
    c02, c12 = C[..., 0, 2], C[..., 1, 2]
    return (c02 * c02 - c00 * c22 > 0.0) & (c12 * c12 - c11 * c22 > 0.0)


def check_observability(e: jax.Array, T_cw: jax.Array) -> jax.Array:
    """True where the ellipsoid center is in front of the camera.

    The conic discriminants in `is_ellipse` are blind to cheirality (a fully
    behind-camera ellipsoid still projects to an "ellipse"), so association
    and optimization gates must AND this in.  Parity:
    `g2o::ellipsoid::CheckObservability` (`Ellipsoid.h:162`).
    """
    center_cam = lie.transform_points(T_cw, e[..., None, 0:3])[..., 0, :]
    return center_cam[..., 2] > 0.0


def project_bbox(e: jax.Array, T_cw: jax.Array, K: jax.Array) -> jax.Array:
    """Ellipsoid -> image-plane bbox [umin, vmin, umax, vmax].

    Parity: `g2o::ellipsoid::getBoundingBoxFromProjection` (`Ellipsoid.h:134`).
    """
    P = jnp.einsum("...ij,...jk->...ik", K, T_cw[..., :3, :4])
    return conic_bbox(project_to_conic(e, P))


# ---------------------------------------------------------------------------
# IoU / errors
# ---------------------------------------------------------------------------


def bbox_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU of [umin, vmin, umax, vmax] boxes; broadcasts. -> (...)."""
    x0 = jnp.maximum(a[..., 0], b[..., 0])
    y0 = jnp.maximum(a[..., 1], b[..., 1])
    x1 = jnp.minimum(a[..., 2], b[..., 2])
    y1 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * jnp.maximum(a[..., 3] - a[..., 1], 0.0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0.0) * jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    union = area_a + area_b - inter
    return inter / jnp.where(union <= 0.0, 1.0, union)


def ellipsoid_log_error(e_est: jax.Array, e_obs: jax.Array) -> jax.Array:
    """9-dof error [dt(3), dw(3), dlog s(3)] between two ellipsoids.

    Rotation error via SO(3) log of relative rotation; scale error as log
    ratios (strictly positive axes).  Parity in role with
    `ellipsoid_log_error_9dof` (`Ellipsoid.h:84`).
    """
    dt = e_obs[..., 0:3] - e_est[..., 0:3]
    R_est = euler_to_rotmat(e_est[..., 3:6])
    R_obs = euler_to_rotmat(e_obs[..., 3:6])
    dR = jnp.einsum("...ji,...jk->...ik", R_est, R_obs)
    dw = lie.log_so3(dR)
    ds = jnp.log(jnp.clip(e_obs[..., 6:9], 1e-6, None)) - jnp.log(
        jnp.clip(e_est[..., 6:9], 1e-6, None)
    )
    return jnp.concatenate([dt, dw, ds], axis=-1)


def rotate_about_z(e: jax.Array, yaw: jax.Array) -> jax.Array:
    """Rotate the ellipsoid about its own z axis (same cuboid, new front face).

    Parity: `g2o::ellipsoid::rotate_ellipsoid` (`Ellipsoid.h:87`).
    """
    Rz = euler_to_rotmat(
        jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], axis=-1)
    )
    R = euler_to_rotmat(e[..., 3:6])
    rpy = rotmat_to_euler(jnp.einsum("...ij,...jk->...ik", R, Rz))
    return jnp.concatenate([e[..., 0:3], rpy, e[..., 6:9]], axis=-1)


def center_distance_2d(e_a: jax.Array, e_b: jax.Array) -> jax.Array:
    """Ground-plane (x, y) center distance, used for loop-closure object fusion.

    Parity: `SearchAndFuseObjects` merge gate dist < 2.0
    (`src/LoopClosing_util.cc:221-293`).
    """
    d = e_a[..., 0:2] - e_b[..., 0:2]
    return jnp.linalg.norm(d, axis=-1)
