"""Ground-plane estimation from depth: batched-hypothesis RANSAC.

Parity: `PlaneExtractor::extractGroundPlane` (`src/plane/PlaneExtractor.cpp`,
PCL RANSAC + biggest/farthest-plane choice, used by
`Tracking::ProcessGroundPlaneEstimation`, `src/Tracking_util.cc:714`).

TPU-native shape: instead of PCL's early-exit iterative RANSAC, we score a
fixed batch of H hypothesis planes (random point triples) against a fixed
subsample of the cloud in one fused pass, pick the argmax, and refine by a
least-squares fit (SVD) on the inliers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import plane as plane_mod
from ..core.camera import Intrinsics, backproject


class GroundPlaneResult(NamedTuple):
    plane: jax.Array  # (4,) normalized (n, d) in camera frame
    num_inliers: jax.Array  # int32
    ok: jax.Array  # bool — enough support


def depth_to_cloud(
    depth: jax.Array, intr: Intrinsics, stride: int = 8
) -> tuple[jax.Array, jax.Array]:
    """Subsampled unprojection: depth (H, W) -> points (M, 3), valid (M,)."""
    d = depth[::stride, ::stride]
    H, W = d.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) * stride
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) * stride
    uv = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
    z = d.reshape(-1)
    pts = backproject(uv, z, intr)
    return pts, z > 0.0


@partial(jax.jit, static_argnames=("num_hyp",))
def ransac_plane(
    pts: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    num_hyp: int = 256,
    inlier_th: float = 0.02,
    normal_hint: jax.Array | None = None,
    hint_cos_min: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Fit the dominant plane: returns (plane (4,), num_inliers).

    Fixed-iteration batched hypothesis scoring (SURVEY.md §7.3: RANSAC as
    batched scoring, no data-dependent control flow).  With `normal_hint`,
    only hypotheses whose normal lies within acos(hint_cos_min) of the hint
    compete — that is how the ground is told apart from bigger walls
    (the reference's ground-candidate filtering in
    `ProcessGroundPlaneEstimation`).
    """
    M = pts.shape[0]
    idx = jax.random.randint(key, (num_hyp, 3), 0, M)
    tri = pts[idx]  # (H, 3, 3)
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(nn < 1e-9, 1.0, nn)
    d = -jnp.sum(n * tri[:, 0], axis=-1)  # (H,)
    degenerate = (nn[:, 0] < 1e-9) | ~(valid[idx].all(axis=-1))
    dist = jnp.abs(jnp.einsum("hi,mi->hm", n, pts) + d[:, None])  # (H, M)
    score = jnp.sum((dist < inlier_th) & valid[None, :], axis=-1)
    score = jnp.where(degenerate, -1, score)
    if normal_hint is not None:
        hint = normal_hint / jnp.linalg.norm(normal_hint)
        align = jnp.abs(jnp.einsum("hi,i->h", n, hint))
        score = jnp.where(align >= hint_cos_min, score, -1)
    best = jnp.argmax(score)
    best_ok = score[best] > 0
    n_b, d_b = n[best], d[best]

    # Least-squares refinement on the inliers (weighted centroid + SVD).
    w = ((jnp.abs(pts @ n_b + d_b) < inlier_th) & valid).astype(pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(pts * w[:, None], axis=0) / wsum
    X = (pts - mu) * w[:, None]
    C = X.T @ X
    evals, evecs = jnp.linalg.eigh(C)
    n_r = evecs[:, 0]  # smallest eigenvalue -> normal
    n_r = n_r * jnp.sign(jnp.sum(n_r * n_b) + 1e-12)  # keep orientation
    d_r = -jnp.dot(n_r, mu)
    refined = jnp.concatenate([n_r, d_r[None]])
    inl = jnp.sum((jnp.abs(pts @ n_r + d_r) < inlier_th) & valid)
    inl = jnp.where(best_ok, inl, 0)  # no hypothesis passed the gates
    return plane_mod.normalize(refined), inl


def estimate_ground_plane_points(
    pts: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    min_inlier_frac: float = 0.15,
    camera_up_hint: tuple = (0.0, -1.0, 0.0),
) -> GroundPlaneResult:
    """Ground plane from an explicit camera-frame point set (the seam used
    by sparse modes: stereo keypoint clouds, LiDAR)."""
    hint = jnp.asarray(camera_up_hint, dtype=pts.dtype)
    pi, inl = ransac_plane(pts, valid, key, normal_hint=hint, hint_cos_min=0.7)
    flip = jnp.sign(jnp.sum(pi[:3] * hint) + 1e-12)
    pi = pi * flip
    ok = inl > min_inlier_frac * jnp.maximum(jnp.sum(valid), 1)
    return GroundPlaneResult(plane=pi, num_inliers=inl, ok=ok)


def estimate_ground_plane(
    depth: jax.Array,
    intr: Intrinsics,
    key: jax.Array,
    stride: int = 8,
    min_inlier_frac: float = 0.05,
    camera_up_hint: tuple = (0.0, -1.0, 0.0),
) -> GroundPlaneResult:
    """Full ground-plane pipeline for one RGB-D frame.

    The normal is oriented toward the camera-up hint (reference: ground normal
    chosen so gravity points down after `ActivateGroundPlane`,
    `src/Tracking_util.cc:785`).
    """
    pts, valid = depth_to_cloud(depth, intr, stride)
    # Note: the inlier fraction is relative to VALID points; dense-depth
    # callers previously used total pixels, so keep an equivalent gate.
    res = estimate_ground_plane_points(
        pts, valid, key, min_inlier_frac=0.0, camera_up_hint=camera_up_hint
    )
    ok = res.num_inliers > 0.15 * pts.shape[0]
    return GroundPlaneResult(plane=res.plane, num_inliers=res.num_inliers, ok=ok)
