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


@partial(jax.jit, static_argnames=("num_hyp", "below_frac"))
def ransac_plane(
    pts: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    num_hyp: int = 256,
    inlier_th: float = 0.02,
    normal_hint: jax.Array | None = None,
    hint_cos_min: float = 0.0,
    below_frac: float = 0.0,
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
    # Sample hypotheses from the VALID subset (compact-then-draw): masked
    # rounds (Manhattan extraction) or sparse clouds would otherwise starve
    # the hypothesis pool — with 10% valid, a uniform triple is all-valid
    # only 0.1% of the time.
    V = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    if below_frac > 0.0 and normal_hint is not None:
        # Ground search: the floor is the LOWEST structure, so draw HALF the
        # hypotheses from the low tail of heights along the up hint (lowest
        # 25% of valid points).  In sparse maps the floor can be a few
        # percent of the cloud (features cluster on objects/walls) — uniform
        # triples then almost never land on it, while the low tail is floor
        # + object bottoms RESTING on the floor.  The other HALF stays
        # uniform over all valid points: under camera pitch the hint is a
        # rotated proxy for gravity and the "low tail" drifts onto far
        # structure (depth leaks into the height), while a dense downward
        # view is floor-dominated and uniform triples nail it.
        hint_u = normal_hint / jnp.linalg.norm(normal_hint)
        h = pts @ hint_u
        pool = jnp.argsort(jnp.where(valid, h, jnp.inf))
        Vp = jnp.maximum((V + 3) // 4, jnp.minimum(V, 3))
        pool_u = jnp.argsort(~valid)
        u = jax.random.uniform(key, (num_hyp, 3))
        half = num_hyp // 2
        idx_lo = pool[jnp.clip((u[:half] * Vp).astype(jnp.int32), 0, M - 1)]
        idx_un = pool_u[jnp.clip((u[half:] * V).astype(jnp.int32), 0, M - 1)]
        idx = jnp.concatenate([idx_lo, idx_un])
    else:
        pool = jnp.argsort(~valid)  # valid indices first
        Vp = V
        u = jax.random.uniform(key, (num_hyp, 3))
        idx = pool[jnp.clip((u * Vp).astype(jnp.int32), 0, M - 1)]
    tri = pts[idx]  # (H, 3, 3)
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(nn < 1e-9, 1.0, nn)
    d = -jnp.sum(n * tri[:, 0], axis=-1)  # (H,)
    degenerate = (nn[:, 0] < 1e-9) | ~(valid[idx].all(axis=-1))
    if normal_hint is not None:
        # Hint-normal single-point hypotheses: with a SPARSE cloud whose
        # ground fraction is small (mono/stereo keypoint maps), the chance
        # that a random TRIPLE lands on the ground vanishes — but any single
        # ground point + the up hint is already a near-perfect candidate
        # (the SVD refinement recovers the exact normal from the inliers).
        hint_n = normal_hint / jnp.linalg.norm(normal_hint)
        u1 = jax.random.uniform(jax.random.fold_in(key, 1), (num_hyp,))
        idx1 = pool[jnp.clip((u1 * Vp).astype(jnp.int32), 0, M - 1)]
        p1 = pts[idx1]
        n = jnp.concatenate([n, jnp.tile(hint_n[None], (num_hyp, 1))])
        d = jnp.concatenate([d, -p1 @ hint_n])
        degenerate = jnp.concatenate([degenerate, ~valid[idx1]])
    if normal_hint is not None:
        # Orient every hypothesis toward the up hint so "below" is signed.
        hint = normal_hint / jnp.linalg.norm(normal_hint)
        sflip = jnp.sign(jnp.where(n @ hint == 0.0, 1.0, n @ hint))
        n = n * sflip[:, None]
        d = d * sflip
    signed = jnp.einsum("hi,mi->hm", n, pts) + d[:, None]  # (H, M)
    dist = jnp.abs(signed)
    score = jnp.sum((dist < inlier_th) & valid[None, :], axis=-1)
    if below_frac > 0.0 and normal_hint is not None:
        # The GROUND is the lowest dominant plane: a hypothesis with many
        # points clearly below it (a horizontal ring of wall points at
        # camera height, the ceiling, a table) is NOT the ground.  A hard
        # feasibility gate with an outlier allowance (`below_frac` of the
        # cloud, min 3) — a soft penalty would also kill the TRUE floor,
        # whose sparse support can be smaller than the penalty from a few
        # triangulation outliers beneath it.
        below = jnp.sum(
            (signed < -3.0 * inlier_th) & valid[None, :], axis=-1
        )
        max_below = jnp.maximum(3, (below_frac * V).astype(jnp.int32))
        score = jnp.where(below <= max_below, score, -1)
    score = jnp.where(degenerate, -1, score)
    if normal_hint is not None:
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
    if normal_hint is not None:
        # Refinement can drift the plane off the ground and into a denser
        # band (its inlier set is a SLAB, not the true surface): a tilted
        # raw hypothesis that just passes the alignment gate can slice a
        # thick stripe through a dominant wall, and the SVD refit of that
        # stripe snaps to the WALL plane — which also has nothing "below"
        # it, so the feasibility check alone does not catch it.  Keep the
        # raw winning hypothesis when the refined plane breaks feasibility
        # OR leaves the hint cone.
        keep_raw = jnp.abs(jnp.dot(n_r, hint)) < hint_cos_min
        if below_frac > 0.0:
            below_r = jnp.sum(((pts @ n_r + d_r) < -3.0 * inlier_th) & valid)
            keep_raw |= below_r > jnp.maximum(
                3, (below_frac * V).astype(jnp.int32)
            )
        raw = jnp.concatenate([n_b, d_b[None]])
        inl_raw = jnp.sum((jnp.abs(pts @ n_b + d_b) < inlier_th) & valid)
        refined = jnp.where(keep_raw, raw, refined)
        inl = jnp.where(keep_raw, inl_raw, inl)
    inl = jnp.where(best_ok, inl, 0)  # no hypothesis passed the gates
    return plane_mod.normalize(refined), inl


@jax.jit
def adaptive_inlier_th(pts: jax.Array, valid: jax.Array, rel: float = 0.025):
    """Scale-adaptive RANSAC threshold for gauge-free (mono) clouds: a
    fraction of the median point distance.  One fused dispatch."""
    r = jnp.linalg.norm(pts, axis=-1)
    srt = jnp.sort(jnp.where(valid, r, jnp.inf))
    mid = jnp.clip((jnp.sum(valid) - 1) // 2, 0, r.shape[0] - 1)
    return rel * jnp.maximum(srt[mid], 1e-3)


def estimate_ground_plane_points(
    pts: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    min_inlier_frac: float = 0.10,
    camera_up_hint: tuple = (0.0, -1.0, 0.0),
    inlier_th: jax.Array | None = None,
) -> GroundPlaneResult:
    """Ground plane from an explicit camera-frame point set (the seam used
    by sparse modes: stereo keypoint clouds, LiDAR, mono map points).

    `inlier_th` defaults to a noise-adaptive value (2.5% of the median
    point distance): stereo keypoint depth noise grows with range and mono
    clouds have an arbitrary gauge, so no fixed metric threshold fits both.
    """
    hint = jnp.asarray(camera_up_hint, dtype=pts.dtype)
    if inlier_th is None:
        inlier_th = adaptive_inlier_th(pts, valid)
    pi, inl = ransac_plane(
        pts, valid, key, inlier_th=inlier_th,
        normal_hint=hint, hint_cos_min=0.7, below_frac=0.05,
    )
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
