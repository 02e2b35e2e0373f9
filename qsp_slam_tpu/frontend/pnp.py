"""Absolute pose from 3D-2D correspondences: batched DLT-RANSAC + LM refine.

Parity: `PnPsolver` (`src/PnPsolver.cc`, EPnP + RANSAC, used by
`Tracking::Relocalization`, `src/Tracking.cc:1589`).

TPU-native shape: a fixed batch of 6-point DLT hypotheses (vmapped 12x12
SVDs — the minimal linear calibrated-PnP), one scoring pass over all
correspondences, then the existing LM pose optimizer polishes the winner's
inliers.  No data-dependent iteration counts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics, pixel_rays, project
from ..opt.pose_opt import optimize_pose
from ..opt.reproj import ReprojEdges


class PnPResult(NamedTuple):
    Tcw: jax.Array  # (4, 4)
    inliers: jax.Array  # (M,) bool
    num_inliers: jax.Array  # int32
    ok: jax.Array  # bool


def _dlt_pose(X: jax.Array, xn: jax.Array) -> jax.Array:
    """6-point calibrated DLT: X (6, 3) world, xn (6, 2) normalized coords.

    Returns T_cw (4, 4).  Nullspace of the 12x12 design matrix, orthogonality
    enforced by SVD, sign by cheirality.
    """
    Xh = jnp.concatenate([X, jnp.ones((6, 1), X.dtype)], axis=-1)  # (6, 4)
    zeros = jnp.zeros_like(Xh)
    rows_u = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=-1)  # (6, 12)
    rows_v = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (12, 12)
    _, _, Vt = jnp.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    M = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(det)) @ Vt2
    scale = jnp.mean(S) * det
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # Cheirality: majority of the 6 points must be in front.
    z = (X @ R.T + t)[:, 2]
    flip = jnp.sum(z > 0) < 3
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # R might have det -1 after flip; re-orthonormalize sign via det.
    d = jnp.linalg.det(R)
    R = R * jnp.where(d < 0, -1.0, 1.0)
    return lie.rt_to_se3(R, t)


def _planar_pose(X: jax.Array, xn: jax.Array) -> jax.Array:
    """4-point homography pose (IPPE-style) — exact for coplanar points,
    where the DLT design matrix is rank-deficient.  X (4, 3), xn (4, 2)."""
    c = jnp.mean(X, axis=0)
    Xc = X - c
    # Plane basis: two principal directions + normal.
    _, _, Vt = jnp.linalg.svd(Xc)
    B = Vt  # rows: b1, b2, n
    q = Xc @ B.T  # plane coords (4, 3), q[:, 2] ~ 0
    # 4-point homography plane(q_x, q_y) -> normalized image coords.
    ones = jnp.ones((4, 1), X.dtype)
    qh = jnp.concatenate([q[:, :2], ones], axis=-1)  # (4, 3)
    zeros = jnp.zeros_like(qh)
    rows_u = jnp.concatenate([qh, zeros, -xn[:, 0:1] * qh], axis=-1)
    rows_v = jnp.concatenate([zeros, qh, -xn[:, 1:2] * qh], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (8, 9)
    _, _, Vt9 = jnp.linalg.svd(A)
    H = Vt9[-1].reshape(3, 3)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 2.0 / jnp.maximum(jnp.linalg.norm(h1) + jnp.linalg.norm(h2), 1e-12)
    # Cheirality: points must be in front (positive projective depth).
    sgn = jnp.sign(jnp.sum(qh @ H.T * jnp.concatenate([xn, ones], -1)) + 1e-12)
    lam = lam * sgn
    r1, r2, t = lam * h1, lam * h2, lam * h3
    R_approx = jnp.stack([r1, r2, jnp.cross(r1, r2)], axis=1)
    U, _, Vt3 = jnp.linalg.svd(R_approx)
    det = jnp.linalg.det(U @ Vt3)
    R_cp = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(det)) @ Vt3
    T_cp = lie.rt_to_se3(R_cp, t)
    T_pw = lie.rt_to_se3(B, -B @ c)
    return T_cp @ T_pw


@partial(jax.jit, static_argnames=("num_hyp",))
def pnp_ransac(
    pts_w: jax.Array,  # (M, 3)
    uv: jax.Array,  # (M, 2)
    valid: jax.Array,  # (M,)
    intr: Intrinsics,
    key: jax.Array,
    num_hyp: int = 256,
    inlier_px: float = 4.0,
    min_inliers: int = 12,
    center_hint: jax.Array | None = None,
    max_center_dist: float = jnp.inf,
) -> PnPResult:
    """`center_hint` (3,): optional prior camera position; hypotheses whose
    center is farther than `max_center_dist` are rejected.  This breaks the
    planar twisted-pair ambiguity (a camera mirrored about the dominant
    plane reprojects coplanar points identically)."""
    M = pts_w.shape[0]
    xn = pixel_rays(uv, intr)[:, :2]  # normalized image coords
    # Sample hypothesis points only from VALID rows (uniform sampling over
    # the padded table would make fully-valid 6-tuples vanishingly rare).
    p = valid.astype(uv.dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    k1, k2 = jax.random.split(key)
    # Two hypothesis pools scored together: 6-point DLT (general scenes) and
    # 4-point planar homography pose (DLT is rank-deficient for coplanar
    # points — common indoors where most matches lie on one wall).
    idx = jax.random.choice(k1, M, shape=(num_hyp // 2, 6), p=p)
    Ts_dlt = jax.vmap(lambda i: _dlt_pose(pts_w[i], xn[i]))(idx)
    idx4 = jax.random.choice(k2, M, shape=(num_hyp - num_hyp // 2, 4), p=p)
    Ts_pl = jax.vmap(lambda i: _planar_pose(pts_w[i], xn[i]))(idx4)
    Ts = jnp.concatenate([Ts_dlt, Ts_pl])  # (H, 4, 4)
    ok_h = jnp.concatenate([valid[idx].all(-1), valid[idx4].all(-1)])

    pc = jnp.einsum("hij,mj->hmi", Ts[:, :3, :3], pts_w) + Ts[:, None, :3, 3]
    uv_h, z = project(pc, intr)
    err = jnp.linalg.norm(uv_h - uv[None], axis=-1)
    inl = (err < inlier_px) & (z > 0.05) & valid[None, :]
    score = jnp.where(ok_h & jnp.all(jnp.isfinite(Ts), axis=(1, 2)), jnp.sum(inl, -1), -1)
    if center_hint is not None:
        centers = -jnp.einsum("hji,hj->hi", Ts[:, :3, :3], Ts[:, :3, 3])
        near = jnp.linalg.norm(centers - center_hint[None], axis=-1) < max_center_dist
        score = jnp.where(near, score, -1)
    best = jnp.argmax(score)
    T_best = Ts[best]
    inliers0 = inl[best]

    # LM polish on the winner's inliers.
    edges = ReprojEdges(
        kf_idx=jnp.zeros(M, jnp.int32),
        pt_idx=jnp.arange(M, dtype=jnp.int32),
        uv=uv,
        u_right=jnp.full(M, -1.0, uv.dtype),
        inv_sigma2=jnp.ones(M, uv.dtype),
        valid=inliers0,
    )
    res = optimize_pose(T_best, pts_w, edges, intr, rounds=2, iters_per_round=8)
    n = res.num_inliers
    return PnPResult(
        Tcw=res.Tcw, inliers=res.inlier, num_inliers=n,
        ok=(n >= min_inliers) & (score[best] > 0),
    )
