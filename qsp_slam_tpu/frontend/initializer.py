"""Monocular two-view initialization: dual-model (H / E) RANSAC + triangulation.

Parity: `Initializer` (`src/Initializer.cc`, 931 LoC) — parallel homography /
fundamental hypothesis scoring, model selection by score ratio, pose recovery
with cheirality + parallax checks, DLT triangulation, median-depth scale
normalization (`Tracking::MonocularInitialization`, `src/Tracking.cc:687`).

TPU-native: both model families are fixed hypothesis batches scored in one
pass; pose disambiguation evaluates all candidate (R, t) decompositions by
triangulated-cheirality count in parallel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics, pixel_rays


class TwoViewInit(NamedTuple):
    ok: jax.Array  # bool
    T_cw2: jax.Array  # (4, 4) second camera pose (first = identity)
    points: jax.Array  # (M, 3) triangulated world points (match-aligned)
    pt_ok: jax.Array  # (M,) bool — inlier & positive-depth & parallax
    used_homography: jax.Array  # bool — which model was selected


def _triangulate(rays1: jax.Array, rays2: jax.Array, T_cw2: jax.Array):
    """Midpoint triangulation for unit-plane rays. (M, 3) world points, depth1.

    Camera 1 at identity; camera 2 at T_cw2 (world->cam2).
    """
    R = T_cw2[:3, :3]
    t = T_cw2[:3, 3]
    # p = d1 * r1 ; in cam2: R p + t = d2 * r2.
    # Solve least squares for (d1, d2): [R r1, -r2] [d1; d2] = -t
    a = jnp.einsum("ij,mj->mi", R, rays1)  # (M, 3)
    b = -rays2
    A = jnp.stack([a, b], axis=-1)  # (M, 3, 2)
    rhs = jnp.broadcast_to(-t, a.shape)[..., None]  # (M, 3, 1)
    AtA = jnp.einsum("mij,mik->mjk", A, A)
    Atb = jnp.einsum("mij,mik->mjk", A, rhs)[..., 0]
    det = AtA[:, 0, 0] * AtA[:, 1, 1] - AtA[:, 0, 1] * AtA[:, 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    d1 = (AtA[:, 1, 1] * Atb[:, 0] - AtA[:, 0, 1] * Atb[:, 1]) / det
    d2 = (-AtA[:, 1, 0] * Atb[:, 0] + AtA[:, 0, 0] * Atb[:, 1]) / det
    pts = rays1 * d1[:, None]
    return pts, d1, d2


def _essential_8pt(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """8-point essential matrix from normalized coords (8, 2) each -> (3, 3)."""
    o = jnp.ones((8, 1), x1.dtype)
    X1 = jnp.concatenate([x1, o], axis=-1)
    X2 = jnp.concatenate([x2, o], axis=-1)
    A = (X2[:, :, None] * X1[:, None, :]).reshape(8, 9)  # x2^T E x1 = 0
    _, _, Vt = jnp.linalg.svd(A)
    E = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(E)
    S2 = jnp.diag(jnp.array([1.0, 1.0, 0.0], x1.dtype))
    return U @ S2 @ Vt2


def _homography_4pt(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """4-point DLT homography on normalized coords -> (3, 3) with x2 ~ H x1."""
    o = jnp.ones((4, 1), x1.dtype)
    X1 = jnp.concatenate([x1, o], axis=-1)
    zeros = jnp.zeros_like(X1)
    rows_u = jnp.concatenate([X1, zeros, -x2[:, 0:1] * X1], axis=-1)
    rows_v = jnp.concatenate([zeros, X1, -x2[:, 1:2] * X1], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (8, 9)
    _, _, Vt = jnp.linalg.svd(A)
    return Vt[-1].reshape(3, 3)


def _epipolar_err(E, x1, x2):
    """Symmetric epipolar distance on the normalized plane. (M,)."""
    o = jnp.ones_like(x1[:, :1])
    X1 = jnp.concatenate([x1, o], -1)
    X2 = jnp.concatenate([x2, o], -1)
    l2 = X1 @ E.T  # line in image 2
    l1 = X2 @ E  # line in image 1
    num = jnp.abs(jnp.sum(X2 * l2, -1))
    d2 = num / jnp.sqrt(l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-12)
    d1 = num / jnp.sqrt(l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-12)
    return d1 + d2


def _homography_err(H, x1, x2):
    """Symmetric transfer error on the normalized plane. (M,)."""
    o = jnp.ones_like(x1[:, :1])
    X1 = jnp.concatenate([x1, o], -1)
    X2 = jnp.concatenate([x2, o], -1)
    Hx1 = X1 @ H.T
    Hx1 = Hx1[:, :2] / jnp.where(jnp.abs(Hx1[:, 2:]) < 1e-12, 1e-12, Hx1[:, 2:])
    Hinv = jnp.linalg.inv(H)
    Hx2 = X2 @ Hinv.T
    Hx2 = Hx2[:, :2] / jnp.where(jnp.abs(Hx2[:, 2:]) < 1e-12, 1e-12, Hx2[:, 2:])
    return jnp.linalg.norm(Hx1 - x2, axis=-1) + jnp.linalg.norm(Hx2 - x1, axis=-1)


def _decompose_E(E: jax.Array):
    """4 candidate (R, t) pairs from an essential matrix. (4, 4, 4) stack."""
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    U = U * jnp.sign(d)  # make R proper
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return jnp.stack(
        [
            lie.rt_to_se3(R1, t),
            lie.rt_to_se3(R1, -t),
            lie.rt_to_se3(R2, t),
            lie.rt_to_se3(R2, -t),
        ]
    )


def _decompose_H(H: jax.Array, x1: jax.Array, w: jax.Array) -> jax.Array:
    """Candidate (R, t) poses from a normalized-coords homography x2 ~ H x1.

    With H = R + t n^T (plane at unit distance, normal n in cam-1 frame):
    S = H^T H - I is a symmetric rank-2 perturbation whose extreme
    eigenvectors span the possible normals; given n, R is fixed on the
    subspace orthogonal to n (H e = R e for e ⊥ n) and t = (H - R) n.

    The DLT sign is fixed first by an inlier vote: physical points have
    positive projective scale (H x1)_3 > 0.  -> (4, 4, 4) candidates
    (the two plane-normal solutions, duplicated to match the E-stack shape).
    """
    o = jnp.ones((x1.shape[0], 1), H.dtype)
    X1 = jnp.concatenate([x1, o], -1)
    sgn = jnp.sign(jnp.sum(w * (X1 @ H.T)[:, 2]) + 1e-12)
    _, S_h, _ = jnp.linalg.svd(H)
    Hn = sgn * H / jnp.maximum(S_h[1], 1e-12)  # middle singular value -> 1

    def cands_for(Hs):
        S = Hs.T @ Hs - jnp.eye(3, dtype=H.dtype)
        lam, V = jnp.linalg.eigh(S)  # ascending
        zeta = jnp.sqrt(jnp.maximum(lam[2], 0.0))
        eta = jnp.sqrt(jnp.maximum(-lam[0], 0.0))
        denom = jnp.maximum(jnp.sqrt(zeta**2 + eta**2), 1e-12)
        n_a = (zeta * V[:, 2] + eta * V[:, 0]) / denom
        n_b = (zeta * V[:, 2] - eta * V[:, 0]) / denom

        def pose_for(n):
            a = jnp.where(
                jnp.abs(n[0]) < 0.9,
                jnp.array([1.0, 0.0, 0.0], H.dtype),
                jnp.array([0.0, 1.0, 0.0], H.dtype),
            )
            e1 = a - n * jnp.dot(a, n)
            e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
            e2 = jnp.cross(n, e1)
            r1 = Hs @ e1
            r1 = r1 / jnp.maximum(jnp.linalg.norm(r1), 1e-12)
            r2 = Hs @ e2
            r2 = r2 - r1 * jnp.dot(r1, r2)
            r2 = r2 / jnp.maximum(jnp.linalg.norm(r2), 1e-12)
            r3 = jnp.cross(r1, r2)
            R = jnp.stack([r1, r2, r3], axis=1) @ jnp.stack([e1, e2, n], axis=1).T
            t = (Hs - R) @ n
            return lie.rt_to_se3(R, t)

        # Each normal is determined only up to sign, and flipping n flips t
        # (same R): all four {±n_a, ±n_b} are distinct physical candidates.
        return jnp.stack(
            [pose_for(n_a), pose_for(-n_a), pose_for(n_b), pose_for(-n_b)]
        )

    return cands_for(Hn)


@partial(jax.jit, static_argnames=("num_hyp",))
def two_view_init(
    uv1: jax.Array,  # (M, 2) matched pixels in frame 1
    uv2: jax.Array,  # (M, 2) matched pixels in frame 2
    valid: jax.Array,  # (M,)
    intr: Intrinsics,
    key: jax.Array,
    num_hyp: int = 128,
    inlier_norm: float = 0.006,  # ~3px at f=520 on the normalized plane
    min_inliers: int = 40,
    min_parallax_deg: float = 0.6,
) -> TwoViewInit:
    """Full two-view bootstrap from matched pixel pairs."""
    M = uv1.shape[0]
    x1 = pixel_rays(uv1, intr)[:, :2]
    x2 = pixel_rays(uv2, intr)[:, :2]
    p = valid.astype(uv1.dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    kE, kH = jax.random.split(key)

    # --- Essential family
    idx8 = jax.random.choice(kE, M, shape=(num_hyp, 8), p=p)
    Es = jax.vmap(lambda i: _essential_8pt(x1[i], x2[i]))(idx8)
    errE = jax.vmap(lambda E: _epipolar_err(E, x1, x2))(Es)  # (H, M)
    inlE = (errE < inlier_norm) & valid[None]
    scoreE = jnp.sum(inlE, -1)
    bE = jnp.argmax(scoreE)

    # --- Homography family
    idx4 = jax.random.choice(kH, M, shape=(num_hyp, 4), p=p)
    Hs = jax.vmap(lambda i: _homography_4pt(x1[i], x2[i]))(idx4)
    errH = jax.vmap(lambda H: _homography_err(H, x1, x2))(Hs)
    inlH = (errH < 2 * inlier_norm) & valid[None]
    scoreH = jnp.sum(inlH, -1)
    bH = jnp.argmax(scoreH)

    # Model selection (ORB-SLAM ratio): prefer H when it explains >= 45%.
    rH = scoreH[bH].astype(jnp.float32) / jnp.maximum(
        scoreH[bH] + scoreE[bE], 1
    ).astype(jnp.float32)
    use_H = rH > 0.45

    inl_best = jnp.where(use_H, inlH[bH], inlE[bE])
    o = jnp.ones((M, 1), x1.dtype)
    # E path: weighted least-squares 8-point refit on all E-inliers.
    w = inl_best.astype(x1.dtype)
    X1 = jnp.concatenate([x1, o], -1)
    X2 = jnp.concatenate([x2, o], -1)
    A = (X2[:, :, None] * X1[:, None, :]).reshape(M, 9) * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    E_ref = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(E_ref)
    E_ref = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], x1.dtype)) @ Vt2

    # H path: weighted DLT refit + proper homography decomposition (E is
    # DEGENERATE for coplanar points — a 2-parameter family fits them).
    rows_u = jnp.concatenate([X1, jnp.zeros_like(X1), -x2[:, 0:1] * X1], -1)
    rows_v = jnp.concatenate([jnp.zeros_like(X1), X1, -x2[:, 1:2] * X1], -1)
    Ah = jnp.concatenate([rows_u * w[:, None], rows_v * w[:, None]], axis=0)
    _, _, Vth = jnp.linalg.svd(Ah, full_matrices=False)
    H_ref = Vth[-1].reshape(3, 3)

    cands = jnp.where(
        use_H, _decompose_H(H_ref, x1, w), _decompose_E(E_ref)
    )  # (4, 4, 4)
    rays1 = jnp.concatenate([x1, o], -1)
    rays2 = jnp.concatenate([x2, o], -1)

    def score_pose(T):
        pts, d1, d2 = _triangulate(rays1, rays2, T)
        ok = (d1 > 0.01) & (d2 > 0.01) & inl_best
        # parallax per point
        v1 = pts  # from cam1 at origin
        c2 = -T[:3, :3].T @ T[:3, 3]
        v2 = pts - c2
        cosang = jnp.sum(v1 * v2, -1) / jnp.maximum(
            jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-12
        )
        good_par = cosang < jnp.cos(jnp.deg2rad(min_parallax_deg))
        # Score with the parallax gate included: a spurious near-identity
        # candidate puts "everything in front" of a zero baseline but has
        # no parallax, and must not tie with the true pose.
        return jnp.sum(ok & good_par), pts, ok & good_par

    counts, ptss, oks = jax.vmap(score_pose)(cands)
    best = jnp.argmax(counts)
    T_best = cands[best]
    pts = ptss[best]
    ok_pts = oks[best]

    # Scale normalization: median triangulated depth -> 1 (mono gauge).
    z = pts[:, 2]
    zs = jnp.sort(jnp.where(ok_pts, z, jnp.inf))
    cnt = jnp.maximum(jnp.sum(ok_pts), 1)
    med = zs[jnp.clip((cnt - 1) // 2, 0, M - 1)]
    med = jnp.where((med <= 0) | ~jnp.isfinite(med), 1.0, med)
    pts = pts / med
    T_scaled = T_best.at[:3, 3].divide(med)

    n_ok = jnp.sum(ok_pts)
    ok = (n_ok >= min_inliers) & (counts[best] > 0.7 * jnp.sum(inl_best))
    return TwoViewInit(
        ok=ok, T_cw2=T_scaled, points=pts, pt_ok=ok_pts, used_homography=use_H
    )
