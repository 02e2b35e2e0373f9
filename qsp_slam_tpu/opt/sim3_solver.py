"""Closed-form Sim(3)/SE(3) alignment (Horn) + batched RANSAC.

Parity: `Sim3Solver` (`src/Sim3Solver.cc:140-226`) — Horn's quaternion-free
absolute orientation between matched 3D point sets with RANSAC over minimal
triples; scale optionally fixed (stereo/RGB-D mode, `mbFixScale`).

TPU-native: hypotheses are a fixed batch scored in one pass (no early exit);
the closed form is SVD-based (Umeyama) which vmaps cleanly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import project


def horn_alignment(
    pts_src: jax.Array,  # (N, 3)
    pts_dst: jax.Array,  # (N, 3)
    weights: jax.Array,  # (N,) >= 0
    with_scale: bool = True,
) -> jax.Array:
    """Weighted least-squares similarity T (4, 4) with dst ~ T src.

    Returns the transform with sR in the top-left block (s = 1 when
    with_scale=False).  Degenerate inputs give garbage — callers gate.
    """
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.einsum("n,ni->i", w, pts_src)
    mu_d = jnp.einsum("n,ni->i", w, pts_dst)
    xs = pts_src - mu_s
    xd = pts_dst - mu_d
    cov = jnp.einsum("n,ni,nj->ij", w, xd, xs)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(jnp.sign(det)))
    R = U @ S @ Vt
    if with_scale:
        var_s = jnp.einsum("n,ni->", w, xs * xs)
        s = jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.asarray(1.0, pts_src.dtype)
    t = mu_d - s * (R @ mu_s)
    return lie.rt_to_se3(s * R, t)


def _sample_valid_triples(
    valid: jax.Array, key: jax.Array, num_hyp: int
) -> jax.Array:
    """(H, 3) index triples drawn from the VALID rows only.

    Uniform sampling over the padded table makes a fully-valid triple
    vanishingly rare once matches are sparse (150 valid of 2000 rows =>
    p ~ 4e-4 per triple): the round-4 loop verifier effectively never saw a
    real hypothesis.  The reference samples from its match VECTOR
    (`Sim3Solver::iterate` draws from mvAllIndices, `src/Sim3Solver.cc:140`);
    this is the fixed-shape equivalent — valid rows first via a stable sort,
    draws modulo the valid count."""
    N = valid.shape[0]
    order = jnp.argsort(jnp.where(valid, 0, 1))  # jnp.argsort is stable
    V = jnp.maximum(jnp.sum(valid), 1)
    r = jax.random.randint(key, (num_hyp, 3), 0, N) % V
    return order[r]


class Sim3RansacResult(NamedTuple):
    T_ds: jax.Array  # (4, 4) dst <- src similarity
    inliers: jax.Array  # (N,) bool
    num_inliers: jax.Array  # int32
    ok: jax.Array  # bool


@partial(jax.jit, static_argnames=("num_hyp", "with_scale"))
def ransac_sim3(
    pts_src: jax.Array,
    pts_dst: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    num_hyp: int = 128,
    inlier_th: float = 0.10,
    min_inliers: int = 12,
    with_scale: bool = True,
) -> Sim3RansacResult:
    """Batched-hypothesis RANSAC Sim3: fixed H minimal triples, one scoring
    pass, Horn refinement on the winner's inliers."""
    idx = _sample_valid_triples(valid, key, num_hyp)

    def hyp(tri):
        w = jnp.ones(3, pts_src.dtype)
        return horn_alignment(pts_src[tri], pts_dst[tri], w, with_scale)

    Ts = jax.vmap(hyp)(idx)  # (H, 4, 4)
    ok_hyp = valid[idx].all(axis=-1) & (jnp.sum(valid) >= 3)
    pred = jnp.einsum("hij,nj->hni", Ts[:, :3, :3], pts_src) + Ts[:, None, :3, 3]
    err = jnp.linalg.norm(pred - pts_dst[None], axis=-1)  # (H, N)
    inl = (err < inlier_th) & valid[None, :]
    score = jnp.where(ok_hyp, jnp.sum(inl, axis=-1), -1)
    best = jnp.argmax(score)

    w_best = inl[best].astype(pts_src.dtype)
    T_ref = horn_alignment(pts_src, pts_dst, w_best, with_scale)
    pred_r = lie.transform_points(T_ref, pts_src[None])[0]
    inliers = (jnp.linalg.norm(pred_r - pts_dst, axis=-1) < inlier_th) & valid
    n = jnp.sum(inliers)
    return Sim3RansacResult(
        T_ds=T_ref, inliers=inliers, num_inliers=n, ok=n >= min_inliers
    )


@partial(jax.jit, static_argnames=("with_scale", "chi2"))
def sim3_image_inliers(
    T: jax.Array,
    pts_src: jax.Array,
    pts_dst: jax.Array,
    uv_src: jax.Array,
    uv_dst: jax.Array,
    sigma2_src: jax.Array,
    sigma2_dst: jax.Array,
    valid: jax.Array,
    intr,
    with_scale: bool = False,
    chi2: float = 9.21,
) -> jax.Array:
    """(N,) bool — the `Sim3Solver::CheckInliers` two-sided image gate for a
    given transform (shared by RANSAC scoring and post-refinement recount)."""
    inv = lie.inv_sim3 if with_scale else lie.inv_se3
    p_dst = lie.transform_points(T, pts_src[None])[0]
    uv1, z1 = project(p_dst, intr)
    e1 = jnp.sum((uv1 - uv_dst) ** 2, axis=-1)
    p_src = lie.transform_points(inv(T), pts_dst[None])[0]
    uv2, z2 = project(p_src, intr)
    e2 = jnp.sum((uv2 - uv_src) ** 2, axis=-1)
    return (
        (e1 < chi2 * sigma2_dst) & (e2 < chi2 * sigma2_src)
        & (z1 > 0) & (z2 > 0) & valid
    )


@partial(jax.jit, static_argnames=("with_scale", "iters"))
def refine_sim3_reproj(
    T0: jax.Array,  # (4, 4) initial dst <- src similarity
    pts_src: jax.Array,  # (N, 3)
    pts_dst: jax.Array,  # (N, 3)
    uv_src: jax.Array,  # (N, 2)
    uv_dst: jax.Array,  # (N, 2)
    sigma2_src: jax.Array,  # (N,)
    sigma2_dst: jax.Array,  # (N,)
    weights: jax.Array,  # (N,) >= 0 — inlier mask / weights
    intr,
    with_scale: bool = False,
    iters: int = 10,
) -> jax.Array:
    """Gauss-Newton Sim3 polish minimizing REPROJECTION error in both frames.

    Parity: `Optimizer::OptimizeSim3` (`src/Optimizer.cc:1100`) — the
    reference never ships the Horn solution into the pose graph; it
    re-optimizes the Sim3 against the two-sided image residuals.  The Horn
    3D least-squares is dominated by far points whose stereo depth noise is
    meters; image-space GN restores the loop edge to sub-pixel consistency
    (a ~0.5 m loop-edge error DISTORTS the corrected chain more than the
    drift it removes on short circuits — measured on the miniature-circuit
    regression).

    Parameters: delta in se(3) (+ log-scale when `with_scale`), applied as
    T = exp(delta) @ T0.  Damped GN with accept-if-better, fixed trip count.
    """
    P = 7 if with_scale else 6
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    isig_d = jnp.sqrt(w / sigma2_dst)
    isig_s = jnp.sqrt(w / sigma2_src)

    def apply_T(p):
        T = lie.exp_se3(p[:6]) @ T0
        if with_scale:
            T = T.at[:3, :3].multiply(jnp.exp(p[6]))
        return T

    def residuals(p):
        T = apply_T(p)
        pd = lie.transform_points(T, pts_src[None])[0]
        uv1, z1 = project(pd, intr)
        r1 = (uv1 - uv_dst) * isig_d[:, None] * (z1 > 0.0)[:, None]
        Ti = lie.inv_sim3(T) if with_scale else lie.inv_se3(T)
        ps = lie.transform_points(Ti, pts_dst[None])[0]
        uv2, z2 = project(ps, intr)
        r2 = (uv2 - uv_src) * isig_s[:, None] * (z2 > 0.0)[:, None]
        return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

    def cost(p):
        r = residuals(p)
        return jnp.sum(r * r)

    def step(carry, _):
        p, lam, c = carry
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)  # (4N, P)
        H = J.T @ J + lam * jnp.eye(P, dtype=r.dtype)
        delta = jnp.linalg.solve(H, -(J.T @ r))
        p_try = p + delta
        c_try = cost(p_try)
        ok = c_try < c
        return (
            jnp.where(ok, p_try, p),
            jnp.clip(jnp.where(ok, lam * 0.33, lam * 3.0), 1e-9, 1e3),
            jnp.where(ok, c_try, c),
        ), None

    p0 = jnp.zeros(P, pts_src.dtype)
    (p_fin, _, _), _ = jax.lax.scan(
        step, (p0, jnp.asarray(1e-4, pts_src.dtype), cost(p0)), None,
        length=iters,
    )
    return apply_T(p_fin)


@partial(jax.jit, static_argnames=("num_hyp", "with_scale", "chi2"))
def ransac_sim3_reproj(
    pts_src: jax.Array,  # (N, 3) camera-frame points in the SRC frame
    pts_dst: jax.Array,  # (N, 3) camera-frame points in the DST frame
    uv_src: jax.Array,  # (N, 2) pixel observation of each pair in SRC image
    uv_dst: jax.Array,  # (N, 2) pixel observation of each pair in DST image
    sigma2_src: jax.Array,  # (N,) octave variance scale of the SRC keypoint
    sigma2_dst: jax.Array,  # (N,) octave variance scale of the DST keypoint
    valid: jax.Array,
    key: jax.Array,
    intr,
    num_hyp: int = 256,
    chi2: float = 9.21,
    min_inliers: int = 12,
    with_scale: bool = True,
) -> Sim3RansacResult:
    """RANSAC Sim3 with the reference's IMAGE-SPACE inlier model.

    Parity: `Sim3Solver::CheckInliers` (`src/Sim3Solver.cc:226-280`) — a
    match is an inlier only when the SRC point projected through T into the
    DST image lands within chi2 * sigma2 of its DST pixel AND the DST point
    projected through T^-1 lands within chi2 * sigma2 of its SRC pixel
    (`mvnMaxError1/2 = 9.210 * sigma2`, set per keypoint octave at :76-107).

    A metric 3D threshold (the round-4 gate) is unsatisfiable at driving
    ranges: stereo depth noise grows as z^2/(bf) (~1 m at 30 m on KITTI
    geometry), but that error lies ALONG the viewing ray, so its image-space
    footprint stays within a few pixels — exactly what this model measures.
    Hypotheses remain Horn minimal triples on the 3D pairs (as the
    reference), only scoring moves to the image.
    """
    inv = lie.inv_sim3 if with_scale else lie.inv_se3
    max1 = chi2 * sigma2_dst  # forward: src -> dst image
    max2 = chi2 * sigma2_src  # backward: dst -> src image

    def count_inliers(T):
        p_dst = lie.transform_points(T, pts_src[None])[0]
        uv1, z1 = project(p_dst, intr)
        e1 = jnp.sum((uv1 - uv_dst) ** 2, axis=-1)
        p_src = lie.transform_points(inv(T), pts_dst[None])[0]
        uv2, z2 = project(p_src, intr)
        e2 = jnp.sum((uv2 - uv_src) ** 2, axis=-1)
        return (e1 < max1) & (e2 < max2) & (z1 > 0) & (z2 > 0) & valid

    idx = _sample_valid_triples(valid, key, num_hyp)

    def hyp(tri):
        w = jnp.ones(3, pts_src.dtype)
        return horn_alignment(pts_src[tri], pts_dst[tri], w, with_scale)

    Ts = jax.vmap(hyp)(idx)  # (H, 4, 4)
    ok_hyp = (
        valid[idx].all(axis=-1)
        & (jnp.sum(valid) >= 3)
        & jnp.all(jnp.isfinite(Ts), axis=(1, 2))
    )
    inl = jax.vmap(count_inliers)(Ts)  # (H, N)
    score = jnp.where(ok_hyp, jnp.sum(inl, axis=-1), -1)
    best = jnp.argmax(score)

    # Horn refinement on the winner's inlier set (3D least squares), then a
    # final image-space recount; keep whichever of (refined, winner) counts
    # more — refinement over noisy far points can diverge.
    w_best = inl[best].astype(pts_src.dtype)
    T_ref = horn_alignment(pts_src, pts_dst, w_best, with_scale)
    inl_ref = count_inliers(T_ref)
    better = jnp.sum(inl_ref) > score[best]
    T_fin = jnp.where(better, T_ref, Ts[best])
    inliers = jnp.where(better, inl_ref, inl[best]) & (score[best] > 0)
    n = jnp.sum(inliers)
    return Sim3RansacResult(
        T_ds=T_fin, inliers=inliers, num_inliers=n,
        ok=(n >= min_inliers) & (score[best] > 0),
    )
