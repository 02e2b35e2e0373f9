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
