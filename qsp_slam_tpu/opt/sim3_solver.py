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
    N = pts_src.shape[0]
    idx = jax.random.randint(key, (num_hyp, 3), 0, N)

    def hyp(tri):
        w = jnp.ones(3, pts_src.dtype)
        return horn_alignment(pts_src[tri], pts_dst[tri], w, with_scale)

    Ts = jax.vmap(hyp)(idx)  # (H, 4, 4)
    ok_hyp = valid[idx].all(axis=-1)
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
