"""Stereo left-right feature matching -> per-keypoint disparity/depth.

Parity: the stereo matching of `Frame::ComputeStereoMatches` (`src/Frame.cc`)
— for each left keypoint, search right keypoints on the same scanline band,
Hamming-best match, then SAD sliding-window SUBPIXEL refinement with a
parabola fit (the reference's 11x11 window scanned +-L with best-vs-median
pruning).  One masked int8 matmul replaces the per-row candidate loops; the
refinement is a vmapped dynamic-slice gather + one (F, 2R+1) SAD argmin.

Keypoint localization alone is only pixel-accurate: disparity error of
~1.5 px at 20 m on a KITTI-geometry rig (bf ~ 195) is a ~3 m depth error,
which poisons the map (measured round 3: median depth error 2.4 m without
refinement, 0.06 m with it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .matcher import TH_HIGH, hamming_matrix
from .orb import Features

_W = 5  # SAD half-window (11 x 11 patch, reference's w)
_R = 5  # subpixel scan range (+- px, reference's L)


def _subpixel_refine(gray_l, gray_r, xy_l, u_r0):
    """Per-feature SAD scan of the right image around the coarse match.

    Returns (u_r refined, valid) — valid is False where the SAD minimum sits
    on the scan boundary (no bracketed parabola) or the patch leaves the
    image.  All coordinates are full-resolution pixels.
    """
    H, W = gray_l.shape

    def one(xy, ur):
        xi = jnp.round(xy[0]).astype(jnp.int32)
        yi = jnp.round(xy[1]).astype(jnp.int32)
        ri = jnp.round(ur).astype(jnp.int32)
        in_img = (
            (yi >= _W) & (yi < H - _W)
            & (xi >= _W) & (xi < W - _W)
            & (ri >= _W + _R) & (ri < W - _W - _R)
        )
        yc = jnp.clip(yi - _W, 0, H - (2 * _W + 1))
        xc = jnp.clip(xi - _W, 0, W - (2 * _W + 1))
        rc = jnp.clip(ri - _W - _R, 0, W - (2 * _W + 2 * _R + 1))
        patch = jax.lax.dynamic_slice(gray_l, (yc, xc), (2 * _W + 1, 2 * _W + 1))
        strip = jax.lax.dynamic_slice(
            gray_r, (yc, rc), (2 * _W + 1, 2 * _W + 2 * _R + 1)
        )
        # SAD at each shift s in [-R, R].
        sads = jnp.stack(
            [
                jnp.sum(jnp.abs(patch - jax.lax.dynamic_slice_in_dim(
                    strip, s, 2 * _W + 1, axis=1)))
                for s in range(2 * _R + 1)
            ]
        )
        b = jnp.argmin(sads)
        interior = (b > 0) & (b < 2 * _R)
        bi = jnp.clip(b, 1, 2 * _R - 1)
        s_m, s_0, s_p = sads[bi - 1], sads[bi], sads[bi + 1]
        denom = s_m - 2.0 * s_0 + s_p
        delta = jnp.where(
            jnp.abs(denom) > 1e-6, 0.5 * (s_m - s_p) / denom, 0.0
        )
        delta = jnp.clip(delta, -1.0, 1.0)
        u_ref = ri.astype(jnp.float32) + (bi.astype(jnp.float32) - _R) + delta
        return jnp.where(in_img & interior, u_ref, ur), in_img & interior, s_0

    return jax.vmap(one)(xy_l, u_r0)


@partial(jax.jit, static_argnames=())
def match_stereo(
    left: Features,
    right: Features,
    baseline_fx: jax.Array | float,
    min_depth: float = 0.3,
    max_depth: float = 80.0,
    row_tol: float = 2.0,
    max_dist: int = TH_HIGH,
    gray_left: jax.Array | None = None,
    gray_right: jax.Array | None = None,
) -> jax.Array:
    """Returns u_right (F,) for left features (-1 where unmatched).

    Scanline gate scales with the left keypoint's octave (pyramid blur).
    When the images are provided, each coarse match is refined to subpixel
    by the SAD scan above; coarse-only matches that cannot be refined are
    DROPPED (their pixel-quantized disparity is a multi-meter depth error
    at driving ranges — worse than no depth)."""
    dist = hamming_matrix(left.desc_pm, right.desc_pm)  # (L, R)
    dv = jnp.abs(left.xy[:, None, 1] - right.xy[None, :, 1])
    tol = row_tol * 1.2 ** left.octave.astype(jnp.float32)
    disp = left.xy[:, None, 0] - right.xy[None, :, 0]
    min_disp = baseline_fx / max_depth
    max_disp = baseline_fx / min_depth
    gate = (
        (dv <= tol[:, None])
        & (disp > min_disp)
        & (disp < max_disp)
        & left.valid[:, None]
        & right.valid[None, :]
        & (jnp.abs(left.octave[:, None] - right.octave[None, :]) <= 1)
    )
    d = jnp.where(gate, dist, 1 << 20)
    best = jnp.argmin(d, axis=1)
    dbest = jnp.take_along_axis(d, best[:, None], 1)[:, 0]
    ok = dbest <= max_dist
    u_r = right.xy[best, 0]
    if gray_left is not None and gray_right is not None:
        u_ref, refined, sad = _subpixel_refine(
            jnp.asarray(gray_left, jnp.float32),
            jnp.asarray(gray_right, jnp.float32),
            left.xy, u_r,
        )
        u_r = u_ref
        ok = ok & refined
        # Median-SAD outlier prune (`Frame::ComputeStereoMatches` drops
        # matches with bestDist >= 1.5 * 1.4 * median): a wrong coarse match
        # lands at a spuriously LARGE disparity = small depth, exactly what
        # closest-first map-point creation would then prefer.
        sad_med = jnp.nanmedian(jnp.where(ok, sad, jnp.nan))
        ok = ok & (sad < 1.5 * 1.4 * jnp.where(jnp.isnan(sad_med), jnp.inf, sad_med))
        # Disparity re-gate after refinement (the parabola can step across
        # the min-disparity bound).
        disp_r = left.xy[:, 0] - u_r
        ok = ok & (disp_r > min_disp) & (disp_r < max_disp)
    return jnp.where(ok, u_r, -1.0)


def depth_from_u_right(u: jax.Array, u_right: jax.Array, baseline_fx) -> jax.Array:
    """Depth = bf / disparity; 0 where unmatched."""
    disp = u - u_right
    ok = (u_right >= 0) & (disp > 1e-3)
    return jnp.where(ok, baseline_fx / jnp.where(ok, disp, 1.0), 0.0)
