"""Stereo left-right feature matching -> per-keypoint disparity/depth.

Parity: the stereo matching of `Frame::ComputeStereoMatches` (`src/Frame.cc`)
— for each left keypoint, search right keypoints on the same scanline band,
Hamming-best match, disparity -> depth via bf.  One masked int8 matmul
replaces the per-row candidate loops (same pattern as frontend.matcher).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .matcher import TH_HIGH, hamming_matrix
from .orb import Features


@partial(jax.jit, static_argnames=())
def match_stereo(
    left: Features,
    right: Features,
    baseline_fx: jax.Array | float,
    min_depth: float = 0.3,
    max_depth: float = 80.0,
    row_tol: float = 2.0,
    max_dist: int = TH_HIGH,
) -> jax.Array:
    """Returns u_right (F,) for left features (-1 where unmatched).

    Scanline gate scales with the left keypoint's octave (pyramid blur).
    """
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
    return jnp.where(ok, u_r, -1.0)


def depth_from_u_right(u: jax.Array, u_right: jax.Array, baseline_fx) -> jax.Array:
    """Depth = bf / disparity; 0 where unmatched."""
    disp = u - u_right
    ok = (u_right >= 0) & (disp > 1e-3)
    return jnp.where(ok, baseline_fx / jnp.where(ok, disp, 1.0), 0.0)
