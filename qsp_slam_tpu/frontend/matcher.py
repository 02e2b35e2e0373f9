"""Descriptor matching as MXU matmuls.

Replaces the serial Hamming search strategies of `ORBmatcher`
(`src/ORBmatcher.cc`): with ±1 int8 descriptors, hamming(a, b) =
(256 - <a, b>) / 2, so an entire A x B candidate search is ONE int8 matmul
feeding the systolic array — windowed searches become masked matmuls.
Rotation-histogram consistency (`ORBmatcher::ComputeThreeMaxima` semantics)
is a bincount + top-3 mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .orb import DESC_BITS

TH_LOW = 50  # reference ORBmatcher::TH_LOW
TH_HIGH = 100  # reference ORBmatcher::TH_HIGH
HISTO_BINS = 30

_BIG = jnp.int32(1 << 20)


def hamming_matrix(pm_a: jax.Array, pm_b: jax.Array) -> jax.Array:
    """Pairwise Hamming distances via int8 matmul. (A, 256),(B, 256) -> (A, B)."""
    dots = jax.lax.dot_general(
        pm_a,
        pm_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (DESC_BITS - dots) // 2


class MatchResult(NamedTuple):
    idx: jax.Array  # (A,) int32 — best column per row (-1 if none)
    dist: jax.Array  # (A,) int32 — its Hamming distance
    valid: jax.Array  # (A,) bool


def masked_best_match(
    dist: jax.Array,
    mask: jax.Array,
    max_dist: int = TH_LOW,
    ratio: float = 1.0,
) -> MatchResult:
    """Best (and optional Lowe-ratio-checked second-best) match per row.

    dist (A, B) int32; mask (A, B) bool — candidate gate (window, octave...).
    """
    d = jnp.where(mask, dist, _BIG)
    best = jnp.argmin(d, axis=1)
    dbest = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best].set(_BIG)
    dsecond = jnp.min(d2, axis=1)
    ok = (dbest <= max_dist) & (
        dbest.astype(jnp.float32) <= ratio * dsecond.astype(jnp.float32)
    )
    return MatchResult(
        idx=jnp.where(ok, best.astype(jnp.int32), -1),
        dist=dbest,
        valid=ok,
    )


def rotation_consistency(
    angle_a: jax.Array, angle_b: jax.Array, valid: jax.Array
) -> jax.Array:
    """Keep only matches whose angle difference falls in the 3 dominant bins.

    Parity: the rotation histogram of every `ORBmatcher::SearchBy*` routine.
    """
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(angle_a - angle_b, two_pi)
    bins = jnp.clip((rot * (HISTO_BINS / two_pi)).astype(jnp.int32), 0, HISTO_BINS - 1)
    counts = jnp.bincount(jnp.where(valid, bins, HISTO_BINS), length=HISTO_BINS + 1)[
        :HISTO_BINS
    ]
    top3 = jax.lax.top_k(counts, 3)[1]
    in_top = (bins[:, None] == top3[None, :]).any(axis=1)
    return valid & in_top


def search_by_projection(
    proj_uv: jax.Array,
    proj_valid: jax.Array,
    proj_desc_pm: jax.Array,
    proj_octave: jax.Array,
    feat_xy: jax.Array,
    feat_valid: jax.Array,
    feat_desc_pm: jax.Array,
    feat_octave: jax.Array,
    radius_per_row: jax.Array,
    max_dist: int = TH_HIGH,
    octave_window: int = 1,
    ratio: float = 0.9,
) -> MatchResult:
    """Windowed projection search (parity: `ORBmatcher::SearchByProjection`,
    `src/ORBmatcher.cc:45,1328`): for each projected map point, match against
    keypoints inside a pixel radius and an octave window.
    """
    d2 = jnp.sum((proj_uv[:, None, :] - feat_xy[None, :, :]) ** 2, axis=-1)
    window = d2 <= (radius_per_row[:, None] ** 2)
    oct_ok = jnp.abs(proj_octave[:, None] - feat_octave[None, :]) <= octave_window
    mask = window & oct_ok & proj_valid[:, None] & feat_valid[None, :]
    dist = hamming_matrix(proj_desc_pm, feat_desc_pm)
    return masked_best_match(dist, mask, max_dist=max_dist, ratio=ratio)


def mutual_match(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    max_dist: int = TH_LOW,
    ratio: float = 0.9,
    pair_mask: jax.Array | None = None,
) -> MatchResult:
    """Mutual-best matching (used by initialization / triangulation search).

    `pair_mask` (A, B) restricts the candidate set per pair — the TPU shape
    of the reference's candidate-pruning strategies (epipolar gate in
    `SearchForTriangulation`, shared-word buckets in `SearchByBoW`): instead
    of iterating a reduced candidate list, the full distance matrix is
    computed on the MXU and the gate is applied as a mask before argmin.
    """
    dist = hamming_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    if pair_mask is not None:
        mask = mask & pair_mask
    fwd = masked_best_match(dist, mask, max_dist=max_dist, ratio=ratio)
    bwd = masked_best_match(dist.T, mask.T, max_dist=max_dist, ratio=ratio)
    a_idx = jnp.arange(desc_a.shape[0], dtype=jnp.int32)
    mutual = fwd.valid & (jnp.take(bwd.idx, jnp.clip(fwd.idx, 0), axis=0) == a_idx)
    return MatchResult(
        idx=jnp.where(mutual, fwd.idx, -1), dist=fwd.dist, valid=mutual
    )


def epipolar_mask(
    uv_a: jax.Array,  # (A, 2) pixels in camera 1
    uv_b: jax.Array,  # (B, 2) pixels in camera 2
    T_21: jax.Array,  # (4, 4) cam1 -> cam2
    intr,
    octave_b: jax.Array | None = None,
    scale_factor: float = 1.2,
    chi2: float = 3.84,
    sigma_px: float = 1.0,
) -> jax.Array:
    """(A, B) epipolar-consistency gate for triangulation matching.

    Parity: `ORBmatcher::CheckDistEpipolarLine` inside
    `SearchForTriangulation` (`src/ORBmatcher.cc:657,747`): a candidate in
    image 2 must lie within chi2*sigma(octave) of the epipolar line of the
    image-1 feature.  F21 = K^-T [t]x R K^-1.
    """
    R = T_21[:3, :3]
    t = T_21[:3, 3]
    tx = jnp.array(
        [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]],
        uv_a.dtype,
    )
    K = intr.K
    Kinv = jnp.linalg.inv(K)
    F21 = Kinv.T @ tx @ R @ Kinv
    xa = jnp.concatenate([uv_a, jnp.ones((uv_a.shape[0], 1), uv_a.dtype)], -1)
    lines = xa @ F21.T  # (A, 3) epipolar lines in image 2
    xb = jnp.concatenate([uv_b, jnp.ones((uv_b.shape[0], 1), uv_b.dtype)], -1)
    num = jnp.abs(lines @ xb.T)  # (A, B)
    den = jnp.sqrt(
        jnp.maximum(lines[:, 0] ** 2 + lines[:, 1] ** 2, 1e-12)
    )[:, None]
    d = num / den
    sigma2 = sigma_px ** 2
    if octave_b is not None:
        sigma2 = sigma2 * (scale_factor ** octave_b.astype(uv_a.dtype)) ** 2
        sigma2 = sigma2[None, :]
    return (d * d) < (chi2 * sigma2)


def word_mask(word_a: jax.Array, word_b: jax.Array) -> jax.Array:
    """(A, B) shared-vocabulary-word gate — `SearchByBoW`'s bucket structure
    (`src/ORBmatcher.cc:159,522`) as a mask: only features quantized to the
    same word may match, which suppresses aliased matches under repeated
    texture (the speed role of the buckets is already covered by the MXU
    distance matmul)."""
    return word_a[:, None] == word_b[None, :]


def resolve_duplicates(match: MatchResult, num_targets: int) -> MatchResult:
    """Ensure each target column is claimed by at most one row (lowest dist).

    The reference enforces this with bookkeeping inside its loops; here it's a
    segment-min followed by an equality check.
    """
    tgt = jnp.where(match.valid, match.idx, num_targets)
    best_per_tgt = jax.ops.segment_min(
        match.dist, tgt, num_segments=num_targets + 1
    )
    keep = match.valid & (match.dist <= jnp.take(best_per_tgt, tgt, axis=0))
    # Among equal-distance claimants keep the lowest row index.
    rows = jnp.arange(match.idx.shape[0], dtype=jnp.int32)
    first_row = jax.ops.segment_min(
        jnp.where(keep, rows, jnp.int32(1 << 30)), tgt, num_segments=num_targets + 1
    )
    keep = keep & (rows == jnp.take(first_row, tgt, axis=0))
    return MatchResult(
        idx=jnp.where(keep, match.idx, -1), dist=match.dist, valid=keep
    )
