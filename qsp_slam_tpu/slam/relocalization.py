"""Relocalization: place query + descriptor match + PnP-RANSAC.

Parity: `Tracking::Relocalization` (`src/Tracking.cc:1589`) —
`DetectRelocalizationCandidates` (BoW) followed by EPnP-RANSAC and pose
optimization.  Reuses the loop-closing snapshot store as the keyframe
database (the reference reuses `KeyFrameDatabase` for both).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..frontend import matcher
from ..frontend.pnp import PnPResult, pnp_ransac
from .loop_closing import LoopState
from .place_recognition import bow_signature, query
from .tracking import FrameData, TrackingConfig


@partial(jax.jit, static_argnames=("cfg",))
def relocalize(
    ls: LoopState,
    kf_Tcw: jax.Array,  # (Kmax, 4, 4) current keyframe pose estimates
    frame: FrameData,
    cfg: TrackingConfig,
    key: jax.Array,
    score_min: float = 0.10,
) -> PnPResult:
    """Estimate the lost camera's pose against the best-scoring keyframe."""
    sig = bow_signature(frame.feats.desc_pm, frame.feats.valid)
    cand, score = query(ls.db, sig, exclude_recent=0)
    c = jnp.clip(cand, 0)

    m = matcher.mutual_match(
        ls.kf_desc[c], ls.kf_pts_ok[c],
        frame.feats.desc_pm, frame.feats.valid,
        max_dist=matcher.TH_LOW, ratio=0.85,
    )
    # Snapshot camera-frame points -> world via the keyframe's pose.
    T_wc = lie.inv_se3(kf_Tcw[c])
    pts_w = lie.transform_points(T_wc, ls.kf_pts_cam[c][None])[0]
    fidx = jnp.clip(m.idx, 0)
    uv = frame.feats.xy[fidx]
    res = pnp_ransac(
        pts_w, uv, m.valid & ls.kf_pts_ok[c], cfg.intr, key,
        center_hint=T_wc[:3, 3], max_center_dist=3.0,
    )
    ok = res.ok & (score > score_min)
    return PnPResult(
        Tcw=res.Tcw, inliers=res.inliers, num_inliers=res.num_inliers, ok=ok
    )
