"""Headless FrameDrawer: annotated per-frame PNG artifacts.

Parity: `src/FrameDrawer.cc:1` draws keypoints, tracked matches, detection
boxes and a status bar into a live GL window.  The TPU deployment is
headless, so the same information is rendered into PNG files instead
(enable with `--save-frames` on the dataset CLIs): tracked keypoints in
green, untracked in gray, detection bboxes with label/score, and a status
line (frame id, state, inliers, keyframes, objects).
"""

from __future__ import annotations

import os

import numpy as np

# Label palette (RGB) — cycled for labels beyond the table.
_COLORS = [
    (66, 133, 244), (219, 68, 55), (244, 180, 0), (15, 157, 88),
    (171, 71, 188), (0, 172, 193),
]


def annotate_frame(
    gray: np.ndarray,
    kp_xy: np.ndarray | None = None,
    kp_tracked: np.ndarray | None = None,
    bboxes: np.ndarray | None = None,
    labels: np.ndarray | None = None,
    probs: np.ndarray | None = None,
    bbox_valid: np.ndarray | None = None,
    status: str = "",
):
    """Compose an annotated RGB frame (returns a PIL.Image)."""
    from PIL import Image, ImageDraw

    g = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
    img = Image.fromarray(np.stack([g, g, g], -1))
    draw = ImageDraw.Draw(img)

    if kp_xy is not None:
        kp_xy = np.asarray(kp_xy)
        tracked = (
            np.asarray(kp_tracked)
            if kp_tracked is not None
            else np.zeros(len(kp_xy), bool)
        )
        for (x, y), t in zip(kp_xy, tracked):
            if x <= 0 and y <= 0:
                continue  # padding slot
            color = (0, 230, 80) if t else (150, 150, 150)
            r = 2 if t else 1
            draw.rectangle([x - r, y - r, x + r, y + r], outline=color)

    if bboxes is not None:
        bboxes = np.asarray(bboxes)
        n = len(bboxes)
        valid = (
            np.asarray(bbox_valid) if bbox_valid is not None
            else np.ones(n, bool)
        )
        labels = np.asarray(labels) if labels is not None else np.zeros(n, int)
        probs = np.asarray(probs) if probs is not None else np.ones(n)
        for b, l, p, v in zip(bboxes, labels, probs, valid):
            if not v:
                continue
            c = _COLORS[int(l) % len(_COLORS)]
            draw.rectangle([b[0], b[1], b[2], b[3]], outline=c, width=2)
            draw.text((b[0] + 2, max(b[1] - 11, 0)), f"{int(l)}:{p:.2f}", fill=c)

    if status:
        draw.rectangle([0, img.height - 14, img.width, img.height],
                       fill=(0, 0, 0))
        draw.text((4, img.height - 13), status, fill=(255, 255, 255))
    return img


def save_annotated(path: str, *args, **kwargs) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    annotate_frame(*args, **kwargs).save(path)


def frame_status(system, frame_idx: int) -> str:
    """One-line tracker status (the FrameDrawer text bar)."""
    n_obj = int(np.asarray(system.objects.valid).sum())
    return (
        f"f{frame_idx} {'OK' if system.initialized else 'INIT'} "
        f"kfs={system.stats['keyframes']} pts={int(system.map_state.num_pts)} "
        f"objs={n_obj} loops={system.loops_closed}"
    )
