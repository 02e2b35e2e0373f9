"""TUM RGB-D dataset reader.

Parity: `src/tum_rgbd/io.h` (`TUMRGBD::Dataset`) + `scripts/associate.py`
(timestamp association of rgb/depth/groundtruth) + the association-file
loader of the RGB-D CLI (`qsp_slam_rgbd.cc:329-361`).  Pure-host code; image
decode via PIL (no OpenCV in this stack).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

DEPTH_SCALE = 5000.0  # TUM convention: depth_png / 5000 = meters


def parse_file_list(path: str) -> list[tuple[float, str]]:
    """Parse a TUM-style index file: lines of `timestamp path` (# comments)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def parse_trajectory(path: str) -> list[tuple[float, np.ndarray]]:
    """Parse groundtruth.txt: `t tx ty tz qx qy qz qw` -> list of (t, T_wc)."""
    from ..core import lie
    import jax.numpy as jnp

    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            t, tx, ty, tz = v[0], v[1], v[2], v[3]
            q = jnp.asarray(v[4:8], jnp.float32)  # qx qy qz qw
            R = np.asarray(lie.quat_to_rotmat(q))
            T_wc = np.eye(4, dtype=np.float32)
            T_wc[:3, :3] = R
            T_wc[:3, 3] = [tx, ty, tz]
            out.append((t, T_wc))
    return out


def associate(
    a: list[tuple[float, object]],
    b: list[tuple[float, object]],
    max_dt: float = 0.02,
) -> list[tuple[int, int]]:
    """Greedy nearest-timestamp association (scripts/associate.py semantics)."""
    pairs = []
    for i, (ta, _) in enumerate(a):
        best_j, best_dt = -1, max_dt
        for j, (tb, _) in enumerate(b):
            dt = abs(ta - tb)
            if dt < best_dt:
                best_j, best_dt = j, dt
        if best_j >= 0:
            pairs.append((i, best_j))
    used = set()
    out = []
    for i, j in pairs:
        if j not in used:
            used.add(j)
            out.append((i, j))
    return out


@dataclass
class TumSequence:
    """Iterates associated (gray, depth, timestamp, T_wc_gt) frames."""

    root: str
    rgb_list: list = field(init=False)
    depth_list: list = field(init=False)
    gt: list = field(init=False)
    frames: list = field(init=False)  # (t, rgb_path, depth_path, T_wc or None)

    def __post_init__(self):
        self.rgb_list = parse_file_list(os.path.join(self.root, "rgb.txt"))
        self.depth_list = parse_file_list(os.path.join(self.root, "depth.txt"))
        gt_path = os.path.join(self.root, "groundtruth.txt")
        self.gt = parse_trajectory(gt_path) if os.path.exists(gt_path) else []
        rd = associate(self.rgb_list, self.depth_list)
        self.frames = []
        for i, j in rd:
            t = self.rgb_list[i][0]
            T = None
            if self.gt:
                k = int(np.argmin([abs(t - tg) for tg, _ in self.gt]))
                if abs(self.gt[k][0] - t) < 0.05:
                    T = self.gt[k][1]
            self.frames.append(
                (t, self.rgb_list[i][1], self.depth_list[j][1], T)
            )

    def __len__(self) -> int:
        return len(self.frames)

    def _load_pil(self, rgb_rel: str, depth_rel: str):
        from PIL import Image

        rgb = np.asarray(
            Image.open(os.path.join(self.root, rgb_rel)).convert("L"), np.float32
        )
        depth = (
            np.asarray(Image.open(os.path.join(self.root, depth_rel)), np.float32)
            / DEPTH_SCALE
        )
        return rgb, depth

    def load(self, idx: int):
        """Returns (gray f32 (H, W), depth f32 meters (H, W), t, T_cw_gt|None).

        Decodes through the native C++ loader when available (bit-identical
        to the PIL path — see native/data_loader.cpp), else PIL.
        """
        from .native_loader import load_png

        t, rgb_rel, depth_rel, T_wc = self.frames[idx]
        rgb = load_png(os.path.join(self.root, rgb_rel), 1.0)
        depth = load_png(
            os.path.join(self.root, depth_rel), 1.0 / DEPTH_SCALE
        )
        if rgb is None or depth is None:
            rgb, depth = self._load_pil(rgb_rel, depth_rel)
        T_cw = None if T_wc is None else np.linalg.inv(T_wc).astype(np.float32)
        return rgb, depth, t, T_cw

    def prefetch_iter(
        self, indices: list[int], threads: int = 2, lookahead: int = 4
    ) -> Iterator:
        """Yield (gray, depth, t, T_cw_gt|None, frame_idx) for `indices`,
        decoding AHEAD on the native worker pool (the reference's reader
        overlap, `qsp_slam_rgbd.cc:224-326` loop + cv::imread).  Falls back
        to synchronous PIL decode per frame when native decode is off."""
        from .native_loader import FramePrefetcher

        pairs = [
            (
                os.path.join(self.root, self.frames[i][1]),
                os.path.join(self.root, self.frames[i][2]),
            )
            for i in indices
        ]
        pf = FramePrefetcher(pairs, 1.0 / DEPTH_SCALE, threads, lookahead)
        try:
            for pos, i in enumerate(indices):
                t, rgb_rel, depth_rel, T_wc = self.frames[i]
                got = pf.get(pos)
                if got is None:
                    gray, depth = self._load_pil(rgb_rel, depth_rel)
                else:
                    gray, depth = got
                T_cw = (
                    None if T_wc is None
                    else np.linalg.inv(T_wc).astype(np.float32)
                )
                yield gray, depth, t, T_cw, i
        finally:
            pf.close()

    def __iter__(self) -> Iterator:
        for i in range(len(self)):
            yield self.load(i)
