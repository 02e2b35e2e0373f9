"""KITTI odometry dataset reader (stereo + LiDAR).

Parity: the KITTI loading of `qsp_slam.cc` + `reconstruct/kitti_sequence.py`
(`load_calib` `:244-258`, velodyne crop/sampling `:114-159`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


def load_calib(path: str) -> dict:
    """Parse calib.txt: P0..P3 (3x4) + Tr (velodyne->cam0)."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            vals = np.array([float(x) for x in v.split()], np.float32)
            out[k.strip()] = vals.reshape(3, 4)
    return out


@dataclass
class KittiSequence:
    """Stereo + velodyne frame server for one odometry sequence."""

    root: str  # .../sequences/NN
    poses_file: str | None = None  # .../poses/NN.txt
    calib: dict = field(init=False)
    times: np.ndarray = field(init=False)
    poses: np.ndarray | None = field(init=False)  # (F, 4, 4) T_wc (cam0)

    def __post_init__(self):
        self.calib = load_calib(os.path.join(self.root, "calib.txt"))
        self.times = np.loadtxt(os.path.join(self.root, "times.txt"), np.float64)
        self.poses = None
        if self.poses_file and os.path.exists(self.poses_file):
            P = np.loadtxt(self.poses_file, np.float32).reshape(-1, 3, 4)
            self.poses = np.concatenate(
                [P, np.tile(np.array([[[0, 0, 0, 1]]], np.float32), (len(P), 1, 1))],
                axis=1,
            )

    @property
    def intrinsics(self):
        P0 = self.calib["P0"]
        return dict(fx=P0[0, 0], fy=P0[1, 1], cx=P0[0, 2], cy=P0[1, 2])

    @property
    def baseline(self) -> float:
        """Stereo baseline in meters: -P1[0,3]/fx."""
        return float(-self.calib["P1"][0, 3] / self.calib["P1"][0, 0])

    def __len__(self) -> int:
        return len(self.times)

    def load_gray_pair(self, idx: int):
        from .native_loader import load_png

        l = os.path.join(self.root, "image_0", f"{idx:06d}.png")
        r = os.path.join(self.root, "image_1", f"{idx:06d}.png")
        gl, gr = load_png(l), load_png(r)  # native C++ decode (None -> PIL)
        if gl is None or gr is None:
            from PIL import Image

            gl = np.asarray(Image.open(l).convert("L"), np.float32)
            gr = np.asarray(Image.open(r).convert("L"), np.float32)
        return gl, gr

    def prefetch_pairs(self, indices, threads: int = 2, lookahead: int = 4):
        """Yield (gray_left, gray_right) for `indices`, decoding ahead on
        the native worker pool (PIL fallback per frame)."""
        from .native_loader import FramePrefetcher

        indices = list(indices)
        pairs = [
            (
                os.path.join(self.root, "image_0", f"{i:06d}.png"),
                os.path.join(self.root, "image_1", f"{i:06d}.png"),
            )
            for i in indices
        ]
        pf = FramePrefetcher(pairs, 1.0, threads, lookahead)
        try:
            for pos, i in enumerate(indices):
                got = pf.get(pos)
                yield got if got is not None else self.load_gray_pair(i)
        finally:
            pf.close()

    def load_velodyne(self, idx: int, max_points: int | None = None) -> np.ndarray:
        """Load velodyne scan (N, 4) [x, y, z, reflectance], cam0 frame ready
        via `transform_velo_to_cam`."""
        path = os.path.join(self.root, "velodyne", f"{idx:06d}.bin")
        pts = np.fromfile(path, np.float32).reshape(-1, 4)
        if max_points is not None and len(pts) > max_points:
            sel = np.random.default_rng(idx).choice(len(pts), max_points, replace=False)
            pts = pts[sel]
        return pts

    def transform_velo_to_cam(self, pts: np.ndarray) -> np.ndarray:
        """(N, 4) velodyne points -> (N, 3) cam0-frame points."""
        Tr = self.calib["Tr"]
        return pts[:, :3] @ Tr[:3, :3].T + Tr[:3, 3]
