"""Dense RGB-D map builder: per-frame clouds, voxel-filtered global map.

Parity: `src/dense_builder/` (`Builder::processFrame/voxelFilter/saveMap`,
`builder.h:27-58`) — a visualization/export product, not part of the
estimation path.  Per-frame unprojection runs on-device; the voxel hash
dedup is host-side numpy (irregular), matching the reference's role of PCL.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics
from .groundplane import depth_to_cloud


@dataclass
class DenseBuilder:
    intr: Intrinsics
    voxel: float = 0.05
    stride: int = 4
    max_points: int = 2_000_000
    _voxels: dict = field(default_factory=dict)

    def process_frame(self, gray, depth, T_cw) -> None:
        """Unproject one frame and merge into the voxel map."""
        pts_c, valid = depth_to_cloud(jnp.asarray(depth), self.intr, self.stride)
        T_wc = lie.inv_se3(jnp.asarray(T_cw))
        pts_w = np.asarray(lie.transform_points(T_wc, pts_c[None])[0])
        ok = np.asarray(valid)
        g = np.asarray(gray)[:: self.stride, :: self.stride].reshape(-1)
        pts_w, g = pts_w[ok], g[ok]
        keys = np.floor(pts_w / self.voxel).astype(np.int64)
        flat = (keys[:, 0] << 42) ^ (keys[:, 1] << 21) ^ keys[:, 2]
        for k, p, c in zip(flat, pts_w, g):
            if k not in self._voxels and len(self._voxels) < self.max_points:
                self._voxels[int(k)] = (p, c)

    @property
    def num_points(self) -> int:
        return len(self._voxels)

    def cloud(self):
        """(N, 3) points + (N,) gray values."""
        if not self._voxels:
            return np.zeros((0, 3), np.float32), np.zeros(0, np.float32)
        pts = np.stack([v[0] for v in self._voxels.values()])
        g = np.array([v[1] for v in self._voxels.values()])
        return pts.astype(np.float32), g.astype(np.float32)

    def save_ply(self, path: str) -> None:
        from ..viz.export import save_ply_points

        pts, g = self.cloud()
        colors = np.stack([g, g, g], axis=-1).clip(0, 255).astype(np.uint8)
        save_ply_points(path, pts, colors)
