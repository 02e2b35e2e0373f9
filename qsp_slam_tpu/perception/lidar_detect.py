"""LiDAR object proposals: ground removal + clustering -> 2D detections.

Stand-in for the reference's mmdetection3d wrapper (`reconstruct/
detector3d.py` — PointPillars/SECOND 3D boxes): with no learned detector in
this stack, objects are proposed geometrically — remove the ground plane,
cluster the remaining returns, keep car-sized clusters, and project them to
image bboxes in the detection-replay format.  Clustering is host-side
(irregular union-find), matching the role PCL plays in the reference; the
plane fit and projection run on-device.
"""

from __future__ import annotations

import numpy as np

from ..core.camera import Intrinsics


def _voxel_cluster(pts: np.ndarray, voxel: float = 0.5) -> np.ndarray:
    """Connected-component labels over occupied voxels (26-neighborhood).

    pts (N, 3) -> labels (N,) int (compacted, -1 never returned).
    """
    keys = np.floor(pts / voxel).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    V = len(uniq)
    parent = np.arange(V)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    index = {tuple(v): i for i, v in enumerate(uniq)}
    offs = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ]
    for i, v in enumerate(uniq):
        for o in offs:
            j = index.get((v[0] + o[0], v[1] + o[1], v[2] + o[2]))
            if j is not None:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[rb] = ra
    roots = np.array([find(i) for i in range(V)])
    _, compact = np.unique(roots, return_inverse=True)
    return compact[inv]


def lidar_detections(
    pts_cam: np.ndarray,  # (N, 3) LiDAR points in the camera frame
    intr: Intrinsics,
    width: int,
    height: int,
    ground_margin: float = 0.25,
    voxel: float = 0.5,
    min_pts: int = 40,
    size_range=((0.8, 0.8, 1.5), (6.0, 3.0, 8.0)),
    max_dets: int = 8,
    camera_up_hint=(0.0, -1.0, 0.0),
) -> dict:
    """Geometric 3D proposals projected to detection-dict bboxes.

    Returns the replay-seam dict: bbox (D, 4), label (D,), prob (D,),
    valid (D,) — padded to `max_dets`.
    """
    import jax
    import jax.numpy as jnp

    from .groundplane import estimate_ground_plane_points

    gp = estimate_ground_plane_points(
        jnp.asarray(pts_cam, jnp.float32),
        jnp.ones(len(pts_cam), bool),
        jax.random.PRNGKey(0),
        camera_up_hint=camera_up_hint,
    )
    pi = np.asarray(gp.plane)
    above = pts_cam @ pi[:3] + pi[3] > ground_margin if bool(gp.ok) else np.ones(
        len(pts_cam), bool
    )
    pts = pts_cam[above & (pts_cam[:, 2] > 0.5)]

    bboxes = np.zeros((max_dets, 4), np.float32)
    labels = np.zeros(max_dets, np.int32)
    probs = np.zeros(max_dets, np.float32)
    valid = np.zeros(max_dets, bool)
    if len(pts) < min_pts:
        return dict(bbox=bboxes, label=labels, prob=probs, valid=valid)

    labels_c = _voxel_cluster(pts, voxel)
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy = float(intr.cx), float(intr.cy)
    d = 0
    for cid in np.unique(labels_c):
        sel = pts[labels_c == cid]
        if len(sel) < min_pts or d >= max_dets:
            continue
        ext = sel.max(0) - sel.min(0)
        lo, hi = np.asarray(size_range[0]), np.asarray(size_range[1])
        if not ((np.sort(ext) >= np.sort(lo) * 0.5).all() and (ext <= hi).all()):
            continue
        z = sel[:, 2]
        u = fx * sel[:, 0] / z + cx
        v = fy * sel[:, 1] / z + cy
        inside = (u >= 0) & (u < width) & (v >= 0) & (v < height)
        if inside.sum() < min_pts // 2:
            continue
        bboxes[d] = [u[inside].min(), v[inside].min(), u[inside].max(), v[inside].max()]
        labels[d] = 0  # car class, as the reference's detector3d
        probs[d] = min(1.0, len(sel) / 500.0 + 0.5)
        valid[d] = True
        d += 1
    return dict(bbox=bboxes, label=labels, prob=probs, valid=valid)
