"""Offline visualization artifacts: PLY meshes / point clouds, ellipsoid
wireframes, trajectory files.

Replaces the reference's live Pangolin viewer stack (L8: `src/Viewer.cc`,
`MapDrawer`, `ObjectDrawer`, OpenGL mesh renderer) with headless artifact
dumps — the SURVEY.md §7.1 design decision: visualization is not in the
engine; saved artifacts open in any point-cloud/mesh viewer.
"""

from __future__ import annotations

import os

import numpy as np


def save_ply_points(path: str, pts: np.ndarray, colors: np.ndarray | None = None):
    """ASCII PLY point cloud. pts (N, 3); colors (N, 3) uint8 optional."""
    n = len(pts)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        for i in range(n):
            row = f"{pts[i, 0]} {pts[i, 1]} {pts[i, 2]}"
            if colors is not None:
                row += f" {int(colors[i, 0])} {int(colors[i, 1])} {int(colors[i, 2])}"
            f.write(row + "\n")


def save_ply_mesh(path: str, vertices: np.ndarray, faces: np.ndarray):
    """ASCII PLY triangle mesh."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def ellipsoid_wireframe(e: np.ndarray, segments: int = 24) -> np.ndarray:
    """Polyline vertices for the three principal ellipses of an ellipsoid
    (the MapDrawer wireframe, `src/MapDrawer_util.cc:59-230`). (3*S, 3)."""
    from ..core import quadric
    import jax.numpy as jnp

    T = np.asarray(quadric.similarity_transform(jnp.asarray(e, jnp.float32)))
    th = np.linspace(0, 2 * np.pi, segments)
    rings = []
    c, s = np.cos(th), np.sin(th)
    z = np.zeros_like(th)
    for ring in (
        np.stack([c, s, z], -1),
        np.stack([c, z, s], -1),
        np.stack([z, c, s], -1),
    ):
        rings.append(ring @ T[:3, :3].T + T[:3, 3])
    return np.concatenate(rings)


def export_scene(
    out_dir: str,
    map_state=None,
    objects=None,
    meshes: dict | None = None,
    trajectory: np.ndarray | None = None,
):
    """Dump everything inspectable about a run into out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    if map_state is not None:
        pts = np.asarray(map_state.pt_xyz)[np.asarray(map_state.pt_valid)]
        save_ply_points(os.path.join(out_dir, "map_points.ply"), pts)
    if objects is not None:
        valid = np.asarray(objects.valid)
        wire = [
            ellipsoid_wireframe(np.asarray(objects.ellipsoid[i]))
            for i in np.where(valid)[0]
        ]
        if wire:
            save_ply_points(
                os.path.join(out_dir, "object_wireframes.ply"), np.concatenate(wire)
            )
    if meshes:
        for name, mesh in meshes.items():
            save_ply_mesh(
                os.path.join(out_dir, f"object_{name}.ply"), mesh.vertices, mesh.faces
            )
    if trajectory is not None:
        centers = []
        for Tcw in trajectory:
            T_wc = np.linalg.inv(Tcw)
            centers.append(T_wc[:3, 3])
        save_ply_points(os.path.join(out_dir, "trajectory.ply"), np.stack(centers))
