"""Persistence: trajectories, map snapshots, detection caches.

Parity:
  * `save_trajectory_tum`   ≈ `System::SaveKeyFrameTrajectoryTUM`
                              (`src/System.cc:476-545`)
  * `save_trajectory_kitti` ≈ `System::SaveTrajectoryKITTI` (`:547-621`)
  * `save_map`/`load_map`   ≈ `System::SaveEntireMap` writing MapPoints.txt /
                              MapObjects.txt (id, label, 3x4 pose, code) /
                              Cameras.txt (`src/System_util.cc:112-194`);
                              stored as one compressed npz instead of txt
                              scatter, with txt export for interop
  * detection caches        ≈ the `detect_online: false` `.lbl` seam
                              (`reconstruct/mono_sequence.py:111-115`) as npz
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _quat_from_R(R: np.ndarray) -> np.ndarray:
    from ..core import lie
    import jax.numpy as jnp

    return np.asarray(lie.rotmat_to_quat(jnp.asarray(R, jnp.float32)))


def save_trajectory_tum(path: str, timestamps, Tcw_stack: np.ndarray) -> None:
    """TUM format: `t tx ty tz qx qy qz qw` (camera-to-world)."""
    with open(path, "w") as f:
        for t, Tcw in zip(timestamps, Tcw_stack):
            T_wc = np.linalg.inv(Tcw)
            q = _quat_from_R(T_wc[:3, :3])
            tx, ty, tz = T_wc[:3, 3]
            f.write(
                f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def save_trajectory_kitti(path: str, Tcw_stack: np.ndarray) -> None:
    """KITTI format: 12 numbers per line (3x4 camera-to-world)."""
    with open(path, "w") as f:
        for Tcw in Tcw_stack:
            T_wc = np.linalg.inv(Tcw)[:3].reshape(-1)
            f.write(" ".join(f"{x:.9e}" for x in T_wc) + "\n")


def load_trajectory_tum(path: str):
    """Returns (timestamps (F,), T_cw (F, 4, 4))."""
    from .tum import parse_trajectory

    entries = parse_trajectory(path)
    ts = np.array([t for t, _ in entries])
    Tcw = np.stack([np.linalg.inv(T) for _, T in entries]).astype(np.float32)
    return ts, Tcw


def save_map(
    path: str,
    map_state,
    objects=None,
    codes: Optional[np.ndarray] = None,
) -> None:
    """Persist the SoA map (+ object table, + DeepSDF codes) as one npz."""
    data = {
        "kf_Tcw": np.asarray(map_state.kf_Tcw),
        "kf_valid": np.asarray(map_state.kf_valid),
        "num_kfs": int(map_state.num_kfs),
        "pt_xyz": np.asarray(map_state.pt_xyz),
        "pt_valid": np.asarray(map_state.pt_valid),
        "pt_desc": np.asarray(map_state.pt_desc),
        "ob_kf": np.asarray(map_state.ob_kf),
        "ob_pt": np.asarray(map_state.ob_pt),
        "ob_uv": np.asarray(map_state.ob_uv),
        "ob_ur": np.asarray(map_state.ob_ur),
        "ob_valid": np.asarray(map_state.ob_valid),
        "num_obs": int(map_state.num_obs),
        "num_pts": int(map_state.num_pts),
    }
    if objects is not None:
        data.update(
            obj_ellipsoid=np.asarray(objects.ellipsoid),
            obj_label=np.asarray(objects.label),
            obj_prob=np.asarray(objects.prob),
            obj_valid=np.asarray(objects.valid),
            # Shape state: the reference persists the 64-d code + Sim3Two in
            # MapObjects.txt (`src/System_util.cc:112-194`) so meshes can be
            # re-decoded offline; same contract here.
            obj_code=np.asarray(objects.code),
            obj_Tow_shape=np.asarray(objects.Tow_shape),
            obj_shape_ok=np.asarray(objects.shape_ok),
        )
    if codes is not None:
        data["obj_codes"] = np.asarray(codes)
    np.savez_compressed(path, **data)


def load_map(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def export_map_txt(path_dir: str, map_state, objects=None) -> None:
    """Reference-compatible txt export (MapPoints.txt / MapObjects.txt /
    Cameras.txt layouts of `src/System_util.cc:112-194`)."""
    os.makedirs(path_dir, exist_ok=True)
    pts = np.asarray(map_state.pt_xyz)[np.asarray(map_state.pt_valid)]
    with open(os.path.join(path_dir, "MapPoints.txt"), "w") as f:
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    K = int(map_state.num_kfs)
    with open(os.path.join(path_dir, "Cameras.txt"), "w") as f:
        for k in range(K):
            T_wc = np.linalg.inv(np.asarray(map_state.kf_Tcw[k]))
            q = _quat_from_R(T_wc[:3, :3])
            t = T_wc[:3, 3]
            f.write(
                f"{k} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n"
            )
    if objects is not None:
        valid = np.asarray(objects.valid)
        ells = np.asarray(objects.ellipsoid)
        labels = np.asarray(objects.label)
        with open(os.path.join(path_dir, "MapObjects.txt"), "w") as f:
            for i in np.where(valid)[0]:
                e = ells[i]
                f.write(
                    f"{i} {labels[i]} " + " ".join(str(x) for x in e) + "\n"
                )


def save_detection_cache(path: str, detections: dict) -> None:
    """Cache per-frame detections (the reference's .lbl seam) as npz.

    Instance masks (when present) are bit-packed along the width axis — a
    (D, H, W) bool field costs D*H*W/8 bytes before the npz deflate pass.
    """
    arrs = {
        "bbox": np.asarray(detections["bbox"]),
        "label": np.asarray(detections["label"]),
        "prob": np.asarray(detections["prob"]),
        "valid": np.asarray(detections["valid"]),
    }
    if "mask" in detections:
        m = np.asarray(detections["mask"]).astype(bool)
        arrs["mask"] = np.packbits(m, axis=-1)
        arrs["mask_width"] = np.asarray(m.shape[-1])
    np.savez_compressed(path, **arrs)


def load_detection_cache(path: str) -> dict:
    with np.load(path) as z:
        out = {k: z[k] for k in ("bbox", "label", "prob", "valid")}
        if "mask" in z.files:
            W = int(z["mask_width"]) if "mask_width" in z.files else None
            m = np.unpackbits(z["mask"], axis=-1)
            out["mask"] = (m[..., :W] if W else m).astype(bool)
    return out
