"""Fabricate a TUM-RGB-D-format sequence from the synthetic renderer.

Real TUM downloads are unavailable in this environment (zero egress), so this
tool materializes the renderer's output in the exact on-disk layout the
`run_tum` CLI and `data.tum.TumSequence` consume (`rgb.txt` / `depth.txt` /
`groundtruth.txt`, 16-bit depth PNGs at the TUM depth scale — parity:
`src/tum_rgbd/io.h:32-70`).  That lets full-length (600+ frame) dataset runs
exercise the real CLI path end to end: file IO, timestamp association,
skip subsampling, capacity growth/compaction, loop closure on revisits.

    python -m qsp_slam_tpu.data.make_tum OUT_DIR [--frames 640] [--objects N]
        [--step 0.01] [--pitch 0.35] [--detections]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """(qx, qy, qz, qw) from a rotation matrix (TUM trajectory convention)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        qx, qy, qz, qw = q
    return np.array([qx, qy, qz, qw])


def make_sequence(
    out_dir: str,
    num_frames: int = 640,
    num_objects: int = 0,
    step: float = 0.01,
    pitch: float = 0.35,
    seed: int = 1,
    with_detections: bool = False,
    fps: float = 30.0,
) -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..slam.tracking import TrackingConfig
    from .render import gt_detections, make_scene, orbit_trajectory, render_scene
    from .tum import DEPTH_SCALE

    cfg = TrackingConfig()
    scene = make_scene(num_objects=max(num_objects, 1), seed=seed)
    if num_objects == 0:
        scene = scene._replace(ellipsoids=scene.ellipsoids[:0],
                               labels=scene.labels[:0],
                               albedo=scene.albedo[:0])
    traj = orbit_trajectory(num_frames, step=step, pitch=pitch)

    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    det_dir = os.path.join(out_dir, "detections")
    if with_detections:
        os.makedirs(det_dir, exist_ok=True)

    rgb_lines, depth_lines, gt_lines = [], [], []
    render = jax.jit(lambda T: render_scene(scene, T, cfg.intr))
    for i in range(num_frames):
        t = i / fps
        gray, depth, inst = render(jnp.asarray(traj[i]))
        g8 = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
        d16 = np.clip(np.asarray(depth) * DEPTH_SCALE, 0, 65535).astype(np.uint16)
        rgb_rel = f"rgb/{t:.6f}.png"
        depth_rel = f"depth/{t:.6f}.png"
        Image.fromarray(g8).save(os.path.join(out_dir, rgb_rel))
        Image.fromarray(d16).save(os.path.join(out_dir, depth_rel))
        rgb_lines.append(f"{t:.6f} {rgb_rel}")
        depth_lines.append(f"{t:.6f} {depth_rel}")
        T_wc = np.linalg.inv(traj[i])
        q = rotmat_to_quat(T_wc[:3, :3])
        tx, ty, tz = T_wc[:3, 3]
        gt_lines.append(
            f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}"
        )
        if with_detections:
            from .io import save_detection_cache

            det = gt_detections(
                scene, jnp.asarray(traj[i]), cfg.intr, instance=inst
            )
            save_detection_cache(os.path.join(det_dir, f"{i}.npz"), det)

    hdr = "# fabricated TUM-format sequence (qsp_slam_tpu synthetic renderer)\n"
    with open(os.path.join(out_dir, "rgb.txt"), "w") as f:
        f.write(hdr + "\n".join(rgb_lines) + "\n")
    with open(os.path.join(out_dir, "depth.txt"), "w") as f:
        f.write(hdr + "\n".join(depth_lines) + "\n")
    with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
        f.write(hdr + "\n".join(gt_lines) + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=640)
    ap.add_argument("--objects", type=int, default=0)
    ap.add_argument("--step", type=float, default=0.01)
    ap.add_argument("--pitch", type=float, default=0.35)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--detections", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    make_sequence(
        args.out_dir, args.frames, args.objects, args.step, args.pitch,
        args.seed, args.detections,
    )
    print(f"wrote {args.frames} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
