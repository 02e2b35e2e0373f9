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
    distort: tuple | None = None,
) -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..slam.tracking import TrackingConfig
    from .render import gt_detections, make_scene, orbit_trajectory, render_scene
    from .tum import DEPTH_SCALE

    cfg = TrackingConfig()

    warp = None
    if distort is not None and any(c != 0.0 for c in distort):
        # Lens simulation: the distorted camera observes ray u at pixel
        # distort(u), so I_d(p) = I_ideal(undistort(p)) — gray bilinear,
        # depth nearest (depth must not blend across edges).  A calib YAML
        # with the matching Camera.k* keys is written alongside so
        # `run_tum --config calib.yaml` exercises the undistortion path
        # (`Frame::UndistortKeyPoints` parity, `src/Frame.cc:89`).
        from ..core.camera import undistort_points

        H, W = cfg.height, cfg.width
        gy, gx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([gx.ravel(), gy.ravel()], -1)
        src = undistort_points(grid, cfg.intr, distort)
        sx, sy = src[:, 0], src[:, 1]
        inside = (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1)
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H - 2)
        fx_ = jnp.clip(sx - x0, 0.0, 1.0)
        fy_ = jnp.clip(sy - y0, 0.0, 1.0)
        xn = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, W - 1)
        yn = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, H - 1)

        @jax.jit
        def warp(gray, depth):
            g = (
                gray[y0, x0] * (1 - fx_) * (1 - fy_)
                + gray[y0, x0 + 1] * fx_ * (1 - fy_)
                + gray[y0 + 1, x0] * (1 - fx_) * fy_
                + gray[y0 + 1, x0 + 1] * fx_ * fy_
            )
            d = depth[yn, xn]
            g = jnp.where(inside, g, 0.0).reshape(H, W)
            d = jnp.where(inside, d, 0.0).reshape(H, W)
            return g, d

        k1, k2, p1, p2, k3 = (float(c) for c in distort)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "calib.yaml"), "w") as f:
            f.write(
                "# fabricated sequence calibration (with lens distortion)\n"
                f"Camera.fx: {cfg.fx}\nCamera.fy: {cfg.fy}\n"
                f"Camera.cx: {cfg.cx}\nCamera.cy: {cfg.cy}\n"
                f"Camera.width: {cfg.width}\nCamera.height: {cfg.height}\n"
                f"Camera.k1: {k1}\nCamera.k2: {k2}\n"
                f"Camera.p1: {p1}\nCamera.p2: {p2}\nCamera.k3: {k3}\n"
            )
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
        if warp is not None:
            gray, depth = warp(gray, depth)
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
    ap.add_argument(
        "--distort", default=None, metavar="K1,K2,P1,P2,K3",
        help="simulate lens distortion (comma-separated Brown-Conrady "
        "coefficients); writes a matching calib.yaml for run_tum --config",
    )
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    dist = None
    if args.distort:
        dist = tuple(float(x) for x in args.distort.split(","))
        assert len(dist) == 5, "--distort needs 5 coefficients"
    make_sequence(
        args.out_dir, args.frames, args.objects, args.step, args.pitch,
        args.seed, args.detections, distort=dist,
    )
    print(f"wrote {args.frames} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
