"""Fabricate a KITTI-odometry-format sequence from the synthetic renderer.

Real KITTI downloads are unavailable here (zero egress), so this tool
materializes a driving-style scene — car-sized ellipsoids resting on a road
plane, level forward-moving stereo camera, velodyne scans derived from the
rendered depth — in the exact on-disk layout `run_kitti` /
`data.kitti.KittiSequence` consume: `calib.txt` (P0..P3 + Tr), `times.txt`,
`image_0/` + `image_1/` stereo PNGs, `velodyne/*.bin`, and a KITTI-format
poses file.  Parity: the dataset layout read by `qsp_slam.cc` and
`reconstruct/kitti_sequence.py:244-258`.

    python -m qsp_slam_tpu.data.make_kitti OUT_DIR [--frames 60] [--cars 6]
        [--height 192 --width 624] [--poses-out OUT_DIR/poses.txt]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# velodyne frame (x fwd, y left, z up) -> cam0 frame (z fwd, x right, y down)
TR_VELO_TO_CAM = np.array(
    [[0.0, -1.0, 0.0, 0.0],
     [0.0, 0.0, -1.0, -0.08],
     [1.0, 0.0, 0.0, 0.27]],
    np.float32,
)

CAM_HEIGHT = 1.65  # camera above the road, as the KITTI rig


def _circuit_pose(s: float, straight: float, r: float):
    """Arc-length -> ((x, z), yaw) on a rounded-square circuit.

    Four straights of length `straight` joined by quarter-circle corners of
    radius `r`, centered at the origin; the drive returns exactly to its
    start (the KITTI-00-style loop-closure geometry).
    """
    quad = straight + 0.5 * np.pi * r
    q = int(s // quad) % 4
    u = s - (s // quad) * quad
    h = straight / 2.0 + r
    if u < straight:
        pos = np.array([-h, u - straight / 2.0])
        heading = 0.0
    else:
        a = (u - straight) / r
        c = np.array([-h + r, straight / 2.0])
        pos = c + r * np.array([-np.cos(a), np.sin(a)])
        heading = a
    th = -q * np.pi / 2.0
    ct, st = np.cos(th), np.sin(th)
    x, z = pos
    pos = np.array([x * ct - z * st, x * st + z * ct])
    return pos, heading + q * np.pi / 2.0


def make_kitti_sequence(
    out_dir: str,
    num_frames: int = 60,
    num_cars: int = 6,
    height: int = 192,
    width: int = 624,
    baseline: float = 0.54,
    step: float = 0.35,
    seed: int = 2,
    poses_out: str | None = None,
    velo_stride: int = 2,
    loop: bool = False,
    loop_overlap: int = 80,
) -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..core import lie
    from ..core.camera import Intrinsics, backproject
    from .render import make_scene, render_scene

    fx = 0.58 * width
    intr = Intrinsics(
        jnp.float32(fx), jnp.float32(fx),
        jnp.float32(width / 2.0), jnp.float32(height / 2.0),
    )
    import jax.numpy as _jnp

    corner_r = 10.0
    if loop:
        # Rounded-square circuit returning to its start (KITTI-00 geometry);
        # the last `loop_overlap` frames re-drive the first stretch so the
        # revisit gives place recognition several consistent keyframes.
        perimeter = max(num_frames - loop_overlap, num_frames // 2) * step
        straight = max((perimeter - 2.0 * np.pi * corner_r) / 4.0, 10.0)
        half_span = straight / 2.0 + corner_r
        room_half = (half_span + 30.0, 4.0, half_span + 30.0)
        scene = make_scene(
            num_objects=num_cars,
            seed=seed,
            half_extent=room_half,
            half_range=((1.7, 0.65, 0.8), (2.3, 0.85, 1.0)),
            # One texture period across the WHOLE world: any shorter period
            # wraps, and two stretches of road one period apart become
            # pixel-identical — place recognition then cannot distinguish
            # places at all (real streets are unique; the fabrication must
            # be too for loop-closure evidence to mean anything).
            tex_period=2.0 * (half_span + 30.0),
        )
        # Re-place the cars along the circuit: random arc position, lateral
        # offset 5-9 m off the centerline (either side), resting on floor.
        rng0 = np.random.default_rng(seed + 7)
        e = np.array(scene.ellipsoids)
        for i in range(len(e)):
            s = rng0.uniform(0.0, perimeter)
            pos, heading = _circuit_pose(s, straight, corner_r)
            fwd = np.array([np.sin(heading), np.cos(heading)])
            left = np.array([fwd[1], -fwd[0]])
            off = rng0.uniform(5.0, 9.0) * rng0.choice([-1.0, 1.0])
            e[i, 0] = pos[0] + left[0] * off
            e[i, 2] = pos[1] + left[1] * off
            e[i, 1] = room_half[1] - e[i, 7]  # rest on floor (y down)
            e[i, 4] = heading + rng0.uniform(-0.3, 0.3)
        scene = scene._replace(ellipsoids=_jnp.asarray(e.astype(np.float32)))
    else:
        # "Road" scene: a wide long room whose floor is CAM_HEIGHT below the
        # trajectory; car-sized ellipsoids rest on it ALONG the drive (within
        # detector range of the moving camera, not bunched at the room center).
        room_half = (16.0, 4.0, 0.6 * num_frames * step + 30.0)
        z_start = -room_half[2] + 6.0
        scene = make_scene(
            num_objects=num_cars,
            seed=seed,
            half_extent=room_half,
            half_range=((1.7, 0.65, 0.8), (2.3, 0.85, 1.0)),
            z_range=(z_start + 10.0, z_start + 14.0 + num_frames * step + 18.0),
            # Driving viewing distances (10-40 m): keep texels >= a pixel so
            # the texture is trackable structure, not per-frame aliasing
            # shimmer.
            tex_period=80.0,
        )
        # Keep the ego lane clear: shove any car straddling |x| < 3 m
        # sideways (driving through an ellipsoid makes it vanish).
        e = np.array(scene.ellipsoids)
        lane = np.abs(e[:, 0]) < 3.0
        e[lane, 0] = np.sign(e[lane, 0] + 1e-3) * (3.2 + np.abs(e[lane, 0]))
        scene = scene._replace(ellipsoids=_jnp.asarray(e))

    os.makedirs(os.path.join(out_dir, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "image_1"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "velodyne"), exist_ok=True)

    P0 = np.array([[fx, 0, width / 2, 0], [0, fx, height / 2, 0], [0, 0, 1, 0]])
    P1 = P0.copy()
    P1[0, 3] = -fx * baseline
    with open(os.path.join(out_dir, "calib.txt"), "w") as f:
        for name, P in [("P0", P0), ("P1", P1), ("P2", P0), ("P3", P1)]:
            f.write(name + ": " + " ".join(f"{v:.6e}" for v in P.ravel()) + "\n")
        f.write("Tr: " + " ".join(f"{v:.6e}" for v in TR_VELO_TO_CAM.ravel()) + "\n")
    with open(os.path.join(out_dir, "times.txt"), "w") as f:
        for i in range(num_frames):
            f.write(f"{0.1 * i:.6e}\n")

    # Level forward drive with a gentle lateral sway (parallax for BA);
    # loop mode instead follows the rounded-square circuit.
    hy = float(room_half[1])
    cam_y = hy - CAM_HEIGHT
    z0 = 0.0 if loop else z_start
    Tr44 = np.eye(4, dtype=np.float32)
    Tr44[:3] = TR_VELO_TO_CAM
    Tr_inv = np.linalg.inv(Tr44)

    shift = np.eye(4, dtype=np.float32)
    shift[0, 3] = -baseline

    perimeter = max(num_frames - loop_overlap, num_frames // 2) * step if loop \
        else num_frames * step
    straight = max((perimeter - 2.0 * np.pi * corner_r) / 4.0, 10.0)

    poses_wc = []
    rng = np.random.default_rng(seed)
    for i in range(num_frames):
        if loop:
            pos, yaw = _circuit_pose(step * i, straight, corner_r)
            tx, tz = float(pos[0]), float(pos[1])
        else:
            yaw = 0.04 * np.sin(0.05 * i)
            tx, tz = 0.8 * np.sin(0.08 * i), z0 + step * i
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = [tx, cam_y, tz]
        poses_wc.append(T_wc)
        T_cw = np.linalg.inv(T_wc).astype(np.float32)

        gl, depth, _ = render_scene(
            scene, jnp.asarray(T_cw), intr, height=height, width=width
        )
        gr, _, _ = render_scene(
            scene, jnp.asarray(shift @ T_cw), intr, height=height, width=width
        )
        Image.fromarray(np.asarray(gl).astype(np.uint8)).save(
            os.path.join(out_dir, "image_0", f"{i:06d}.png")
        )
        Image.fromarray(np.asarray(gr).astype(np.uint8)).save(
            os.path.join(out_dir, "image_1", f"{i:06d}.png")
        )

        # Velodyne scan: backproject the (strided) left depth to cam0, then
        # map into the velodyne frame.  FOV-limited, as a forward sector of
        # a real spin; reflectance carries the image gray (unused upstream).
        d = np.asarray(depth)[::velo_stride, ::velo_stride]
        g = np.asarray(gl)[::velo_stride, ::velo_stride]
        ys, xs = np.mgrid[0 : height : velo_stride, 0 : width : velo_stride]
        uv = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
        z = d.ravel().astype(np.float32)
        ok = (z > 0.5) & (z < 80.0)
        pts_cam = np.array(
            backproject(jnp.asarray(uv[ok]), jnp.asarray(z[ok]), intr)
        )
        pts_cam += rng.normal(0, 0.02, pts_cam.shape).astype(np.float32)
        hom = np.concatenate(
            [pts_cam, np.ones((len(pts_cam), 1), np.float32)], -1
        )
        pts_velo = (hom @ Tr_inv.T)[:, :3]
        scan = np.concatenate(
            [pts_velo, (g.ravel()[ok, None] / 255.0)], -1
        ).astype(np.float32)
        scan.tofile(os.path.join(out_dir, "velodyne", f"{i:06d}.bin"))

    if poses_out:
        os.makedirs(os.path.dirname(poses_out) or ".", exist_ok=True)
        with open(poses_out, "w") as f:
            for T in poses_wc:
                f.write(" ".join(f"{v:.6e}" for v in T[:3].ravel()) + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--cars", type=int, default=6)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=624)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--poses-out", default=None)
    ap.add_argument(
        "--loop", action="store_true",
        help="rounded-square circuit that returns to its start (loop-closure "
        "geometry); the last --loop-overlap frames re-drive the first stretch",
    )
    ap.add_argument("--loop-overlap", type=int, default=80)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    make_kitti_sequence(
        args.out_dir, num_frames=args.frames, num_cars=args.cars,
        height=args.height, width=args.width, seed=args.seed,
        poses_out=args.poses_out, loop=args.loop,
        loop_overlap=args.loop_overlap,
    )
    print(f"wrote {args.frames} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
