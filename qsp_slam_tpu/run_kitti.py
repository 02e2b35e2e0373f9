"""KITTI odometry stereo CLI — the `qsp_slam` (stereo+LiDAR) entry point.

Parity: `qsp_slam.cc` — stereo pair loop with optional LiDAR-derived object
detections (the detector3d replay seam), KITTI-format trajectory save.

    python -m qsp_slam_tpu.run_kitti SEQ_DIR [--poses poses/NN.txt]
        [--save-dir out] [--max-frames F] [--detections DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence", help=".../sequences/NN directory")
    ap.add_argument("--poses", default=None, help="GT poses file for ATE")
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--detections", default=None, help="per-frame det npz dir")
    ap.add_argument(
        "--lidar-detections", action="store_true",
        help="generate object detections from velodyne scans (geometric "
        "ground removal + clustering unless --detector3d is given)",
    )
    ap.add_argument(
        "--detector3d", default=None, metavar="PARAMS_NPZ",
        help="learned PointPillars-class detector params "
        "(train with `python -m qsp_slam_tpu.train_detector3d`); implies "
        "--lidar-detections and seeds objects from the predicted 3D boxes",
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--mesh", type=int, default=None, metavar="N",
        help="run post-loop / final global BA point-sharded over an N-device "
        "mesh (requires N visible devices; see parallel.mesh)",
    )
    ap.add_argument(
        "--global-ba", action="store_true",
        help="run one full-map optimization pass after the sequence "
        "(joint with objects in stereo mode; uses --mesh when given)",
    )
    ap.add_argument("--kmax", type=int, default=128)
    ap.add_argument("--nmax", type=int, default=16384)
    ap.add_argument("--emax", type=int, default=131072)
    ap.add_argument("--num-features", type=int, default=2000)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from qsp_slam_tpu.data.io import load_detection_cache, save_trajectory_kitti
    from qsp_slam_tpu.data.kitti import KittiSequence
    from qsp_slam_tpu.eval.ate import ate_rmse
    from qsp_slam_tpu.frontend.orb import OrbConfig
    from qsp_slam_tpu.frontend.pyramid import PyramidConfig
    from qsp_slam_tpu.slam.system import SlamSystem
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    seq = KittiSequence(args.sequence, args.poses)
    intr = seq.intrinsics
    g0, _ = seq.load_gray_pair(0)
    H, W = g0.shape
    cfg = TrackingConfig(
        orb=OrbConfig(
            # default = reference KITTI budget (configs/KITTI00-02.yaml)
            num_features=args.num_features,
            pyramid=PyramidConfig(height=H, width=W),
        ),
        fx=float(intr["fx"]), fy=float(intr["fy"]),
        cx=float(intr["cx"]), cy=float(intr["cy"]),
        width=W, height=H,
        baseline=seq.baseline,
        depth_max=60.0,
        # Bound per-frame tracking cost on long drives (the map outgrows
        # the frame's field of view quickly at driving speeds).
        local_map_budget=8192,
    )
    mesh = None
    if args.mesh:
        from qsp_slam_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh, axis="map")
    sysm = SlamSystem(
        cfg, kmax=args.kmax, nmax=args.nmax, emax=args.emax, mesh=mesh
    )

    d3d = None
    if args.detector3d:
        from qsp_slam_tpu.perception.detector3d import load_detector3d

        d3d = load_detector3d(args.detector3d)
        args.lidar_detections = True

    n = len(seq) if args.max_frames is None else min(len(seq), args.max_frames)
    # Stereo pairs decode AHEAD on the native C++ worker pool (PIL fallback).
    pair_iter = seq.prefetch_pairs(range(n))
    for idx, (gl, gr) in zip(range(n), pair_iter):
        det = None
        if args.detections:
            p = os.path.join(args.detections, f"{idx}.npz")
            if os.path.exists(p):
                det = load_detection_cache(p)
        elif args.lidar_detections:
            # LAZY provider: detections are only consumed at keyframe
            # creation (the reference also detects per-KF, not per-frame,
            # `GetObjectDetectionsLiDAR` `src/Tracking_util.cc:38`); running
            # the 3D detector on every frame multiplied CPU runtime ~3x.
            def det(i=idx):
                velo = seq.load_velodyne(i, max_points=30000)
                pts_cam = seq.transform_velo_to_cam(velo)
                if d3d is not None:
                    from qsp_slam_tpu.perception.detector3d import (
                        lidar_detections_learned,
                    )

                    return lidar_detections_learned(
                        d3d[0], d3d[1], pts_cam, cfg.intr, W, H
                    )
                from qsp_slam_tpu.perception.lidar_detect import lidar_detections

                return lidar_detections(pts_cam, cfg.intr, W, H)
        sysm.track_stereo(gl, gr, det)
        if (idx + 1) % 50 == 0:
            print(f"[{idx + 1}/{n}] kfs={sysm.stats['keyframes']}", file=sys.stderr)

    if args.global_ba:
        sysm.run_global_ba()
        out_extra = {"global_ba": True}
    else:
        out_extra = {}
    out = sysm.summary()
    out.update(out_extra)
    est = np.stack(sysm.trajectory)
    if seq.poses is not None:
        gt_Tcw = np.stack([np.linalg.inv(T) for T in seq.poses[:n]])
        out["ate_rmse_m"] = ate_rmse(est, gt_Tcw)
        from qsp_slam_tpu.eval.ate import rpe

        out.update(rpe(est, gt_Tcw))
        # Keyframe-trajectory ATE: reflects loop-closure / global-BA
        # corrections, which the frozen per-frame history does not.
        kf_frames = sysm.stats.get("kf_frames", [])
        n_kf = int(np.asarray(sysm.map_state.num_kfs))
        if len(kf_frames) >= 2 and len(kf_frames) == n_kf:
            live = np.asarray(sysm.map_state.kf_valid[:n_kf])
            kf_est = np.asarray(sysm.map_state.kf_Tcw[:n_kf])[live]
            kf_gt = gt_Tcw[np.asarray(kf_frames)[live]]
            if len(kf_est) >= 2:
                out["kf_ate_rmse_m"] = ate_rmse(kf_est, kf_gt)
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        save_trajectory_kitti(os.path.join(args.save_dir, "trajectory.txt"), est)
        # Drive report: loop-closure evidence + scaling telemetry next to the
        # trajectory (the `src/evo/` offline-report role, `src/evo/evo.h:88`)
        # — `ate_rmse_m` is the FROZEN per-frame history (pre-correction);
        # `kf_ate_rmse_m` is the live keyframe chain (post-correction), so
        # the pair is the before/after-loop story.
        report = dict(out)
        report["loop_events"] = sysm.stats.get("loop_events", [])
        report["loop_scan"] = sysm.stats.get("loop_scan", [])
        report["capacity_events"] = sysm.stats.get("capacity_events", [])
        report["resets"] = sysm.stats.get("resets", 0)
        report["relocalizations"] = sysm.stats.get("relocalizations", 0)
        det_ms = sysm.stats.get("det_ms", [])
        if det_ms:
            report["det_ms_median"] = float(np.median(det_ms))
            report["det_keyframes"] = len(det_ms)
        try:
            import resource

            report["peak_rss_mb"] = round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
            )
        except Exception:
            pass
        with open(os.path.join(args.save_dir, "report.json"), "w") as f:
            json.dump(report, f)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
