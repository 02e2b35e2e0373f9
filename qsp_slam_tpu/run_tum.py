"""TUM RGB-D CLI — the `qsp_slam_rgbd` entry point equivalent.

Parity: `qsp_slam_rgbd.cc:54-326` — per-frame loop with skip/ratio
subsampling, track-time telemetry, final trajectory/map/artifact saves.

    python -m qsp_slam_tpu.run_tum SEQUENCE_DIR [--config seq.yaml]
        [--save-dir out] [--skip N] [--max-frames F] [--detections DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--config", default=None, help="sequence YAML")
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--skip", type=int, default=1, help="process every Nth frame")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument(
        "--detections", default=None,
        help="directory of per-frame detection caches (<idx>.npz replay seam)",
    )
    ap.add_argument(
        "--detector", default=None, metavar="PARAMS_NPZ",
        help="saved 2D-detector weights (train_detector2d) — detect-online "
        "mode (`detect_online: true`); frames without a --detections cache "
        "run the on-mesh detector",
    )
    ap.add_argument(
        "--save-frames", default=None, metavar="DIR",
        help="save annotated frames (FrameDrawer artifact) to DIR",
    )
    ap.add_argument("--frame-every", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--mesh", type=int, default=None, metavar="N",
        help="run post-loop / final global BA point-sharded over an N-device "
        "mesh (requires N visible devices; see parallel.mesh)",
    )
    ap.add_argument(
        "--global-ba", action="store_true",
        help="run one full-map optimization pass after the sequence "
        "(the reference's final-refinement role; uses --mesh when given)",
    )
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from qsp_slam_tpu.data.io import (
        load_detection_cache,
        save_map,
        save_trajectory_tum,
    )
    from qsp_slam_tpu.data.tum import TumSequence
    from qsp_slam_tpu.eval.ate import ate_rmse
    from qsp_slam_tpu.slam.system import SlamSystem
    from qsp_slam_tpu.slam.tracking import TrackingConfig
    from qsp_slam_tpu.viz.export import export_scene

    if args.config:
        from qsp_slam_tpu.slam.config import tracking_config_from_yaml

        cfg = tracking_config_from_yaml(args.config)
    else:
        cfg = TrackingConfig()

    detector = None
    if args.detector:
        from qsp_slam_tpu.perception.detector2d import load_detector2d

        detector = load_detector2d(args.detector)

    mesh = None
    if args.mesh:
        from qsp_slam_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh, axis="map")

    seq = TumSequence(args.sequence)
    sysm = SlamSystem(
        cfg, keep_frame_info=args.save_frames is not None, detector=detector,
        mesh=mesh,
    )
    timestamps = []
    gt = []
    indices = list(range(0, len(seq), args.skip))
    if args.max_frames:
        indices = indices[: args.max_frames]
    # Frames decode AHEAD on the native C++ worker pool (PIL fallback);
    # IO/decompression overlap the tracker's device work.
    for gray, depth, t, T_cw_gt, idx in seq.prefetch_iter(indices):
        det = None
        if args.detections:
            p = os.path.join(args.detections, f"{idx}.npz")
            if os.path.exists(p):
                det = load_detection_cache(p)
        sysm.track_rgbd(gray, depth, det)
        if args.save_frames and len(timestamps) % args.frame_every == 0:
            from qsp_slam_tpu.viz.frame_draw import frame_status, save_annotated

            info = sysm.last_frame_info or {}
            save_annotated(
                os.path.join(args.save_frames, f"{idx:06d}.png"),
                gray,
                kp_xy=info.get("kp_xy"),
                kp_tracked=info.get("kp_tracked"),
                bboxes=det.get("bbox") if det else None,
                labels=det.get("label") if det else None,
                probs=det.get("prob") if det else None,
                bbox_valid=det.get("valid") if det else None,
                status=frame_status(sysm, idx),
            )
        timestamps.append(t)
        gt.append(T_cw_gt)
        if len(timestamps) % 50 == 0:
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
            print(
                f"[{len(timestamps)}] kfs={sysm.stats['keyframes']} rss={rss}MB",
                file=sys.stderr,
            )

    if args.global_ba:
        sysm.run_global_ba()
        out_extra = {"global_ba": True}
    else:
        out_extra = {}
    out = sysm.summary()
    out.update(out_extra)
    est = np.stack(sysm.trajectory)
    if all(g is not None for g in gt) and gt:
        gt_arr = np.stack(gt)
        out["ate_rmse_m"] = ate_rmse(est, gt_arr)
        from qsp_slam_tpu.eval.ate import rpe

        out.update(rpe(est, gt_arr))
        # Keyframe-trajectory ATE: reflects loop-closure / global-BA
        # corrections, which the frozen per-frame history above does not
        # (the reference's `SaveKeyFrameTrajectoryTUM` role).
        kf_frames = sysm.stats.get("kf_frames", [])
        n_kf = int(np.asarray(sysm.map_state.num_kfs))
        if len(kf_frames) >= 2 and len(kf_frames) == n_kf:
            live = np.asarray(sysm.map_state.kf_valid[:n_kf])
            kf_est = np.asarray(sysm.map_state.kf_Tcw[:n_kf])[live]
            kf_gt = gt_arr[np.asarray(kf_frames)[live]]
            if len(kf_est) >= 2:
                out["kf_ate_rmse_m"] = ate_rmse(kf_est, kf_gt)
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        save_trajectory_tum(
            os.path.join(args.save_dir, "CameraTrajectory.txt"), timestamps, est
        )
        save_map(os.path.join(args.save_dir, "map.npz"), sysm.map_state, sysm.objects)
        export_scene(args.save_dir, sysm.map_state, sysm.objects, trajectory=est)
        if int(np.asarray(sysm.objects.valid).sum()) > 0:
            # Offscreen render of the object map from the final camera
            # (ObjectRenderer role; see viz.object_render).
            from qsp_slam_tpu.viz.object_render import render_objects_png

            render_objects_png(
                os.path.join(args.save_dir, "objects_render.png"),
                sysm.objects, sysm.Tcw, cfg.intr, cfg.height, cfg.width,
                gray=gray, shape_prior=sysm.shape_prior,
            )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
