"""Monocular CLI — the `qsp_slam_mono` entry point equivalent.

Parity: `qsp_slam_mono.cc` (Freiburg/Redwood monocular runs).

    python -m qsp_slam_tpu.run_mono SEQUENCE_DIR [--config seq.yaml]
        [--save-dir out] [--max-frames F] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence", help="TUM-format dir (rgb.txt used; depth ignored)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument(
        "--detections", default=None,
        help="directory of per-frame detection caches (<idx>.npz replay "
        "seam) — spawns monocular object landmarks via the bbox-only "
        "PriorInfer path (`GetObjectDetectionsMono`)",
    )
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from qsp_slam_tpu.data.io import save_trajectory_tum
    from qsp_slam_tpu.data.tum import TumSequence
    from qsp_slam_tpu.eval.ate import ate_rmse
    from qsp_slam_tpu.slam.system import SlamSystem
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    if args.config:
        from qsp_slam_tpu.slam.config import tracking_config_from_yaml

        cfg = tracking_config_from_yaml(args.config)
    else:
        cfg = TrackingConfig()

    seq = TumSequence(args.sequence)
    sysm = SlamSystem(cfg, enable_objects=args.detections is not None)
    timestamps, gt = [], []
    n = len(seq) if args.max_frames is None else min(len(seq), args.max_frames)
    for idx in range(n):
        gray, _depth, t, T_cw_gt = seq.load(idx)
        det = None
        if args.detections:
            from qsp_slam_tpu.data.io import load_detection_cache

            p = os.path.join(args.detections, f"{idx}.npz")
            if os.path.exists(p):
                det = load_detection_cache(p)
        sysm.track_mono(gray, det)
        timestamps.append(t)
        gt.append(T_cw_gt)

    out = sysm.summary()
    est = np.stack(sysm.trajectory)
    if gt and all(g is not None for g in gt):
        out["ate_rmse_m_sim3"] = ate_rmse(est, np.stack(gt), with_scale=True)
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        save_trajectory_tum(
            os.path.join(args.save_dir, "CameraTrajectory.txt"), timestamps, est
        )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
