"""Train the on-mesh 2D detector and save its params.

Parity: the reference ships pretrained Mask-R-CNN weights
(`configs/config_*.json` Detector2D.weight_path, `reconstruct/detector2d.py:
65-125`); here the equivalent artifact is produced in-repo from the synthetic
renderer's ground truth — no external dataset, no torch.

    python -m qsp_slam_tpu.train_detector2d --out detector2d.npz
        [--steps 2600] [--half] [--cpu]

Then: python -m qsp_slam_tpu.run_tum SEQ --detector detector2d.npz
(detect-online mode; omit --detections).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2600)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--half", action="store_true",
        help="train at 240x320 (detect_objects mean-pools 480x640 frames)",
    )
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from qsp_slam_tpu.perception.detector2d import (
        DetectorConfig,
        save_detector2d,
        train_detector,
    )
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    if args.half:
        cfg = DetectorConfig(input_hw=(240, 320))
        intr = TrackingConfig(
            fx=260.45, fy=260.5, cx=162.55, cy=124.85, width=320, height=240
        ).intr
    else:
        cfg = DetectorConfig()
        intr = None
    params, losses = train_detector(
        jax.random.PRNGKey(args.seed), cfg, steps=args.steps,
        scenes=args.scenes, lr=args.lr, intr=intr,
    )
    save_detector2d(args.out, params, cfg)
    print(json.dumps({
        "out": args.out,
        "steps": args.steps,
        "final_loss": float(np.mean(losses[-20:])),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
