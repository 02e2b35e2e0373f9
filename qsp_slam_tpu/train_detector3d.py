"""Train the on-mesh 3D detector and save its params.

Parity: the reference ships pretrained mmdetection3d checkpoints
(`configs/config_kitti.json` Detector3D.weight_path); here the equivalent
artifact is produced in-repo from procedural scans — no external dataset.

    python -m qsp_slam_tpu.train_detector3d --out detector3d.npz
        [--steps 800] [--cpu]

Then: python -m qsp_slam_tpu.run_kitti SEQ --detector3d detector3d.npz
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from qsp_slam_tpu.perception.detector3d import (
        Detector3DConfig,
        save_detector3d,
        train_detector3d,
    )

    cfg = Detector3DConfig()
    params, losses = train_detector3d(
        jax.random.PRNGKey(args.seed), cfg, steps=args.steps
    )
    save_detector3d(args.out, params, cfg)
    print(json.dumps({
        "out": args.out,
        "steps": args.steps,
        "final_loss": float(np.mean(losses[-20:])),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
