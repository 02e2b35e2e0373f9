"""End-to-end synthetic RGB-D SLAM run (BASELINE config-1 analogue).

Renders a textured-room sequence with known ground truth, runs the full
tracking + mapping loop, and prints a JSON summary with ATE RMSE and stage
timings.  Usage:

    python -m qsp_slam_tpu.run_synthetic [num_frames] [--cpu]
"""

from __future__ import annotations

import json
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv.remove("--cpu")
    num_frames = int(argv[0]) if argv else 120

    import jax
    import numpy as np

    from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
    from qsp_slam_tpu.eval.ate import ate_rmse
    from qsp_slam_tpu.frontend.orb import OrbConfig
    from qsp_slam_tpu.slam.system import SlamSystem
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    cfg = TrackingConfig(orb=OrbConfig(num_features=1000))
    room = make_room()
    Tcw_gt = orbit_trajectory(num_frames)

    sysm = SlamSystem(cfg)
    for i in range(num_frames):
        gray, depth = render_frame(room, Tcw_gt[i], cfg.intr)
        sysm.track_rgbd(gray, depth)

    est = np.stack(sysm.trajectory)
    out = sysm.summary()
    out["num_frames"] = num_frames
    out["ate_rmse_m"] = ate_rmse(est, Tcw_gt[: len(est)])
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
