"""Drive the fabricated KITTI loop circuit (objects off) and dump the
loop-scan telemetry: where does the loop pipeline lose the revisit?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import qsp_slam_tpu  # noqa: F401,E402
from qsp_slam_tpu.data.kitti import KittiSequence  # noqa: E402
from qsp_slam_tpu.eval.ate import ate_rmse  # noqa: E402
from qsp_slam_tpu.frontend.orb import OrbConfig  # noqa: E402
from qsp_slam_tpu.frontend.pyramid import PyramidConfig  # noqa: E402
from qsp_slam_tpu.slam.system import SlamSystem  # noqa: E402
from qsp_slam_tpu.slam.tracking import TrackingConfig  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kitti_loop2"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 900
    seq = KittiSequence(root, os.path.join(root, "poses.txt"))
    intr = seq.intrinsics
    cfg = TrackingConfig(
        orb=OrbConfig(num_features=2000,
                      pyramid=PyramidConfig(height=192, width=624)),
        fx=float(intr["fx"]), fy=float(intr["fy"]),
        cx=float(intr["cx"]), cy=float(intr["cy"]),
        width=624, height=192, baseline=seq.baseline, depth_max=60.0,
        local_map_budget=8192,
    )
    s = SlamSystem(cfg, kmax=304, nmax=16384, emax=131072,
                   enable_objects=False)
    for idx, (gl, gr) in zip(range(n), seq.prefetch_pairs(range(n))):
        s.track_stereo(gl, gr)
        if (idx + 1) % 100 == 0:
            print(f"[{idx+1}/{n}] kfs={s.stats['keyframes']}", flush=True)
    scan = s.stats.get("loop_scan", [])
    print("loop rounds:", len(scan), "loops:", s.loops_closed,
          "events:", s.stats.get("loop_events"))
    print("(kf, cand0, score0, ref_min, chosen)")
    for row in scan[-40:]:
        print("  ", tuple(round(x, 3) if isinstance(x, float) else x
                          for x in row))
    old = [r for r in scan if any(0 <= c < r[0] - 40 for c in r[1])]
    print("rounds with an OLD top-candidate:", len(old))
    for row in old[:20]:
        print("  OLD", tuple(round(x, 3) if isinstance(x, float) else x
                             for x in row))
    gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(n)])
    print("ate:", round(ate_rmse(np.stack(s.trajectory), gt), 3))


if __name__ == "__main__":
    main()
