"""System-level loop-closure regression: a miniature fabricated KITTI
circuit must drive to a FIRED loop (VERDICT r04 item 1 "Done" criterion).

Room-scale integration tests passed all round while the drive never closed
a loop — stereo depth noise at driving ranges (z^2/bf) breaks any metric
inlier gate while the octave-scaled image-space chi2 gate
(`Sim3Solver::CheckInliers`, `src/Sim3Solver.cc:226-280`) survives it.
This test pins the full pipeline at DRIVING geometry: stereo tracking,
place recognition, consistency gating, image-space Sim3 verification,
pose-graph correction, and post-loop global BA.
"""

import os

import numpy as np
import pytest

import qsp_slam_tpu  # noqa: F401


@pytest.mark.slow
def test_miniature_circuit_fires_loop(tmp_path):
    from qsp_slam_tpu.data.make_kitti import make_kitti_sequence
    from qsp_slam_tpu.data.kitti import KittiSequence
    from qsp_slam_tpu.eval.ate import ate_rmse
    from qsp_slam_tpu.frontend.orb import OrbConfig
    from qsp_slam_tpu.frontend.pyramid import PyramidConfig
    from qsp_slam_tpu.slam.system import SlamSystem
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    root = str(tmp_path / "circuit")
    n = 240
    # step 0.6 m/frame: one 102.8 m rounded-square lap in ~170 frames, the
    # last ~70 frames (~16 keyframes) re-drive the start — the 3-round
    # consistency gate needs several consecutive revisit keyframes.
    make_kitti_sequence(
        root, num_frames=n, num_cars=6, height=128, width=416,
        step=0.6, seed=5, loop=True, loop_overlap=90,
        poses_out=os.path.join(root, "poses.txt"),
    )
    seq = KittiSequence(root, os.path.join(root, "poses.txt"))
    intr = seq.intrinsics
    cfg = TrackingConfig(
        # 6 pyramid levels: at 128 px height the 8-level top (128/1.2^7
        # = 36 px) is smaller than the 43 px orientation patch.
        orb=OrbConfig(num_features=1000,
                      pyramid=PyramidConfig(num_levels=6,
                                            height=128, width=416)),
        fx=float(intr["fx"]), fy=float(intr["fy"]),
        cx=float(intr["cx"]), cy=float(intr["cy"]),
        width=416, height=128, baseline=seq.baseline, depth_max=60.0,
        local_map_budget=8192,
    )
    s = SlamSystem(cfg, kmax=64, nmax=16384, emax=131072,
                   enable_objects=False)
    for idx, (gl, gr) in zip(range(n), seq.prefetch_pairs(range(n))):
        s.track_stereo(gl, gr)

    # The loop FIRED at the system level (not just place-recognition rank).
    assert s.loops_closed >= 1, {
        "loop_scan_tail": s.stats.get("loop_scan", [])[-12:],
        "keyframes": s.stats["keyframes"],
    }
    ev = s.stats["loop_events"][0]
    assert ev[2] >= 40  # grown match count through the image-space gate

    # Post-loop trajectory quality: the corrected keyframe chain must beat
    # the frozen (pre-correction) per-frame history near the loop.  The
    # absolute bound is deliberately loose: this circuit carries a revisit
    # sheet-jump (two covis-0 odometry edges), and the corrected kf-ATE
    # varies 0.66-1.42 m across benign keypoint/LM perturbations; what the
    # covisibility weighting must prevent is the uniform-weight blow-up
    # (3+ m at the chain head) and what the loop must beat is the frozen
    # history (1.8 m here, 44.6 m on the 840 m drive).
    gt = np.stack([np.linalg.inv(seq.poses[i]) for i in range(n)])
    kf_frames = np.asarray(s.stats["kf_frames"])
    n_kf = int(np.asarray(s.map_state.num_kfs))
    live = np.asarray(s.map_state.kf_valid[:n_kf])
    kf_est = np.asarray(s.map_state.kf_Tcw[:n_kf])[live]
    kf_ate = ate_rmse(kf_est, gt[kf_frames[live]])
    frozen_ate = ate_rmse(np.stack(s.trajectory), gt)
    assert kf_ate < min(2.0, frozen_ate), (kf_ate, frozen_ate)
