"""KITTI-format end-to-end: fabricated driving sequence through the real CLI.

Covers `data/make_kitti.py` (stereo + velodyne + calib layout), the
`run_kitti --detector3d` path (learned PointPillars-class detections seeding
objects via the ellipsoid_cam seam), and the forward-motion keyframe policy
(`need_keyframe` ratio trigger with post-insertion reference refresh).
Parity: the `qsp_slam.cc` stereo+LiDAR entry point end to end.
"""

import json

import jax
import numpy as np
import pytest


@pytest.mark.slow
class TestKittiEndToEnd:
    def test_fabricate_train_run(self, tmp_path):
        from qsp_slam_tpu.data.make_kitti import make_kitti_sequence
        from qsp_slam_tpu.perception.detector3d import (
            Detector3DConfig,
            save_detector3d,
            train_detector3d,
        )
        from qsp_slam_tpu.run_kitti import main as run_kitti_main

        seq_dir = str(tmp_path / "seq")
        poses = str(tmp_path / "poses.txt")
        make_kitti_sequence(seq_dir, num_frames=28, num_cars=6, poses_out=poses)

        # Sanity: KittiSequence reads the fabricated layout back.
        from qsp_slam_tpu.data.kitti import KittiSequence

        seq = KittiSequence(seq_dir, poses)
        assert len(seq) == 28
        assert abs(seq.baseline - 0.54) < 1e-3
        velo = seq.load_velodyne(0)
        assert velo.shape[1] == 4 and len(velo) > 1000
        pts_cam = seq.transform_velo_to_cam(velo)
        assert np.median(pts_cam[:, 2]) > 1.0  # forward in cam frame

        cfg = Detector3DConfig(grid=96, channels=24, widths=(24, 32))
        params, _ = train_detector3d(jax.random.PRNGKey(0), cfg, steps=400)
        d3d_path = str(tmp_path / "d3d.npz")
        save_detector3d(d3d_path, params, cfg)

        out = run_kitti_main([
            seq_dir, "--poses", poses, "--detector3d", d3d_path,
            "--kmax", "24", "--nmax", "4096", "--emax", "32768",
            "--num-features", "800",
        ])
        # Full pipeline health: multiple keyframes (the ratio trigger must
        # keep up with forward point turnover), bounded drift, and at least
        # one LiDAR-detected object landmark in the map.
        assert out["keyframes"] >= 4, out
        assert out["ate_rmse_m"] < 0.6, out
        assert out["rpe_trans_rmse"] < 0.25, out
        assert out["num_objects"] >= 1, out
