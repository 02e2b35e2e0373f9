"""End-to-end SLAM slice test: synthetic RGB-D sequence -> ATE check.

This is the config-1 golden test (SURVEY.md §7.2 step 5): point-only
tracking + sliding-window BA must stay within a small ATE bound on a
noise-free rendered sequence.
"""

import numpy as np
import pytest

from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
from qsp_slam_tpu.eval.ate import ate_rmse, umeyama_alignment
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig


@pytest.fixture(scope="module")
def slam_run():
    cfg = TrackingConfig(orb=OrbConfig(num_features=500))
    room = make_room()
    Tcw_gt = orbit_trajectory(30)
    sysm = SlamSystem(cfg, kmax=16, nmax=2048, emax=16384, ba_window=6)
    for i in range(30):
        gray, depth = render_frame(room, Tcw_gt[i], cfg.intr)
        sysm.track_rgbd(gray, depth)
    return sysm, Tcw_gt


class TestEndToEnd:
    def test_ate_within_bound(self, slam_run):
        sysm, Tcw_gt = slam_run
        est = np.stack(sysm.trajectory)
        ate = ate_rmse(est, Tcw_gt[: len(est)])
        assert ate < 0.05, ate

    def test_keyframes_and_map_grow(self, slam_run):
        sysm, _ = slam_run
        s = sysm.summary()
        assert s["keyframes"] >= 2
        assert s["num_points"] > 200
        assert s["num_obs"] > s["num_points"]  # tracked points re-observed

    def test_tracking_never_lost(self, slam_run):
        sysm, Tcw_gt = slam_run
        # Every frame pose should be close to GT (no constant-velocity
        # coasting segments).
        est = np.stack(sysm.trajectory)
        ate = ate_rmse(est, Tcw_gt[: len(est)])
        per_frame = []
        from qsp_slam_tpu.eval.ate import positions_from_Tcw

        p_est = positions_from_Tcw(est.astype(np.float64))
        p_gt = positions_from_Tcw(Tcw_gt[: len(est)].astype(np.float64))
        s, R, t = umeyama_alignment(p_est, p_gt)
        err = np.linalg.norm((s * (R @ p_est.T)).T + t - p_gt, axis=1)
        assert err.max() < 0.12, err.max()


class TestAte:
    def test_umeyama_exact(self, rng):
        src = rng.normal(size=(50, 3))
        R_gt, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(R_gt) < 0:
            R_gt[:, 0] *= -1
        t_gt = np.array([1.0, -2.0, 0.5])
        dst = (R_gt @ src.T).T + t_gt
        s, R, t = umeyama_alignment(src, dst)
        np.testing.assert_allclose(R, R_gt, atol=1e-8)
        np.testing.assert_allclose(t, t_gt, atol=1e-8)
        assert abs(s - 1.0) < 1e-12
