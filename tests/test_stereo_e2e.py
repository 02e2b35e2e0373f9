"""Stereo end-to-end: rendered stereo pairs through the full SLAM loop."""

import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
from qsp_slam_tpu.eval.ate import ate_rmse
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig


@pytest.mark.slow
class TestStereoE2E:
    def test_stereo_tracking(self):
        cfg = TrackingConfig(orb=OrbConfig(num_features=500), baseline=0.12)
        room = make_room()
        traj = orbit_trajectory(25)
        sysm = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, ba_window=6,
            enable_objects=False,
        )
        shift = np.eye(4, dtype=np.float32)
        shift[0, 3] = -cfg.baseline  # right camera offset in the camera frame
        for i in range(25):
            gl, _ = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            gr, _ = render_frame(room, jnp.asarray(shift @ traj[i]), cfg.intr)
            sysm.track_stereo(np.asarray(gl), np.asarray(gr))
        est = np.stack(sysm.trajectory)
        ate = ate_rmse(est, traj[: len(est)])
        assert ate < 0.06, ate
        assert sysm.summary()["keyframes"] >= 2
