"""Monocular end-to-end: bootstrap + tracking + triangulation on rendered
sequence; ATE evaluated with Sim3 (scale-free) alignment."""

import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
from qsp_slam_tpu.eval.ate import ate_rmse
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig


@pytest.mark.slow
class TestMonoE2E:
    def test_mono_tracking(self):
        cfg = TrackingConfig(orb=OrbConfig(num_features=600))
        room = make_room()
        # Sideways-dominant motion for parallax during bootstrap.
        traj = orbit_trajectory(40, step=0.025)
        sysm = SlamSystem(
            cfg, kmax=16, nmax=4096, emax=32768, ba_window=6,
            enable_objects=False, enable_loop_closing=True,
        )
        for i in range(40):
            gray, _ = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            sysm.track_mono(np.asarray(gray))
        assert sysm.initialized
        s = sysm.summary()
        assert s["keyframes"] >= 3
        assert s["num_points"] > 300  # triangulation keeps growing the map
        est = np.stack(sysm.trajectory)
        # Evaluate only the initialized segment, scale-aligned (mono gauge).
        k = len(est) - 30
        ate = ate_rmse(est[k:], traj[k:40], with_scale=True)
        assert ate < 0.1, ate  # mono-gauge units (~3x metric here)
