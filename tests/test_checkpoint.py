"""Checkpoint/resume: a restored system continues tracking identically."""

import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.checkpoint import load_checkpoint, save_checkpoint
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig
from qsp_slam_tpu.utils.tracing import Tracer


class TestCheckpoint:
    def test_save_resume_continues(self, tmp_path):
        cfg = TrackingConfig(orb=OrbConfig(num_features=400))
        room = make_room()
        traj = orbit_trajectory(20)

        sysm = SlamSystem(cfg, kmax=16, nmax=2048, emax=16384, enable_objects=False)
        for i in range(10):
            gray, depth = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
        ckpt = tmp_path / "state.npz"
        save_checkpoint(str(ckpt), sysm)

        resumed = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, enable_objects=False
        )
        load_checkpoint(str(ckpt), resumed)
        assert resumed.initialized
        np.testing.assert_array_equal(resumed.Tcw, sysm.Tcw)
        assert int(resumed.map_state.num_pts) == int(sysm.map_state.num_pts)

        # Both continue on the same frames and agree.
        for i in range(10, 16):
            gray, depth = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            a = sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
            b = resumed.track_rgbd(np.asarray(gray), np.asarray(depth))
            np.testing.assert_allclose(a, b, atol=1e-5)


class TestTracer:
    def test_spans_and_report(self):
        tr = Tracer()
        with tr.span("stage_a"):
            x = sum(range(1000))
        with tr.span("stage_a"):
            x = sum(range(1000))
        with tr.span("stage_b"):
            pass
        rep = tr.report()
        assert rep["stage_a"]["count"] == 2
        assert "median_ms" in rep["stage_a"]
        assert rep["max_rss_mb"] > 10
        assert "stage_b" in rep
