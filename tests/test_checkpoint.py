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


class TestCheckpointSessionState:
    """Full-session capture: sensor mode, stats, mono bootstrap, capacities."""

    def test_stereo_resume_keeps_sensor_and_stats(self, tmp_path):
        cfg = TrackingConfig(orb=OrbConfig(num_features=400), baseline=0.12)
        room = make_room()
        traj = orbit_trajectory(16)
        shift = np.eye(4, dtype=np.float32)
        shift[0, 3] = -cfg.baseline
        sysm = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, ba_window=6,
            enable_objects=False,
        )

        def stereo_pair(i):
            gl, _ = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            gr, _ = render_frame(room, jnp.asarray(shift @ traj[i]), cfg.intr)
            return np.asarray(gl), np.asarray(gr)

        for i in range(8):
            sysm.track_stereo(*stereo_pair(i))
        ckpt = tmp_path / "stereo.npz"
        save_checkpoint(str(ckpt), sysm)

        resumed = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, ba_window=6,
            enable_objects=False,
        )
        load_checkpoint(str(ckpt), resumed)
        assert resumed._sensor == "stereo"
        assert resumed.stats["frames"] == sysm.stats["frames"]
        assert resumed.stats["keyframes"] == sysm.stats["keyframes"]
        for i in range(8, 14):
            gl, gr = stereo_pair(i)
            a = sysm.track_stereo(gl, gr)
            b = resumed.track_stereo(gl, gr)
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_mono_mid_bootstrap_resume(self, tmp_path):
        cfg = TrackingConfig(orb=OrbConfig(num_features=600))
        room = make_room()
        traj = orbit_trajectory(40, step=0.025)
        sysm = SlamSystem(
            cfg, kmax=16, nmax=4096, emax=32768, ba_window=6,
            enable_objects=False,
        )
        # Same frame twice (zero parallax): reference frame is set but the
        # initializer's parallax gate keeps two-view init from succeeding.
        gray0, _ = render_frame(room, jnp.asarray(traj[0]), cfg.intr)
        for _ in range(2):
            sysm.track_mono(np.asarray(gray0))
        assert not sysm.initialized
        assert sysm._mono_ref is not None
        ckpt = tmp_path / "mono.npz"
        save_checkpoint(str(ckpt), sysm)

        resumed = SlamSystem(
            cfg, kmax=16, nmax=4096, emax=32768, ba_window=6,
            enable_objects=False,
        )
        load_checkpoint(str(ckpt), resumed)
        assert resumed._sensor == "mono"
        assert not resumed.initialized
        assert resumed._mono_ref is not None
        assert resumed._mono_ref_age == sysm._mono_ref_age
        np.testing.assert_array_equal(
            np.asarray(resumed._mono_ref.feats.xy),
            np.asarray(sysm._mono_ref.feats.xy),
        )
        # Both bootstrap identically from here.
        for i in range(2, 20):
            gray, _ = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            a = sysm.track_mono(np.asarray(gray))
            b = resumed.track_mono(np.asarray(gray))
            np.testing.assert_allclose(a, b, atol=1e-5)
        assert sysm.initialized and resumed.initialized

    def test_capacities_adopted_from_checkpoint(self, tmp_path):
        cfg = TrackingConfig(orb=OrbConfig(num_features=400))
        room = make_room()
        traj = orbit_trajectory(12)
        # Tiny stores force host-side growth during the run.
        sysm = SlamSystem(cfg, kmax=2, nmax=512, emax=2048,
                          enable_objects=False)
        for i in range(10):
            gray, depth = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
        assert sysm.kmax > 2  # growth actually happened
        ckpt = tmp_path / "grown.npz"
        save_checkpoint(str(ckpt), sysm)

        resumed = SlamSystem(cfg, kmax=2, nmax=512, emax=2048,
                             enable_objects=False)
        load_checkpoint(str(ckpt), resumed)
        assert (resumed.kmax, resumed.nmax, resumed.emax) == (
            sysm.kmax, sysm.nmax, sysm.emax)
        assert resumed.map_state.capacity == sysm.map_state.capacity
        ev = resumed.stats.get("capacity_events")
        assert ev and ev == sysm.stats.get("capacity_events")
        for i in range(10, 12):
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
