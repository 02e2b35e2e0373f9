"""Micro-batched (chunked) tracking: in-jit scan equivalence + system mode.

`track_chunk` must be EXACTLY the sequential per-frame algorithm (scan over
process+track with in-jit velocity/accept logic); the system-level mode
amortizes dispatch overhead and splits chunks at keyframes.  Note: the
chunked system run is NOT bit-identical to the per-frame host loop (host
numpy vs in-jit velocity inverses differ at 1 ulp), which is the same class
of run-to-run variation the reference's multithreaded mode has.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import (
    TrackingConfig,
    process_frame,
    track_chunk,
    track_frame,
)

CFG = TrackingConfig(orb=OrbConfig(num_features=500))


@pytest.fixture(scope="module")
def seq():
    room = make_room()
    traj = orbit_trajectory(24, step=0.012, pitch=0.35)
    frames = []
    for i in range(24):
        g, d = render_frame(room, jnp.asarray(traj[i]), CFG.intr)
        frames.append((np.asarray(g), np.asarray(d)))
    return frames, traj


class TestTrackChunk:
    def test_scan_matches_sequential(self, seq):
        """One chunk == the same frames pushed through the per-frame jits."""
        frames, _ = seq
        s = SlamSystem(CFG, enable_objects=False)
        for g, d in frames[:4]:
            s.track_rgbd(g, d)
        m = s.map_state
        Tcw = jnp.asarray(s.Tcw)
        vel = jnp.asarray(s.velocity)
        res = track_chunk(
            m, Tcw, vel,
            jnp.stack([jnp.asarray(f[0]) for f in frames[4:8]]),
            jnp.stack([jnp.asarray(f[1]) for f in frames[4:8]]),
            CFG,
        )
        T, v = Tcw, vel
        for i in range(4):
            fr = process_frame(
                jnp.asarray(frames[4 + i][0]), jnp.asarray(frames[4 + i][1]), CFG
            )
            pred = v @ T
            r = track_frame(m, pred, fr, CFG)
            ok = (
                (r.num_inliers >= CFG.min_track_inliers)
                & (r.pred_dev_t < 0.5)
                & (r.pred_dev_r < 0.5)
            )
            Tn = jnp.where(ok, r.Tcw, pred)
            v = jnp.where(ok, Tn @ lie.inv_se3(T), v)
            T = Tn
            np.testing.assert_array_equal(
                np.asarray(res.Tcw[i]), np.asarray(Tn)
            )
            assert int(res.num_inliers[i]) == int(r.num_inliers)
            assert bool(res.ok[i]) == bool(ok)

    def test_system_chunk_mode(self, seq):
        """Chunked system run: all frames tracked, keyframes inserted,
        trajectory coherent.  Uses the first 20 frames — the tail of this
        orbit is a knife-edge section where BOTH tracking modes sit one
        ulp from an aliasing basin (see module docstring)."""
        frames, traj = seq
        frames = frames[:20]
        s = SlamSystem(CFG, enable_objects=False)
        s.track_rgbd(*frames[0])
        i = 1
        while i < len(frames):
            c = frames[i:i + 4]
            out = s.track_rgbd_chunk([f[0] for f in c], [f[1] for f in c])
            assert len(out) == len(c)
            i += len(c)
        assert len(s.trajectory) == len(frames)
        assert s.stats["keyframes"] >= 2
        # the bootstrap frame is not counted in stats["frames"] (same
        # convention as the per-frame path)
        assert s.stats["frames"] == len(frames) - 1
        est = np.stack(s.trajectory)
        assert np.isfinite(est).all()
        # Tracking stayed locked (relative motion per frame is small).
        steps = np.linalg.norm(
            np.diff([np.linalg.inv(T)[:3, 3] for T in est], axis=0), axis=-1
        )
        assert steps.max() < 0.3

    def test_chunk_bootstrap_falls_back(self, seq):
        """Uninitialized system: the chunk API bootstraps via the per-frame
        path and still returns one pose per frame."""
        frames, _ = seq
        s = SlamSystem(CFG, enable_objects=False)
        out = s.track_rgbd_chunk(
            [f[0] for f in frames[:4]], [f[1] for f in frames[:4]]
        )
        assert len(out) == 4
        assert s.initialized
