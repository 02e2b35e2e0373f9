"""PnP-RANSAC and relocalization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.core.camera import Intrinsics, project
from qsp_slam_tpu.frontend.pnp import pnp_ransac


def make_intr():
    return Intrinsics(
        jnp.float32(520.9), jnp.float32(521.0), jnp.float32(325.1), jnp.float32(249.7)
    )


class TestPnP:
    def test_recovers_pose_with_outliers(self, rng):
        intr = make_intr()
        M = 150
        pts_w = jnp.asarray(
            rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (M, 3)), jnp.float32
        )
        T_gt = lie.exp_se3(jnp.asarray([0.3, -0.1, 0.2, 0.1, 0.25, -0.05]))
        pc = lie.transform_points(T_gt, pts_w[None])[0]
        uv, z = project(pc, intr)
        uv = np.array(uv) + rng.normal(0, 0.5, (M, 2))
        out = rng.random(M) < 0.3
        uv[out] += rng.uniform(20, 100, (out.sum(), 2))
        res = pnp_ransac(
            pts_w, jnp.asarray(uv, jnp.float32), jnp.ones(M, bool), intr,
            jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        # Pose error small.
        err = np.abs(np.asarray(res.Tcw) - np.asarray(T_gt)).max()
        assert err < 0.01, err
        inl = np.asarray(res.inliers)
        assert inl[out].mean() < 0.1 and inl[~out].mean() > 0.9

    def test_fails_gracefully_on_garbage(self, rng):
        intr = make_intr()
        M = 60
        pts_w = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
        uv = jnp.asarray(rng.uniform(0, 640, (M, 2)), jnp.float32)
        res = pnp_ransac(pts_w, uv, jnp.ones(M, bool), intr, jax.random.PRNGKey(1))
        assert not bool(res.ok)


class TestRelocalization:
    def test_relocates_after_teleport(self):
        """Track a sequence, then feed a frame from a previously-seen pose
        with a wildly wrong motion prediction — the system must relocalize."""
        from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
        from qsp_slam_tpu.frontend.orb import OrbConfig
        from qsp_slam_tpu.slam.system import SlamSystem
        from qsp_slam_tpu.slam.tracking import TrackingConfig

        cfg = TrackingConfig(orb=OrbConfig(num_features=500))
        room = make_room()
        traj = orbit_trajectory(30)
        sysm = SlamSystem(cfg, kmax=16, nmax=2048, emax=16384, enable_objects=False)
        for i in range(25):
            gray, depth = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
        # Teleport: jump back to the pose of frame 2 while the motion model
        # still predicts continuation of frame 24 -> tracking loses.
        sysm.velocity = np.asarray(
            lie.exp_se3(jnp.asarray([1.5, 0, 0, 0, 1.2, 0], jnp.float32))
        )  # absurd prediction
        gray, depth = render_frame(room, jnp.asarray(traj[2]), cfg.intr)
        sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
        err = np.linalg.norm(sysm.Tcw[:3, 3] - traj[2][:3, 3])
        assert err < 0.1, err
        assert sysm.stats.get("relocalizations", 0) >= 1
