"""Stereo + objects end-to-end: the joint BA dispatch path (config-4-style)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie, quadric
from qsp_slam_tpu.data.render import gt_detections, make_scene, render_scene
from qsp_slam_tpu.eval.ate import ate_rmse
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig


@pytest.mark.slow
class TestStereoJointBA:
    def test_stereo_objects_joint(self):
        cfg = TrackingConfig(orb=OrbConfig(num_features=500), baseline=0.12)
        scene = make_scene(num_objects=3, seed=2)
        sysm = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, ba_window=6, omax=8,
            enable_loop_closing=False,
        )
        base = lie.exp_se3(jnp.asarray([0, 0, 0, 0.44, 0, 0], jnp.float32))
        shift = np.eye(4, dtype=np.float32)
        shift[0, 3] = -cfg.baseline
        gts = []
        for i in range(20):
            xi = jnp.asarray([0.045 * i, 0, 0, 0, 0, 0], jnp.float32)
            T_cw = np.asarray(lie.exp_se3(xi) @ base, np.float32)
            gts.append(T_cw)
            gl, _, _ = render_scene(scene, jnp.asarray(T_cw), cfg.intr)
            gr, _, _ = render_scene(scene, jnp.asarray(shift @ T_cw), cfg.intr)
            det = gt_detections(scene, jnp.asarray(T_cw), cfg.intr)
            sysm.track_stereo(
                np.asarray(gl), np.asarray(gr),
                {k: np.asarray(v) for k, v in det.items()},
            )
        est = np.stack(sysm.trajectory)
        ate = ate_rmse(est, np.stack(gts))
        assert ate < 0.06, ate
        # Joint path engaged and objects exist with pose measurements.
        valid = np.asarray(sysm.objects.valid)
        assert valid.sum() >= 1
        assert int((np.asarray(sysm.objects.pm_kf) >= 0).sum()) >= 2
        # Matched object centers near GT (SLAM world = first camera frame).
        est_e = np.asarray(
            quadric.transform_ellipsoid(
                jnp.asarray(np.asarray(sysm.objects.ellipsoid)[valid]),
                lie.inv_se3(jnp.asarray(gts[0])),
            )
        )
        gt_e = np.asarray(scene.ellipsoids)
        matched = 0
        for e in est_e:
            d = np.linalg.norm(gt_e[:, :3] - e[:3], axis=1).min()
            if d < 0.35:
                matched += 1
        assert matched >= 1
