"""Monocular object pipeline (VERDICT round-1 Missing #2): detections feed
`track_mono`, objects are spawned from bbox + ground + aspect priors with NO
depth, and refined multi-view.

Parity anchors: `GetObjectDetectionsMono` (`src/Tracking_util.cc:213-290`),
`PriorInfer::GenerateInitGuess` (`src/core/PriorInfer.cpp`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qsp_slam_tpu  # noqa: F401
from qsp_slam_tpu.core.camera import Intrinsics
from qsp_slam_tpu.perception.prior_infer import generate_init_guess


class TestGenerateInitGuess:
    def test_footprint_on_ground(self):
        intr = Intrinsics(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        ground = jnp.asarray([0.0, -1.0, 0.0, 1.2])  # floor 1.2 below camera
        # A 1.2m-tall object 3m ahead: bottom row of bbox = ground contact.
        # projection: foot at (0, 1.2, 3) -> v = 240 + 500*1.2/3 = 440
        # top at (0, 0, 3) -> v = 240
        bbox = jnp.asarray([280.0, 240.0, 360.0, 440.0])
        e = generate_init_guess(bbox, ground, intr)
        np.testing.assert_allclose(float(e[2]), 3.0, atol=0.15)  # depth
        # center halfway up the object: y = 1.2 - 0.6 = 0.6
        np.testing.assert_allclose(float(e[1]), 0.6, atol=0.12)
        np.testing.assert_allclose(float(e[8]), 0.6, atol=0.1)  # half height
        # bottom rests on the plane
        bottom_y = float(e[1]) + float(e[8])
        np.testing.assert_allclose(bottom_y, 1.2, atol=0.1)


@pytest.mark.slow
class TestMonoObjectsE2E:
    def test_mono_run_produces_matched_objects(self):
        from qsp_slam_tpu.data.render import (
            gt_detections,
            make_scene,
            orbit_trajectory,
            render_scene,
        )
        from qsp_slam_tpu.eval.ate import positions_from_Tcw, umeyama_alignment
        from qsp_slam_tpu.frontend.orb import OrbConfig
        from qsp_slam_tpu.slam.system import SlamSystem
        from qsp_slam_tpu.slam.tracking import TrackingConfig

        from qsp_slam_tpu.core import quadric

        cfg = TrackingConfig(
            orb=OrbConfig(num_features=600), kf_max_interval=4
        )
        scene = make_scene(num_objects=3, seed=2)
        traj = orbit_trajectory(40, step=0.025, pitch=0.4)
        sysm = SlamSystem(
            cfg, kmax=32, nmax=4096, emax=32768, ba_window=6, omax=8,
            enable_loop_closing=False,
        )
        for i in range(40):
            gray, _, _ = render_scene(scene, jnp.asarray(traj[i]), cfg.intr)
            det = gt_detections(scene, jnp.asarray(traj[i]), cfg.intr)
            sysm.track_mono(
                np.asarray(gray), {k: np.asarray(v) for k, v in det.items()}
            )
        assert sysm.initialized
        valid = np.asarray(sysm.objects.valid)
        assert valid.sum() >= 2, "mono mode spawned too few objects"
        labels_est = np.asarray(sysm.objects.label)[valid]
        assert set(labels_est) <= set(np.asarray(scene.labels).tolist())

        # Gauge-free accuracy metric: reproject the estimated ellipsoids into
        # frames through the ESTIMATED trajectory and compare against the
        # GT detector's bboxes (a mono map is only defined up to a drifting
        # similarity, so a single global Sim3 alignment of centers mixes
        # trajectory drift into the object error; reprojection is what the
        # monocular pipeline can actually be held to).
        ious = []
        for fidx in [20, 30, 39]:
            det = gt_detections(scene, jnp.asarray(traj[fidx]), cfg.intr)
            dvalid = np.asarray(det["valid"])
            dbox = np.asarray(det["bbox"])
            dlab = np.asarray(det["label"])
            Tcw_est = jnp.asarray(sysm.trajectory[fidx])
            e_est = jnp.asarray(np.asarray(sysm.objects.ellipsoid)[valid])
            pb = np.asarray(
                jax.vmap(lambda e: quadric.project_bbox(e, Tcw_est, cfg.intr.K))(
                    e_est
                )
            )
            for b_est, l_est in zip(pb, labels_est):
                for b_gt, l_gt, v in zip(dbox, dlab, dvalid):
                    if not v or l_gt != l_est:
                        continue
                    x0 = max(b_est[0], b_gt[0]); y0 = max(b_est[1], b_gt[1])
                    x1 = min(b_est[2], b_gt[2]); y1 = min(b_est[3], b_gt[3])
                    inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
                    a = (b_est[2] - b_est[0]) * (b_est[3] - b_est[1])
                    b = (b_gt[2] - b_gt[0]) * (b_gt[3] - b_gt[1])
                    ious.append(inter / max(a + b - inter, 1e-9))
        ious = np.asarray(ious)
        assert len(ious) >= 3, "no reprojected object/detection overlaps"
        assert (ious > 0.5).sum() >= 2, ious

        # Coarse global bound (drift-limited): after Sim3 trajectory
        # alignment every object center lands in the right room region.
        est = np.stack(sysm.trajectory)
        k = len(est) - 30
        p_est = positions_from_Tcw(est[k:].astype(np.float64))
        p_gt = positions_from_Tcw(traj[k:40].astype(np.float64))
        s, R, t = umeyama_alignment(p_est, p_gt, with_scale=True)
        centers_slam = np.asarray(sysm.objects.ellipsoid)[valid, :3]
        centers_world = (s * (R @ centers_slam.T)).T + t
        gt_centers = np.asarray(scene.ellipsoids)[:, :3]
        for c in centers_world:
            assert np.linalg.norm(gt_centers - c, axis=1).min() < 1.2, c
