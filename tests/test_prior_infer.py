"""Monocular bbox-only ellipsoid inference tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie, quadric, plane as plane_mod
from qsp_slam_tpu.opt.quadric_factors import ObjectObservations
from qsp_slam_tpu.perception.prior_infer import generate_init_guess, refine_with_priors
from qsp_slam_tpu.slam.tracking import TrackingConfig


class TestPriorInfer:
    def _setup(self):
        cfg = TrackingConfig()
        # World: floor at y=+2 (normal up = -y); camera pitched down 25 deg.
        T_cw = lie.exp_se3(jnp.asarray([0, 0, 0, 0.44, 0, 0], jnp.float32))
        floor_w = jnp.asarray([0.0, -1.0, 0.0, 2.0])
        floor_cam = plane_mod.transform(floor_w, T_cw)
        # GT object resting on the floor, 3 m out: half axes (0.25, 0.2, 0.3),
        # z-axis up (roll = +pi/2 maps z -> -y = up).
        e_gt_w = jnp.asarray([0.3, 1.7, 3.0, jnp.pi / 2, 0, 0, 0.25, 0.2, 0.3])
        return cfg, T_cw, floor_w, floor_cam, e_gt_w

    def test_init_guess_from_bbox(self):
        cfg, T_cw, floor_w, floor_cam, e_gt_w = self._setup()
        bbox = quadric.project_bbox(e_gt_w, T_cw, cfg.intr.K)
        e_cam = generate_init_guess(
            bbox, floor_cam, cfg.intr, aspect_d=0.25 / 0.3, aspect_e=0.2 / 0.3
        )
        e_w = quadric.transform_ellipsoid(e_cam, lie.inv_se3(T_cw))
        c_err = np.linalg.norm(np.asarray(e_w[0:3] - e_gt_w[0:3]))
        assert c_err < 0.35, (np.asarray(e_w[:3]), np.asarray(e_gt_w[:3]))
        ratio = np.sort(np.asarray(e_w[6:9])) / np.sort(np.asarray(e_gt_w[6:9]))
        assert ratio.max() < 2.0 and ratio.min() > 0.5, ratio

    def test_multiview_refinement_converges(self):
        cfg, T_cw, floor_w, floor_cam, e_gt_w = self._setup()
        # Observations from 6 viewpoints.
        Tcws, bboxes = [], []
        for i in range(6):
            xi = jnp.asarray([0.25 * i, 0, 0.05 * i, 0.44, 0.04 * i, 0], jnp.float32)
            T = lie.exp_se3(xi)
            Tcws.append(T)
            bboxes.append(quadric.project_bbox(e_gt_w, T, cfg.intr.K))
        obs = ObjectObservations(
            Tcw=jnp.stack(Tcws), bbox=jnp.stack(bboxes), weight=jnp.ones(6)
        )
        e0 = generate_init_guess(
            bboxes[0], plane_mod.transform(floor_w, Tcws[0]), cfg.intr,
            aspect_d=0.25 / 0.3, aspect_e=0.2 / 0.3,
        )
        e0_w = quadric.transform_ellipsoid(e0, lie.inv_se3(Tcws[0]))
        e_ref, cost = refine_with_priors(
            e0_w, obs, cfg.intr.K, floor_w,
            aspect_d=jnp.float32(0.25 / 0.3), aspect_e=jnp.float32(0.2 / 0.3),
        )
        c_err0 = np.linalg.norm(np.asarray(e0_w[0:3] - e_gt_w[0:3]))
        c_err = np.linalg.norm(np.asarray(e_ref[0:3] - e_gt_w[0:3]))
        assert c_err < 0.12, (c_err0, c_err)
        assert c_err <= c_err0 + 1e-6
        ratio = np.sort(np.asarray(e_ref[6:9])) / np.sort(np.asarray(e_gt_w[6:9]))
        assert ratio.max() < 1.4 and ratio.min() > 0.7, ratio
