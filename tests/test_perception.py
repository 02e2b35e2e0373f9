"""Tests for ground-plane RANSAC and depth->ellipsoid extraction on rendered
ground-truth scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie, quadric
from qsp_slam_tpu.data.render import (
    Scene,
    gt_detections,
    make_scene,
    render_scene,
)
from qsp_slam_tpu.perception.ellipsoid_fit import fit_ellipsoid_depth
from qsp_slam_tpu.perception.groundplane import estimate_ground_plane
from qsp_slam_tpu.slam.tracking import TrackingConfig


@pytest.fixture(scope="module")
def scene_frame():
    cfg = TrackingConfig()
    scene = make_scene(num_objects=3, seed=2)
    # Camera pitched 25 deg down (+x rotation tilts the optical axis toward +y = down) (table-top viewpoint, as in fr2_dishes) so
    # the floor is inside the frustum.
    T_cw = lie.exp_se3(jnp.asarray([0, 0, 0, 0.44, 0, 0], jnp.float32))
    gray, depth, inst = render_scene(scene, T_cw, cfg.intr)
    return cfg, scene, T_cw, gray, depth, inst


class TestGroundPlane:
    def test_recovers_floor(self, scene_frame):
        cfg, scene, T_cw, gray, depth, inst = scene_frame
        res = estimate_ground_plane(depth, cfg.intr, jax.random.PRNGKey(0))
        assert bool(res.ok)
        pi = np.asarray(res.plane)
        # Expected: world floor plane (0,-1,0,2.2) transformed to camera frame.
        from qsp_slam_tpu.core import plane as plane_mod

        pi_exp = np.asarray(
            plane_mod.transform(jnp.asarray([0.0, -1.0, 0.0, 2.2]), T_cw)
        )
        np.testing.assert_allclose(pi[:3], pi_exp[:3], atol=0.03)
        assert abs(pi[3] - pi_exp[3]) < 0.05, (pi, pi_exp)

    def test_detections_cover_objects(self, scene_frame):
        cfg, scene, T_cw, gray, depth, inst = scene_frame
        det = gt_detections(scene, T_cw, cfg.intr)
        valid = np.asarray(det["valid"])
        assert valid.sum() >= 1
        # Each valid bbox should contain its object's instance pixels.
        inst_np = np.asarray(inst)
        for o in np.where(valid)[0]:
            b = np.asarray(det["bbox"][o])
            ys, xs = np.where(inst_np == o)
            if len(xs) < 50:
                continue
            assert xs.min() >= b[0] - 2 and xs.max() <= b[2] + 2
            assert ys.min() >= b[1] - 2 and ys.max() <= b[3] + 2


class TestEllipsoidFit:
    def test_fit_matches_gt(self, scene_frame):
        cfg, scene, T_cw, gray, depth, inst = scene_frame
        gp = estimate_ground_plane(depth, cfg.intr, jax.random.PRNGKey(0))
        det = gt_detections(scene, T_cw, cfg.intr)
        valid = np.asarray(det["valid"])
        checked = 0
        for o in np.where(valid)[0]:
            bbox = det["bbox"][o]
            res = fit_ellipsoid_depth(
                depth, bbox, gp.plane, cfg.intr, jax.random.PRNGKey(o)
            )
            if not bool(res.ok):
                continue
            e_w = np.asarray(
                quadric.transform_ellipsoid(res.ellipsoid_cam, lie.inv_se3(T_cw))
            )
            e_cam = e_w  # compare in world frame
            e_w_gt = np.asarray(scene.ellipsoids[o])
            # Center: the visible surface is the front half, so allow a
            # generous tolerance (depth-only sensing sees no back side).
            c_err = np.linalg.norm(e_cam[0:3] - e_w_gt[0:3])
            max_half = e_w_gt[6:9].max()
            assert c_err < max_half * 1.0, (e_cam[:3], e_w_gt[:3])
            # Extents should be within 3x of GT scale (front-surface only).
            ratio = np.sort(e_cam[6:9]) / np.sort(e_w_gt[6:9])
            assert ratio.max() < 3.0 and ratio.min() > 0.2, ratio
            # Projection IoU score should be meaningful.
            assert float(res.prob) > 0.3
            checked += 1
        assert checked >= 1

    def test_rejects_empty_region(self, scene_frame):
        cfg, scene, T_cw, gray, depth, inst = scene_frame
        gp = estimate_ground_plane(depth, cfg.intr, jax.random.PRNGKey(0))
        # A bbox on an empty wall area; points there lie on the distant wall
        # plane — flat cluster, but should still "fit" something; the key
        # check is that ok=False for a bbox with no valid depth.
        empty_depth = jnp.zeros_like(depth)
        res = fit_ellipsoid_depth(
            empty_depth, jnp.asarray([100.0, 100.0, 200.0, 200.0]), gp.plane,
            cfg.intr, jax.random.PRNGKey(9),
        )
        assert not bool(res.ok)
