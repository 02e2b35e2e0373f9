"""Dynamic-object velocity model (parity: MapObject velocity members +
forward extrapolation, `src/LocalMapping_util.cc:151-192`)."""

import jax.numpy as jnp
import numpy as np

from qsp_slam_tpu.core import quadric
from qsp_slam_tpu.slam.objects import (
    Associations,
    advance_dynamic_objects,
    associate_detections,
    empty_objects,
    integrate_keyframe,
)
from qsp_slam_tpu.slam.tracking import TrackingConfig

K = TrackingConfig().intr.K
TCW = jnp.eye(4, dtype=jnp.float32)  # camera at world origin, +z forward
VEL = np.array([0.4, 0.0, 0.0], np.float32)  # m per keyframe index


def _ellipsoid_at(kf):
    # Big (0.9 m half-width) and far (z=6) so the IoU gate still matches a
    # landmark up to 2 keyframes stale, while 0.4 m/KF of motion exceeds the
    # dynamic_dist=0.35 vote threshold.
    c = np.array([-1.2, 0.0, 6.0], np.float32) + VEL * kf
    return jnp.asarray([*c, 0.0, 0.3, 0.0, 0.9, 0.5, 0.6], jnp.float32)


def _det(kf):
    e_w = _ellipsoid_at(kf)
    bbox = quadric.project_bbox(e_w[None], TCW[None], K)[0]
    e_cam = quadric.transform_ellipsoid(e_w, TCW)  # world == camera here
    return bbox, e_cam


def _observe(table, kf):
    bbox, e_cam = _det(kf)
    assoc = associate_detections(
        table, TCW, K, bbox[None], jnp.asarray([1]), jnp.asarray([True])
    )
    table = integrate_keyframe(
        table, TCW, bbox[None], jnp.asarray([1]), jnp.asarray([0.9]),
        jnp.asarray([True]), e_cam[None], jnp.asarray([True]), assoc,
        kf_id=jnp.int32(kf),
    )
    return table, assoc


class TestVelocityModel:
    def test_flags_dynamic_and_learns_velocity(self):
        table = empty_objects(omax=4)
        for kf in range(4):
            table, assoc = _observe(table, kf)
            if kf > 0:
                assert int(assoc.obj_for_det[0]) == 0, f"lost at kf {kf}"
        assert bool(table.dynamic[0])
        v = np.asarray(table.vel_center[0])
        assert np.linalg.norm(v - VEL) < 0.2, v
        # Once dynamic, the landmark follows the latest measurement.
        np.testing.assert_allclose(
            np.asarray(table.ellipsoid[0, :3]),
            np.asarray(_ellipsoid_at(3)[:3]), atol=1e-4,
        )

    def test_extrapolation_keeps_association(self):
        table = empty_objects(omax=4)
        for kf in range(4):
            table, _ = _observe(table, kf)
        # Object unobserved for 3 keyframes, then reappears at kf 7.
        bbox7, _ = _det(7)

        stale = associate_detections(
            table, TCW, K, bbox7[None], jnp.asarray([1]), jnp.asarray([True])
        )
        assert int(stale.obj_for_det[0]) == -1  # 1.5 m of motion: IoU gate fails

        advanced = advance_dynamic_objects(table, jnp.int32(7))
        pred_c = np.asarray(advanced.ellipsoid[0, :3])
        true_c = np.asarray(_ellipsoid_at(7)[:3])
        assert np.linalg.norm(pred_c - true_c) < 0.35, (pred_c, true_c)
        again = associate_detections(
            advanced, TCW, K, bbox7[None], jnp.asarray([1]), jnp.asarray([True])
        )
        assert int(again.obj_for_det[0]) == 0

        # Idempotent: advancing to the same keyframe twice moves nothing.
        twice = advance_dynamic_objects(advanced, jnp.int32(7))
        np.testing.assert_array_equal(
            np.asarray(twice.ellipsoid), np.asarray(advanced.ellipsoid)
        )

    def test_static_objects_untouched(self):
        table = empty_objects(omax=4)
        e_w = _ellipsoid_at(0)
        bbox = quadric.project_bbox(e_w[None], TCW[None], K)[0]
        e_cam = quadric.transform_ellipsoid(e_w, TCW)
        assoc = Associations(
            obj_for_det=jnp.asarray([-1], jnp.int32), iou=jnp.asarray([0.0])
        )
        table = integrate_keyframe(
            table, TCW, bbox[None], jnp.asarray([1]), jnp.asarray([0.9]),
            jnp.asarray([True]), e_cam[None], jnp.asarray([True]), assoc,
            kf_id=jnp.int32(0),
        )
        before = np.asarray(table.ellipsoid)
        after = advance_dynamic_objects(table, jnp.int32(5))
        np.testing.assert_array_equal(before, np.asarray(after.ellipsoid))
