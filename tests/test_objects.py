"""Object landmark layer tests: association, integration, refinement, and the
full object-SLAM loop on a rendered scene (config-2 analogue: quadric
landmarks from detections)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie, quadric
from qsp_slam_tpu.data.render import gt_detections, make_scene, render_scene
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.objects import (
    associate_detections,
    empty_objects,
    merge_duplicates,
)
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig


def looking_down_pose(i=0):
    # pitch down 25 deg, slight translation per index
    xi = jnp.asarray([0.05 * i, 0, 0.02 * i, 0.44, 0, 0], jnp.float32)
    return lie.exp_se3(xi)


class TestAssociation:
    def test_matches_projected_objects(self):
        cfg = TrackingConfig()
        table = empty_objects(8)
        e = jnp.asarray([0.5, 1.8, 3.0, 0.0, 0.3, 0.0, 0.3, 0.25, 0.3], jnp.float32)
        table = table._replace(
            ellipsoid=table.ellipsoid.at[0].set(e),
            label=table.label.at[0].set(2),
            valid=table.valid.at[0].set(True),
            num_objects=jnp.int32(1),
        )
        Tcw = looking_down_pose()
        bbox_gt = quadric.project_bbox(e, Tcw, cfg.intr.K)
        det_bbox = jnp.stack([bbox_gt + 5.0, jnp.asarray([10.0, 10, 60, 60])])
        det_label = jnp.asarray([2, 2], jnp.int32)
        det_valid = jnp.asarray([True, True])
        a = associate_detections(table, Tcw, cfg.intr.K, det_bbox, det_label, det_valid)
        assert int(a.obj_for_det[0]) == 0  # near-perfect overlap
        assert int(a.obj_for_det[1]) == -1  # unrelated box -> new object

    def test_label_gate(self):
        cfg = TrackingConfig()
        table = empty_objects(8)
        e = jnp.asarray([0.5, 1.8, 3.0, 0.0, 0.3, 0.0, 0.3, 0.25, 0.3], jnp.float32)
        table = table._replace(
            ellipsoid=table.ellipsoid.at[0].set(e),
            label=table.label.at[0].set(2),
            valid=table.valid.at[0].set(True),
            num_objects=jnp.int32(1),
        )
        Tcw = looking_down_pose()
        bbox_gt = quadric.project_bbox(e, Tcw, cfg.intr.K)
        a = associate_detections(
            table, Tcw, cfg.intr.K, bbox_gt[None], jnp.asarray([5], jnp.int32),
            jnp.asarray([True]),
        )
        assert int(a.obj_for_det[0]) == -1  # wrong label


class TestMerge:
    def test_merges_coincident(self):
        table = empty_objects(8)
        e = jnp.asarray([1.0, 1.0, 1.0, 0, 0, 0, 0.3, 0.3, 0.3], jnp.float32)
        for i, off in enumerate([0.0, 0.1, 2.0]):
            table = table._replace(
                ellipsoid=table.ellipsoid.at[i].set(e.at[0].add(off)),
                label=table.label.at[i].set(1),
                valid=table.valid.at[i].set(True),
            )
        table = table._replace(num_objects=jnp.int32(3))
        out = merge_duplicates(table, dist_threshold=0.5)
        v = np.asarray(out.valid[:3])
        np.testing.assert_array_equal(v, [True, False, True])


@pytest.mark.slow
class TestObjectSlamE2E:
    def test_objects_converge_to_gt(self):
        cfg = TrackingConfig(orb=OrbConfig(num_features=500))
        scene = make_scene(num_objects=3, seed=2)
        sysm = SlamSystem(cfg, kmax=16, nmax=2048, emax=16384, ba_window=6, omax=16)
        num_frames = 25
        base = looking_down_pose()
        for i in range(num_frames):
            # gentle lateral track so objects stay visible
            xi = jnp.asarray([0.035 * i, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
            T_cw = np.asarray(lie.exp_se3(xi) @ base, np.float32)
            gray, depth, inst = render_scene(scene, jnp.asarray(T_cw), cfg.intr)
            det = gt_detections(scene, jnp.asarray(T_cw), cfg.intr)
            det_np = {k: np.asarray(v) for k, v in det.items()}
            sysm.track_rgbd(np.asarray(gray), np.asarray(depth), det_np)

        # Only well-supported objects count (1-obs objects are unculled
        # pending landmarks — the reference's MapObjectCulling drops them).
        valid = np.asarray(sysm.objects.valid) & (
            np.asarray(sysm.objects.obs_count) >= 2
        )
        # SLAM world = first camera frame; map estimates back to renderer
        # world via the first GT pose before comparing.
        est_slam = jnp.asarray(np.asarray(sysm.objects.ellipsoid)[valid])
        est = np.asarray(quadric.transform_ellipsoid(est_slam, lie.inv_se3(base)))
        est_labels = np.asarray(sysm.objects.label)[valid]
        gt = np.asarray(scene.ellipsoids)
        gt_labels = np.asarray(scene.labels)
        # At least one GT object recovered; no runaway duplicates.
        assert 1 <= valid.sum() <= 6, valid.sum()
        matched = 0
        for e_est, l_est in zip(est, est_labels):
            d = np.linalg.norm(gt[:, 0:3] - e_est[0:3], axis=1)
            j = d.argmin()
            if d[j] < 0.4 and gt_labels[j] == l_est:
                matched += 1
                # size within 2.5x per axis (depth sees the front surface)
                ratio = np.sort(e_est[6:9]) / np.sort(gt[j, 6:9])
                assert ratio.max() < 2.5 and ratio.min() > 0.25, ratio
        assert matched >= 1
