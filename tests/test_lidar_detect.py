"""LiDAR proposal generator tests on synthetic scans."""

import numpy as np
import pytest

from qsp_slam_tpu.core.camera import Intrinsics
from qsp_slam_tpu.perception.lidar_detect import _voxel_cluster, lidar_detections


def make_intr():
    import jax.numpy as jnp

    return Intrinsics(
        jnp.float32(718.0), jnp.float32(718.0), jnp.float32(607.0), jnp.float32(185.0)
    )


class TestClustering:
    def test_two_separated_blobs(self, rng):
        a = rng.normal(0, 0.3, (200, 3)) + [0, 0, 5]
        b = rng.normal(0, 0.3, (200, 3)) + [6, 0, 5]
        labels = _voxel_cluster(np.concatenate([a, b]))
        la, lb = labels[:200], labels[200:]
        assert len(np.unique(la)) <= 2  # mostly one component each
        # dominant labels differ
        assert np.bincount(la).argmax() != np.bincount(lb).argmax()


class TestLidarDetections:
    def test_car_sized_cluster_detected(self, rng):
        # Ground plane (y = 1.7, camera up = -y) + a car-sized box of points.
        gx = rng.uniform(-15, 15, 3000)
        gz = rng.uniform(2, 40, 3000)
        ground = np.stack([gx, np.full(3000, 1.7), gz], -1)
        car = np.stack(
            [
                rng.uniform(2.0, 3.8, 500),
                rng.uniform(0.3, 1.6, 500),
                rng.uniform(9.0, 13.0, 500),
            ],
            -1,
        )
        scan = np.concatenate([ground, car]).astype(np.float32)
        scan += rng.normal(0, 0.01, scan.shape)
        det = lidar_detections(scan, make_intr(), 1241, 376)
        assert det["valid"].sum() >= 1
        b = det["bbox"][det["valid"]][0]
        # Project car center, must be inside the detected bbox.
        c = car.mean(0)
        u = 718.0 * c[0] / c[2] + 607.0
        v = 718.0 * c[1] / c[2] + 185.0
        assert b[0] <= u <= b[2] and b[1] <= v <= b[3], (b, u, v)

    def test_ground_only_scan_yields_nothing(self, rng):
        gx = rng.uniform(-15, 15, 4000)
        gz = rng.uniform(2, 40, 4000)
        scan = np.stack([gx, np.full(4000, 1.7), gz], -1).astype(np.float32)
        scan += rng.normal(0, 0.01, scan.shape)
        det = lidar_detections(scan, make_intr(), 1241, 376)
        assert det["valid"].sum() == 0
