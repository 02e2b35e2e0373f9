"""Unit tests for ellipsoid/quadric algebra and projection."""

import jax.numpy as jnp
import numpy as np

from qsp_slam_tpu.core import camera, lie, quadric


def make_intr():
    return camera.Intrinsics(
        fx=jnp.float32(520.9), fy=jnp.float32(521.0), cx=jnp.float32(325.1), cy=jnp.float32(249.7)
    )


class TestEuler:
    def test_roundtrip(self, rng):
        rpy = jnp.asarray(
            rng.uniform([-3, -1.4, -3], [3, 1.4, 3], size=(64, 3)), dtype=jnp.float32
        )
        R = quadric.euler_to_rotmat(rpy)
        rpy2 = quadric.rotmat_to_euler(R)
        np.testing.assert_allclose(np.asarray(rpy2), np.asarray(rpy), atol=1e-4)

    def test_yaw_only(self):
        rpy = jnp.array([0.0, 0.0, np.pi / 2])
        R = np.asarray(quadric.euler_to_rotmat(rpy))
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)


class TestQuadric:
    def test_sphere_projects_to_circle(self):
        # Unit sphere 5m in front of an identity camera.
        e = jnp.array([0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
        intr = make_intr()
        T_cw = jnp.eye(4)
        bbox = np.asarray(quadric.project_bbox(e, T_cw, intr.K))
        # Center of bbox ~ principal point, roughly square.
        cx = (bbox[0] + bbox[2]) / 2
        cy = (bbox[1] + bbox[3]) / 2
        assert abs(cx - 325.1) < 1.0 and abs(cy - 249.7) < 1.0
        w = bbox[2] - bbox[0]
        h = bbox[3] - bbox[1]
        # Half-angle ~ asin(1/5): width ~ 2*fx*tan(asin(1/5)) = 2*fx/sqrt(24)
        expect_w = 2 * 520.9 / np.sqrt(24.0)
        assert abs(w - expect_w) < 2.0
        assert abs(h / w - 521.0 / 520.9) < 0.02

    def test_bbox_contains_sampled_surface(self, rng):
        e = jnp.array([0.4, -0.2, 3.0, 0.3, 0.2, 1.0, 0.5, 0.3, 0.8])
        intr = make_intr()
        T_cw = lie.exp_se3(jnp.array([0.1, 0.0, 0.0, 0.0, 0.05, 0.0]))
        bbox = np.asarray(quadric.project_bbox(e, T_cw, intr.K))
        # Sample surface points of the ellipsoid and project them.
        u = rng.uniform(0, 2 * np.pi, 500)
        v = rng.uniform(0, np.pi, 500)
        sphere = np.stack(
            [np.cos(u) * np.sin(v), np.sin(u) * np.sin(v), np.cos(v)], axis=-1
        )
        T = np.asarray(quadric.similarity_transform(e))
        pts_w = (T[:3, :3] @ sphere.T).T + T[:3, 3]
        pts_c = lie.transform_points(T_cw, jnp.asarray(pts_w, dtype=jnp.float32))
        uv, _ = camera.project(pts_c, intr)
        uv = np.asarray(uv)
        assert uv[:, 0].min() >= bbox[0] - 0.5 and uv[:, 0].max() <= bbox[2] + 0.5
        assert uv[:, 1].min() >= bbox[1] - 0.5 and uv[:, 1].max() <= bbox[3] + 0.5
        # And the bbox should be tight: extremes near the box edges.
        assert uv[:, 0].min() - bbox[0] < 5.0
        assert bbox[2] - uv[:, 0].max() < 5.0

    def test_transform_roundtrip(self, rng):
        e = jnp.asarray(
            np.concatenate(
                [
                    rng.normal(size=(8, 3)),
                    rng.uniform(-1, 1, size=(8, 3)),
                    rng.uniform(0.2, 2.0, size=(8, 3)),
                ],
                axis=-1,
            ),
            dtype=jnp.float32,
        )
        T = lie.exp_se3(jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32))
        e2 = quadric.transform_ellipsoid(quadric.transform_ellipsoid(e, T), lie.inv_se3(T))
        # Compare as quadrics (euler angles may alias).
        Q1 = np.asarray(quadric.dual_quadric(e))
        Q2 = np.asarray(quadric.dual_quadric(e2))
        np.testing.assert_allclose(Q2, Q1, atol=1e-3)

    def test_sim3_transform_scales_axes(self):
        e = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
        s = 2.0
        T = jnp.diag(jnp.array([s, s, s, 1.0]))
        e2 = np.asarray(quadric.transform_ellipsoid(e, T))
        np.testing.assert_allclose(e2[6:9], [2.0, 4.0, 6.0], atol=1e-5)
        np.testing.assert_allclose(e2[0:3], [2.0, 0.0, 0.0], atol=1e-5)

    def test_iou(self):
        a = jnp.array([0.0, 0.0, 2.0, 2.0])
        b = jnp.array([1.0, 1.0, 3.0, 3.0])
        assert abs(float(quadric.bbox_iou(a, b)) - 1.0 / 7.0) < 1e-6
        assert float(quadric.bbox_iou(a, a)) == 1.0
        c = jnp.array([5.0, 5.0, 6.0, 6.0])
        assert float(quadric.bbox_iou(a, c)) == 0.0

    def test_log_error_zero(self, rng):
        e = jnp.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.3, 1.0, 2.0, 0.5])
        err = np.asarray(quadric.ellipsoid_log_error(e, e))
        np.testing.assert_allclose(err, 0.0, atol=1e-6)

    def test_check_observability(self):
        e_front = jnp.array([0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
        e_behind = e_front.at[2].set(-5.0)
        T_cw = jnp.eye(4)
        assert bool(quadric.check_observability(e_front, T_cw))
        assert not bool(quadric.check_observability(e_behind, T_cw))
        # is_ellipse alone is blind to cheirality — that's why the gate exists.
        intr = make_intr()
        P = jnp.einsum("ij,jk->ik", intr.K, T_cw[:3])
        assert bool(quadric.is_ellipse(quadric.project_to_conic(e_behind, P)))

    def test_rotate_about_z_preserves_quadric_for_sphere(self):
        e = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
        e2 = quadric.rotate_about_z(e, jnp.pi / 2)
        np.testing.assert_allclose(
            np.asarray(quadric.dual_quadric(e2)),
            np.asarray(quadric.dual_quadric(e)),
            atol=1e-5,
        )


class TestCamera:
    def test_project_backproject(self, rng):
        intr = make_intr()
        pts = jnp.asarray(
            np.concatenate(
                [rng.normal(size=(32, 2)), rng.uniform(0.5, 5.0, size=(32, 1))], axis=-1
            ),
            dtype=jnp.float32,
        )
        uv, z = camera.project(pts, intr)
        pts2 = camera.backproject(uv, z, intr)
        np.testing.assert_allclose(np.asarray(pts2), np.asarray(pts), atol=1e-4)

    def test_in_image(self):
        intr = make_intr()
        uv = jnp.array([[10.0, 10.0], [-1.0, 5.0], [639.0, 479.0], [640.0, 100.0]])
        mask = np.asarray(camera.in_image(uv, 640, 480))
        np.testing.assert_array_equal(mask, [True, False, True, False])


class TestPlane:
    def test_distance(self):
        from qsp_slam_tpu.core import plane as pl

        pi = jnp.array([0.0, 0.0, 2.0, -4.0])  # z = 2 plane after normalize
        pts = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 1.0]])
        d = np.asarray(pl.point_distance(pi, pts))
        np.testing.assert_allclose(d, [1.0, -1.0], atol=1e-6)

    def test_transform(self, rng):
        from qsp_slam_tpu.core import plane as pl

        pi = pl.normalize(jnp.asarray(rng.normal(size=(4,)), dtype=jnp.float32))
        T = lie.exp_se3(jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32))
        pts = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
        d_before = pl.point_distance(pi, pts)
        pi_t = pl.transform(pi, T)
        d_after = pl.point_distance(pi_t, lie.transform_points(T, pts))
        np.testing.assert_allclose(np.asarray(d_after), np.asarray(d_before), atol=1e-5)
