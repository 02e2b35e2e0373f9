"""Unit tests for SO3/SE3/Sim3 ops: round trips, closed forms, autodiff safety."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie


def random_rotvecs(rng, n, max_angle=3.0):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angles = rng.uniform(0.0, max_angle, size=(n, 1))
    return (axis * angles).astype(np.float32)


class TestSO3:
    def test_exp_orthonormal(self, rng):
        w = random_rotvecs(rng, 64)
        R = lie.exp_so3(jnp.asarray(w))
        eye = jnp.eye(3)
        err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye).max()
        assert err < 1e-5
        assert jnp.abs(jnp.linalg.det(R) - 1.0).max() < 1e-5

    def test_exp_log_roundtrip(self, rng):
        w = random_rotvecs(rng, 256, max_angle=3.1)
        w2 = lie.log_so3(lie.exp_so3(jnp.asarray(w)))
        np.testing.assert_allclose(np.asarray(w2), w, atol=2e-4)

    def test_log_near_pi(self, rng):
        w = random_rotvecs(rng, 64, max_angle=1.0)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * (np.pi - 1e-5)
        R = lie.exp_so3(jnp.asarray(w))
        w2 = np.asarray(lie.log_so3(R))
        # Sign of axis is ambiguous exactly at pi; compare rotations instead.
        R2 = lie.exp_so3(jnp.asarray(w2))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-3)

    def test_log_identity(self):
        w = lie.log_so3(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-7)

    def test_small_angle_taylor(self):
        w = jnp.array([1e-9, -2e-9, 1e-9], dtype=jnp.float32)
        R = lie.exp_so3(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_grad_at_zero_is_finite(self):
        g = jax.grad(lambda w: jnp.sum(lie.exp_so3(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_jacobian_inverse(self, rng):
        w = jnp.asarray(random_rotvecs(rng, 32, max_angle=2.5))
        J = lie.left_jacobian_so3(w)
        Jinv = lie.inv_left_jacobian_so3(w)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        assert jnp.abs(J @ Jinv - eye).max() < 1e-4


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(
            np.concatenate(
                [rng.normal(size=(128, 3)), random_rotvecs(rng, 128, 2.8)], axis=-1
            ),
            dtype=jnp.float32,
        )
        xi2 = lie.log_se3(lie.exp_se3(xi))
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-4)

    def test_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 6)), dtype=jnp.float32)
        T = lie.exp_se3(xi)
        eye = jnp.broadcast_to(jnp.eye(4), T.shape)
        assert jnp.abs(T @ lie.inv_se3(T) - eye).max() < 1e-5

    def test_transform_points(self, rng):
        xi = jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32)
        T = lie.exp_se3(xi)
        pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
        out = lie.transform_points(T, pts)
        expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_adjoint_identity(self, rng):
        # Adj(T) xi == log(T exp(xi) T^-1) for small xi.
        xi_T = jnp.asarray(rng.normal(size=(6,)) * 0.5, dtype=jnp.float64)
        T = lie.exp_se3(xi_T)
        xi = jnp.asarray(rng.normal(size=(6,)) * 1e-3, dtype=jnp.float64)
        lhs = lie.adjoint_se3(T) @ xi
        rhs = lie.log_se3(T @ lie.exp_se3(xi) @ lie.inv_se3(T))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


class TestSim3:
    def test_exp_scale(self):
        xi = jnp.zeros(7).at[6].set(0.7)
        T = lie.exp_sim3(xi)
        np.testing.assert_allclose(float(lie.sim3_scale(T)), np.exp(0.7), rtol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        v = rng.normal(size=(64, 3))
        w = random_rotvecs(rng, 64, 2.5)
        s = rng.uniform(-0.8, 0.8, size=(64, 1))
        xi = jnp.asarray(np.concatenate([v, w, s], axis=-1), dtype=jnp.float32)
        xi2 = lie.log_sim3(lie.exp_sim3(xi))
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-3)

    def test_reduces_to_se3(self, rng):
        xi6 = jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        np.testing.assert_allclose(
            np.asarray(lie.exp_sim3(xi7)), np.asarray(lie.exp_se3(xi6)), atol=1e-5
        )

    def test_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
        T = lie.exp_sim3(xi)
        eye = jnp.broadcast_to(jnp.eye(4), T.shape)
        assert jnp.abs(T @ lie.inv_sim3(T) - eye).max() < 1e-5

    def test_grad_at_zero(self):
        g = jax.grad(lambda x: jnp.sum(lie.exp_sim3(x)))(jnp.zeros(7))
        assert np.all(np.isfinite(np.asarray(g)))


class TestQuat:
    def test_roundtrip(self, rng):
        w = jnp.asarray(random_rotvecs(rng, 128, 3.1))
        R = lie.exp_so3(w)
        q = lie.rotmat_to_quat(R)
        R2 = lie.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_identity(self):
        q = lie.rotmat_to_quat(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-7)
