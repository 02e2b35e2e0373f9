"""Pallas kernel tests (interpreter mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.ops.hamming import hamming_matrix_packed


class TestPackedHamming:
    def test_matches_bruteforce(self, rng):
        A, B = 70, 130  # deliberately not tile-aligned (padding path)
        a = rng.integers(0, 2**32, (A, 8), dtype=np.uint64).astype(np.uint32)
        b = rng.integers(0, 2**32, (B, 8), dtype=np.uint64).astype(np.uint32)
        out = np.asarray(
            hamming_matrix_packed(jnp.asarray(a), jnp.asarray(b), interpret=True)
        )
        for i in range(0, A, 23):
            for j in range(0, B, 41):
                ref = bin(
                    int.from_bytes((a[i] ^ b[j]).tobytes(), "little")
                ).count("1")
                assert out[i, j] == ref

    def test_zero_distance_on_self(self, rng):
        a = rng.integers(0, 2**32, (32, 8), dtype=np.uint64).astype(np.uint32)
        out = np.asarray(
            hamming_matrix_packed(jnp.asarray(a), jnp.asarray(a), interpret=True)
        )
        assert (np.diag(out) == 0).all()
        assert (out == out.T).all()


class TestFastPallas:
    """Fused FAST+NMS kernel == the XLA reference formulation."""

    def _image(self, rng, H=96, W=128):
        img = rng.normal(120.0, 40.0, (H, W)).astype(np.float32)
        # Plant a few strong corners so the test exercises real detections.
        for (y, x) in [(20, 30), (50, 90), (70, 40)]:
            img[y - 2 : y + 3, x - 2 : x + 3] = 30.0
            img[y, x] = 240.0
        return np.clip(img, 0, 255)

    def test_matches_xla_formulation(self, rng):
        from qsp_slam_tpu.frontend.fast import fast_score, nms3x3
        from qsp_slam_tpu.ops.fast_pallas import fast_score_nms_pallas

        img = jnp.asarray(self._image(rng))
        ref = np.asarray(nms3x3(fast_score(img, 20.0)))
        got = np.asarray(fast_score_nms_pallas(img, 20.0, interpret=True))
        # Same surviving corner set, same scores.
        np.testing.assert_array_equal(got > 0, ref > 0)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
        assert (got > 0).sum() >= 3  # the planted corners fire

    def test_threshold_monotonic(self, rng):
        from qsp_slam_tpu.ops.fast_pallas import fast_score_nms_pallas

        img = jnp.asarray(self._image(rng))
        lo = np.asarray(fast_score_nms_pallas(img, 10.0, interpret=True))
        hi = np.asarray(fast_score_nms_pallas(img, 40.0, interpret=True))
        assert (hi > 0).sum() <= (lo > 0).sum()
