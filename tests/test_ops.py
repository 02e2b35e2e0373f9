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
