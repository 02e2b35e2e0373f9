"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding tests use XLA's
host-platform device-count override (SURVEY.md §4 test strategy).

Note: this image's sitecustomize imports jax at interpreter startup (axon TPU
tunnel), so env vars alone are too late — but backends initialize lazily, so
`jax.config.update` still wins as long as it runs before the first device use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    XLA:CPU segfaults inside `backend_compile_and_load` once a single
    process accumulates ~66 test files' worth of compiled programs
    (reproduced deterministically at tests/test_kitti_e2e.py when run
    after the 13 files preceding it; any subset passes).  Releasing the
    executable cache per module keeps the compiler state bounded; modules
    re-compile shared signatures, which costs time but stays green.
    """
    yield
    jax.clear_caches()
