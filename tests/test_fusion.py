"""Map-point fusion tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.slam import map as mapmod
from qsp_slam_tpu.slam.local_mapping import fuse_map_points


class TestFusion:
    def test_duplicates_merge_distinct_survive(self, rng):
        m = mapmod.empty_map(8, 256, 1024)
        desc_a = jnp.asarray(
            rng.choice([-1, 1], size=(256,)).astype(np.int8)
        )
        desc_b = jnp.asarray(
            rng.choice([-1, 1], size=(256,)).astype(np.int8)
        )
        pts = jnp.asarray(
            [
                [0.0, 0.0, 2.0],   # 0: original
                [0.01, 0.0, 2.0],  # 1: duplicate of 0 (close + same desc)
                [1.0, 0.0, 2.0],   # 2: distinct position
                [0.012, 0.0, 2.0], # 3: close to 0 but DIFFERENT descriptor
            ],
            jnp.float32,
        )
        descs = jnp.stack([desc_a, desc_a, desc_a, desc_b])
        m, ids = mapmod.add_points(
            m, pts, descs, jnp.zeros(4, jnp.int32), jnp.zeros((4, 3)),
            jnp.ones(4, bool),
        )
        # KF0 sees points 0, 2, 3; KF1 independently triangulated point 1
        # (the duplicate) — co-observed pairs must NOT merge.
        m = mapmod.add_observations(
            m, jnp.int32(0), ids.at[1].set(-1), jnp.zeros((4, 2)),
            jnp.full(4, -1.0), jnp.zeros(4, jnp.int32),
        )
        m = mapmod.add_observations(
            m, jnp.int32(1), jnp.full(4, -1, jnp.int32).at[1].set(ids[1]),
            jnp.zeros((4, 2)), jnp.full(4, -1.0), jnp.zeros(4, jnp.int32),
        )
        m2 = fuse_map_points(m, window_pts=256)
        valid = np.asarray(m2.pt_valid[:4])
        np.testing.assert_array_equal(valid, [True, False, True, True])
        # Edges of the dead duplicate re-point at the survivor.
        dead_edges = np.asarray(m2.ob_pt)[np.asarray(m2.ob_kf) == 1][:1]
        assert dead_edges[0] == int(ids[0])

    def test_chain_merge(self, rng):
        m = mapmod.empty_map(8, 256, 1024)
        d = jnp.asarray(rng.choice([-1, 1], size=(256,)).astype(np.int8))
        pts = jnp.asarray(
            [[0.0, 0, 2], [0.03, 0, 2], [0.06, 0, 2]], jnp.float32
        )  # 0~1 and 1~2 within radius; 0~2 also within? 0.06 > 0.05 -> chain
        m, ids = mapmod.add_points(
            m, pts, jnp.stack([d, d, d]), jnp.zeros(3, jnp.int32),
            jnp.zeros((3, 3)), jnp.ones(3, bool),
        )
        # each point observed from its own keyframe (independent triangulations)
        for k in range(3):
            m = mapmod.add_observations(
                m, jnp.int32(k), jnp.full(3, -1, jnp.int32).at[k].set(ids[k]),
                jnp.zeros((3, 2)), jnp.full(3, -1.0), jnp.zeros(3, jnp.int32),
            )
        m2 = fuse_map_points(m, window_pts=256, radius=0.05)
        valid = np.asarray(m2.pt_valid[:3])
        assert valid[0] and not valid[1] and not valid[2]
        ob_kf = np.asarray(m2.ob_kf)
        ob_pt = np.asarray(m2.ob_pt)
        for k in (1, 2):
            assert ob_pt[(ob_kf == k).argmax()] == int(ids[0])
