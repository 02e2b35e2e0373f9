"""Capacity-safety tests: overflow guards, compaction, growth.

Round-1 VERDICT Weak #2: at capacity, clamped scatter writes silently
corrupted the newest keyframe / edge.  These tests pin the new contract:
writes past capacity are DROPPED (state stays consistent), dead slots are
reclaimable by compaction, and host-side growth preserves ids.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qsp_slam_tpu  # noqa: F401 — matmul precision
from qsp_slam_tpu.slam import map as mapmod
from qsp_slam_tpu.slam.loop_closing import (
    empty_loop_state,
    grow_loop_state,
    snapshot_keyframe,
)


def _fill_kfs(m, n):
    ids = []
    for k in range(n):
        T = jnp.eye(4).at[0, 3].set(float(k + 1))
        m, kid = mapmod.add_keyframe(m, T)
        ids.append(int(kid))
    return m, ids


class TestKeyframeOverflow:
    def test_add_past_capacity_is_dropped(self):
        m = mapmod.empty_map(kmax=4, nmax=32, emax=64)
        m, ids = _fill_kfs(m, 4)
        assert ids == [0, 1, 2, 3]
        last = np.asarray(m.kf_Tcw[3]).copy()
        m, kid = mapmod.add_keyframe(m, jnp.eye(4).at[0, 3].set(99.0))
        assert int(kid) == -1
        assert int(m.num_kfs) == 4  # saturated, not wrapped
        np.testing.assert_array_equal(np.asarray(m.kf_Tcw[3]), last)

    def test_observations_for_dropped_kf_are_skipped(self):
        m = mapmod.empty_map(kmax=1, nmax=32, emax=64)
        m, k0 = mapmod.add_keyframe(m, jnp.eye(4))
        m, kid = mapmod.add_keyframe(m, jnp.eye(4))
        assert int(kid) == -1
        P = 4
        m2 = mapmod.add_observations(
            m, kid, jnp.arange(P, dtype=jnp.int32), jnp.ones((P, 2)),
            jnp.full(P, -1.0), jnp.zeros(P, jnp.int32),
        )
        assert int(m2.num_obs) == 0


class TestPointOverflow:
    def test_partial_fill_at_capacity(self):
        m = mapmod.empty_map(kmax=4, nmax=8, emax=64)
        P = 6
        xyz = jnp.arange(P * 3, dtype=jnp.float32).reshape(P, 3)
        desc = jnp.ones((P, 256), jnp.int8)
        ok = jnp.ones(P, bool)
        m, ids1 = mapmod.add_points(
            m, xyz, desc, jnp.zeros(P, jnp.int32), xyz, ok
        )
        assert int(m.num_pts) == 6
        # Second batch: only 2 slots left -> first 2 valid rows land, rest drop.
        m, ids2 = mapmod.add_points(
            m, xyz + 100.0, desc, jnp.zeros(P, jnp.int32), xyz, ok
        )
        assert int(m.num_pts) == 8
        ids2 = np.asarray(ids2)
        assert (ids2 >= 0).sum() == 2
        # The pre-existing point in the last slot region is intact.
        np.testing.assert_allclose(np.asarray(m.pt_xyz[5]), np.asarray(xyz[5]))
        # Landed rows carry the new batch's coordinates.
        landed = ids2[ids2 >= 0]
        got = np.asarray(m.pt_xyz)[landed]
        assert (got >= 100.0).all()

    def test_edge_overflow_drops_tail(self):
        m = mapmod.empty_map(kmax=4, nmax=32, emax=8)
        m, k0 = mapmod.add_keyframe(m, jnp.eye(4))
        P = 6
        pts = jnp.arange(P, dtype=jnp.int32)
        m = mapmod.add_observations(
            m, k0, pts, jnp.ones((P, 2)), jnp.full(P, -1.0), jnp.zeros(P, jnp.int32)
        )
        assert int(m.num_obs) == 6
        marker = np.asarray(m.ob_uv[5]).copy()
        m = mapmod.add_observations(
            m, k0, pts, 7.0 * jnp.ones((P, 2)), jnp.full(P, -1.0),
            jnp.zeros(P, jnp.int32),
        )
        assert int(m.num_obs) == 8  # saturated
        np.testing.assert_array_equal(np.asarray(m.ob_uv[5]), marker)
        # The two slots that fit carry the new batch.
        np.testing.assert_allclose(np.asarray(m.ob_uv[6]), [7.0, 7.0])


class TestCompaction:
    def _littered_map(self):
        m = mapmod.empty_map(kmax=4, nmax=16, emax=32)
        m, k0 = mapmod.add_keyframe(m, jnp.eye(4))
        m, k1 = mapmod.add_keyframe(m, jnp.eye(4).at[0, 3].set(1.0))
        P = 10
        xyz = jnp.arange(P * 3, dtype=jnp.float32).reshape(P, 3)
        m, ids = mapmod.add_points(
            m, xyz, jnp.ones((P, 256), jnp.int8), jnp.zeros(P, jnp.int32),
            xyz, jnp.ones(P, bool),
        )
        m = mapmod.add_observations(
            m, k0, ids, xyz[:, :2], jnp.full(P, -1.0), jnp.zeros(P, jnp.int32)
        )
        m = mapmod.add_observations(
            m, k1, ids, xyz[:, :2] + 1.0, jnp.full(P, -1.0), jnp.zeros(P, jnp.int32)
        )
        # Kill every other point (fusion/culling litter).
        kill = np.zeros(16, bool)
        kill[np.asarray(ids)[::2]] = True
        m = m._replace(pt_valid=m.pt_valid & ~jnp.asarray(kill))
        return m

    def test_compact_edges_preserves_live_set(self):
        m = self._littered_map()
        live_before = {
            (int(k), tuple(np.asarray(m.pt_xyz[p]).round(4)), tuple(np.asarray(uv)))
            for k, p, uv, v in zip(
                np.asarray(m.ob_kf), np.asarray(m.ob_pt),
                np.asarray(m.ob_uv),
                np.asarray(m.ob_valid & m.pt_valid[m.ob_pt]),
            )
            if v
        }
        c = mapmod.compact_edges(m)
        assert int(c.num_obs) == len(live_before)
        assert bool(jnp.all(c.ob_valid[: int(c.num_obs)]))
        assert not bool(jnp.any(c.ob_valid[int(c.num_obs):]))
        live_after = {
            (int(k), tuple(np.asarray(c.pt_xyz[p]).round(4)), tuple(np.asarray(uv)))
            for k, p, uv, v in zip(
                np.asarray(c.ob_kf), np.asarray(c.ob_pt),
                np.asarray(c.ob_uv), np.asarray(c.ob_valid),
            )
            if v
        }
        assert live_after == live_before

    def test_compact_points_remaps_edges(self):
        m = self._littered_map()
        # Record (kf, point-xyz, uv) content of live edges.
        alive = np.asarray(m.ob_valid & m.pt_valid[m.ob_pt])
        content_before = sorted(
            (int(k), tuple(np.asarray(m.pt_xyz[p]).round(4)))
            for k, p, v in zip(np.asarray(m.ob_kf), np.asarray(m.ob_pt), alive)
            if v
        )
        c = mapmod.compact_points(m)
        n_live = int(jnp.sum(m.pt_valid))
        assert int(c.num_pts) == n_live
        assert bool(jnp.all(c.pt_valid[:n_live]))
        assert not bool(jnp.any(c.pt_valid[n_live:]))
        content_after = sorted(
            (int(k), tuple(np.asarray(c.pt_xyz[p]).round(4)))
            for k, p, v in zip(
                np.asarray(c.ob_kf), np.asarray(c.ob_pt), np.asarray(c.ob_valid)
            )
            if v
        )
        assert content_after == content_before
        # Every live edge now points at a live, in-range point.
        assert bool(jnp.all(~c.ob_valid | (c.ob_pt < n_live)))


class TestGrowth:
    def test_grow_map_preserves_prefix(self):
        m = self._make()
        g = mapmod.grow_map(m, kmax=8, nmax=32, emax=64)
        assert g.capacity == (8, 32, 64)
        k0, n0, e0 = m.capacity
        np.testing.assert_array_equal(np.asarray(g.kf_Tcw[:k0]), np.asarray(m.kf_Tcw))
        np.testing.assert_array_equal(np.asarray(g.pt_xyz[:n0]), np.asarray(m.pt_xyz))
        np.testing.assert_array_equal(np.asarray(g.ob_uv[:e0]), np.asarray(m.ob_uv))
        assert int(g.num_kfs) == int(m.num_kfs)
        assert int(g.num_pts) == int(m.num_pts)
        assert int(g.num_obs) == int(m.num_obs)
        # Tail of ob_ur keeps the mono fill value.
        assert float(g.ob_ur[-1]) == -1.0

    def _make(self):
        m = mapmod.empty_map(kmax=4, nmax=16, emax=32)
        m, k0 = mapmod.add_keyframe(m, jnp.eye(4).at[1, 3].set(2.0))
        P = 5
        xyz = jnp.arange(P * 3, dtype=jnp.float32).reshape(P, 3)
        m, ids = mapmod.add_points(
            m, xyz, jnp.ones((P, 256), jnp.int8), jnp.zeros(P, jnp.int32),
            xyz, jnp.ones(P, bool),
        )
        return mapmod.add_observations(
            m, k0, ids, xyz[:, :2], jnp.full(P, -1.0), jnp.zeros(P, jnp.int32)
        )

    def test_grow_loop_state(self):
        ls = empty_loop_state(kmax=2, snap=8)
        F = 8
        desc = jnp.ones((F, 256), jnp.int8)
        ok = jnp.ones(F, bool)
        pts = jnp.zeros((F, 3))
        xy = jnp.zeros((F, 2))
        ls = snapshot_keyframe(ls, desc, ok, pts, ok, xy)
        ls = snapshot_keyframe(ls, -desc, ok, pts, ok, xy)
        # At capacity the third snapshot is dropped, not clamp-written.
        ls_sat = snapshot_keyframe(ls, desc * 0, ok, pts, ok, xy)
        assert int(ls_sat.db.count) == 2
        np.testing.assert_array_equal(
            np.asarray(ls_sat.kf_desc[1]), np.asarray(ls.kf_desc[1])
        )
        g = grow_loop_state(ls, 4)
        assert g.kf_desc.shape[0] == 4
        assert int(g.db.count) == 2
        np.testing.assert_array_equal(np.asarray(g.kf_desc[:2]), np.asarray(ls.kf_desc))
        g2 = snapshot_keyframe(g, desc * 0, ok, pts, ok, xy)
        assert int(g2.db.count) == 3


class TestSystemElasticity:
    """End-to-end: a system started with tiny capacities survives a long
    sequence by growing/compacting, and still tracks."""

    def test_long_run_grows_and_stays_consistent(self):
        from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
        from qsp_slam_tpu.eval.ate import ate_rmse
        from qsp_slam_tpu.frontend.orb import OrbConfig
        from qsp_slam_tpu.slam.system import SlamSystem
        from qsp_slam_tpu.slam.tracking import TrackingConfig

        # kf_max_interval forces >4 keyframes over the orbit regardless of
        # how well tracking holds its inliers on the textured room.
        cfg = TrackingConfig(orb=OrbConfig(num_features=300), kf_max_interval=5)
        room = make_room()
        n = 40
        Tcw_gt = orbit_trajectory(n)
        sysm = SlamSystem(
            cfg, kmax=4, nmax=512, emax=2048, ba_window=4,
            enable_objects=False, enable_loop_closing=False,
        )
        for i in range(n):
            gray, depth = render_frame(room, Tcw_gt[i], cfg.intr)
            sysm.track_rgbd(gray, depth)
        ev = sysm.stats.get("capacity_events", [])
        kinds = {e[0] for e in ev}
        assert "grow_kfs" in kinds  # 4 KFs cannot hold a 40-frame orbit
        assert sysm.kmax > 4
        m = sysm.map_state
        # Invariants: counters within caps, no validity past the counters.
        assert int(m.num_kfs) <= sysm.kmax
        assert int(m.num_pts) <= sysm.nmax
        assert int(m.num_obs) <= sysm.emax
        assert not bool(jnp.any(m.kf_valid[int(m.num_kfs):]))
        # Loop store stayed aligned (slot k <-> KF k).
        assert int(sysm.loop_state.db.count) == int(m.num_kfs)
        est = np.stack(sysm.trajectory)
        assert ate_rmse(est, Tcw_gt[: len(est)]) < 0.06
