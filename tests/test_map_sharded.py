"""Map-block-sharded BA: point-sharded vs edge-sharded/single-device equivalence."""

import jax.numpy as jnp
import numpy as np

from qsp_slam_tpu.data.synthetic import ba_edges, make_ba_problem
from qsp_slam_tpu.opt.local_ba import _lm_stage
from qsp_slam_tpu.parallel.map_sharded_ba import (
    edges_to_slots,
    make_map_mesh,
    map_sharded_ba,
    pad_points_for_mesh,
)
from qsp_slam_tpu.parallel.sharded_ba import make_edge_mesh, sharded_local_ba


class TestSlotLayout:
    def test_slot_regroup_roundtrip(self):
        prob = make_ba_problem(num_cams=4, num_points=50, obs_per_point=3, seed=3)
        edges = ba_edges(prob)
        slots = edges_to_slots(edges, 50, slots=8)
        # Every valid edge appears exactly once in its point's row.
        kf = np.asarray(edges.kf_idx)
        pt = np.asarray(edges.pt_idx)
        ok = np.asarray(edges.valid)
        skf, sval = np.asarray(slots.kf), np.asarray(slots.valid)
        for n in range(50):
            want = sorted(kf[(pt == n) & ok].tolist())
            got = sorted(skf[n][sval[n]].tolist())
            assert got == want, n
        # uv values carried over for a spot-checked edge.
        e0 = int(np.flatnonzero(ok)[0])
        n0, k0 = pt[e0], kf[e0]
        srow = np.flatnonzero(sval[n0] & (skf[n0] == k0))[0]
        np.testing.assert_allclose(
            np.asarray(slots.uv)[n0, srow], np.asarray(edges.uv)[e0]
        )

    def test_slot_capacity_guard(self):
        """Undersized slot tables raise instead of silently dropping edges."""
        import pytest

        from qsp_slam_tpu.parallel.map_sharded_ba import required_slots

        prob = make_ba_problem(num_cams=6, num_points=40, obs_per_point=5, seed=0)
        edges = ba_edges(prob)
        need = required_slots(edges, 40)
        assert need >= 2
        with pytest.raises(ValueError, match="slot capacity"):
            edges_to_slots(edges, 40, slots=need - 1)
        # slots=None sizes the table from the data: nothing dropped.
        auto = edges_to_slots(edges, 40)
        assert auto.kf.shape[1] == need
        assert int(auto.valid.sum()) == int(edges.valid.sum())

    def test_point_padding_inert(self):
        prob = make_ba_problem(num_cams=3, num_points=37, obs_per_point=3, seed=1)
        edges = ba_edges(prob)
        slots = edges_to_slots(edges, 37, slots=6)
        pts, padded = pad_points_for_mesh(jnp.asarray(prob.points_init), slots, 8)
        assert pts.shape[0] % 8 == 0
        assert not bool(padded.valid[37:].any())


class TestMapShardedBA:
    def test_matches_edge_sharded_and_single(self):
        prob = make_ba_problem(num_cams=6, num_points=300, outlier_frac=0.0, seed=7)
        edges = ba_edges(prob)
        cam_fixed = jnp.zeros(6, bool).at[0].set(True)
        T0 = jnp.asarray(prob.Tcw_init)
        p0 = jnp.asarray(prob.points_init)
        slots = edges_to_slots(edges, 300, slots=8)

        T_m, p_m, cost_m = map_sharded_ba(
            make_map_mesh(8), T0, p0, cam_fixed, slots, prob.intr,
            iters=8, use_huber=True,
        )
        T_e, p_e, cost_e = sharded_local_ba(
            make_edge_mesh(8), T0, p0, cam_fixed, edges, prob.intr,
            iters=8, use_huber=True,
        )
        # Same algorithm, different reduction order/grouping.
        assert abs(float(cost_m) - float(cost_e)) < 0.002 * float(cost_e) + 1e-3
        np.testing.assert_allclose(np.asarray(T_m), np.asarray(T_e), atol=5e-3)
        assert p_m.shape == p0.shape

        T_1, _, cost_1 = _lm_stage(
            T0, p0, cam_fixed, edges, prob.intr, 0.0, 8,
            use_huber=True, early_exit_rtol=0.0,
        )
        assert abs(float(cost_m) - float(cost_1)) < 0.002 * float(cost_1) + 1e-3
        np.testing.assert_allclose(np.asarray(T_m), np.asarray(T_1), atol=5e-3)

    def test_big_map_accuracy(self):
        """Point-sharded global BA converges to GT on an 8-cam problem."""
        prob = make_ba_problem(num_cams=8, num_points=500, outlier_frac=0.03, seed=2)
        edges = ba_edges(prob)
        cam_fixed = jnp.zeros(8, bool).at[0].set(True)
        slots = edges_to_slots(edges, 500, slots=10)
        T, p, cost = map_sharded_ba(
            make_map_mesh(8), jnp.asarray(prob.Tcw_init),
            jnp.asarray(prob.points_init), cam_fixed, slots, prob.intr, iters=5,
        )
        assert np.isfinite(float(cost))
        Ta = np.asarray(T)
        ca = -np.einsum("kji,kj->ki", Ta[:, :3, :3], Ta[:, :3, 3])
        cg = -np.einsum(
            "kji,kj->ki", prob.Tcw_gt[:, :3, :3], prob.Tcw_gt[:, :3, 3]
        )
        rmse = np.sqrt(np.mean(np.sum((ca - cg) ** 2, -1)))
        assert rmse < 0.05
