"""Distributed BA: sharded-vs-single-device equivalence on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.data.synthetic import ba_edges, make_ba_problem
from qsp_slam_tpu.opt.local_ba import _lm_stage
from qsp_slam_tpu.parallel.sharded_ba import (
    make_edge_mesh,
    pad_edges_for_mesh,
    sharded_local_ba,
)


class TestShardedBA:
    def test_matches_single_device(self):
        prob = make_ba_problem(num_cams=6, num_points=300, outlier_frac=0.0, seed=7)
        edges = ba_edges(prob)
        cam_fixed = jnp.zeros(6, bool).at[0].set(True)
        T0 = jnp.asarray(prob.Tcw_init)
        p0 = jnp.asarray(prob.points_init)

        mesh = make_edge_mesh(8)
        T_sh, p_sh, cost_sh = sharded_local_ba(
            mesh, T0, p0, cam_fixed, edges, prob.intr, iters=8, use_huber=True
        )
        T_1, p_1, cost_1 = _lm_stage(
            T0, p0, cam_fixed, edges, prob.intr, 0.0, 8, use_huber=True
        )
        # Same optimization semantics; f32 reduction order differs, so allow
        # loose elementwise agreement but demand equal costs to ~0.1%.
        assert abs(float(cost_sh) - float(cost_1)) < 0.002 * float(cost_1) + 1e-3
        np.testing.assert_allclose(
            np.asarray(T_sh), np.asarray(T_1), atol=5e-3
        )

    def test_edge_padding(self):
        prob = make_ba_problem(num_cams=3, num_points=40, obs_per_point=3, seed=1)
        edges = ba_edges(prob)
        E = edges.kf_idx.shape[0]
        padded = pad_edges_for_mesh(edges, 8)
        Ep = padded.kf_idx.shape[0]
        assert Ep % 8 == 0 and Ep >= E
        assert not bool(padded.valid[E:].any())  # padding is inert

    def test_scaling_smoke(self):
        """8-way sharded run completes and produces a finite improving cost
        (wall-clock scaling needs real chips; this validates the program)."""
        prob = make_ba_problem(num_cams=8, num_points=500, outlier_frac=0.03, seed=2)
        edges = ba_edges(prob)
        cam_fixed = jnp.zeros(8, bool).at[0].set(True)
        mesh = make_edge_mesh(8)
        T, p, cost = sharded_local_ba(
            mesh, jnp.asarray(prob.Tcw_init), jnp.asarray(prob.points_init),
            cam_fixed, edges, prob.intr, iters=5,
        )
        assert np.isfinite(float(cost))
        ca = -np.einsum("kji,kj->ki", np.asarray(T)[:, :3, :3], np.asarray(T)[:, :3, 3])
        cg = -np.einsum(
            "kji,kj->ki", prob.Tcw_gt[:, :3, :3], prob.Tcw_gt[:, :3, 3]
        )
        rmse = np.sqrt(np.mean(np.sum((ca - cg) ** 2, -1)))
        assert rmse < 0.05
