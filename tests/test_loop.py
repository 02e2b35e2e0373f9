"""Tests: Sim3 RANSAC, pose-graph optimization, place recognition, and the
loop-closing correction pipeline with injected drift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.opt.pose_graph import (
    PoseGraphEdges,
    optimize_pose_graph,
    relative_measurement,
)
from qsp_slam_tpu.opt.sim3_solver import horn_alignment, ransac_sim3
from qsp_slam_tpu.slam.place_recognition import bow_signature, empty_database, add_signature, query


class TestHorn:
    def test_exact_recovery(self, rng):
        src = jnp.asarray(rng.normal(size=(30, 3)), jnp.float32)
        T_gt = lie.exp_sim3(jnp.asarray([0.3, -0.2, 0.5, 0.2, -0.1, 0.4, 0.25]))
        dst = lie.transform_points(T_gt, src[None])[0]
        T = horn_alignment(src, dst, jnp.ones(30), with_scale=True)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=1e-4)

    def test_fixed_scale(self, rng):
        src = jnp.asarray(rng.normal(size=(30, 3)), jnp.float32)
        T_gt = lie.exp_se3(jnp.asarray([0.3, -0.2, 0.5, 0.2, -0.1, 0.4]))
        dst = lie.transform_points(T_gt, src[None])[0]
        T = horn_alignment(src, dst, jnp.ones(30), with_scale=False)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=1e-4)
        assert abs(float(lie.sim3_scale(T)) - 1.0) < 1e-5


class TestRansacSim3:
    def test_with_outliers(self, rng):
        N = 100
        src = jnp.asarray(rng.normal(size=(N, 3)) * 2.0, jnp.float32)
        T_gt = lie.exp_se3(jnp.asarray([0.4, 0.1, -0.3, 0.1, 0.3, -0.2]))
        dst = np.array(lie.transform_points(T_gt, src[None])[0])
        out = rng.random(N) < 0.3
        dst[out] += rng.uniform(0.5, 2.0, (out.sum(), 3))
        res = ransac_sim3(
            src, jnp.asarray(dst), jnp.ones(N, bool), jax.random.PRNGKey(0),
            with_scale=False,
        )
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl[out].mean() < 0.1 and inl[~out].mean() > 0.9
        np.testing.assert_allclose(np.asarray(res.T_ds), np.asarray(T_gt), atol=0.02)


class TestPoseGraph:
    def test_loop_correction_removes_drift(self, rng):
        """Classic scenario: odometry chain with accumulated drift + one
        loop edge back to the start pulls the chain to ground truth."""
        V = 24
        # GT: cameras on a circle returning to start.
        gt = []
        for k in range(V):
            th = 2 * np.pi * k / V
            xi = jnp.asarray([np.sin(th), 0.0, 1 - np.cos(th), 0, th, 0], jnp.float32)
            gt.append(lie.exp_se3(xi))
        gt = jnp.stack(gt)
        # Odometry with small bias -> drift.
        est = [np.asarray(gt[0])]
        for k in range(1, V):
            rel = np.asarray(relative_measurement(gt[k], gt[k - 1]))
            noise = np.asarray(
                lie.exp_se3(jnp.asarray([0.01, 0.004, 0.01, 0.0, 0.006, 0.0]))
            )
            est.append(noise @ rel @ est[-1])
        est = jnp.asarray(np.stack(est), jnp.float32)
        drift_before = float(jnp.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3]))

        # Edges: consecutive odometry (as measured w/ bias) + loop edge
        # (V-1 -> 0) with the TRUE relative transform (the verified loop).
        ii, jj, TT, ww = [], [], [], []
        for k in range(V - 1):
            ii.append(k)
            jj.append(k + 1)
            TT.append(np.asarray(relative_measurement(est[k], est[k + 1])))
            ww.append(1.0)
        ii.append(V - 1)
        jj.append(0)
        TT.append(np.asarray(relative_measurement(gt[V - 1], gt[0])))
        ww.append(5.0)
        edges = PoseGraphEdges(
            i=jnp.asarray(ii, jnp.int32),
            j=jnp.asarray(jj, jnp.int32),
            T_ij=jnp.asarray(np.stack(TT), jnp.float32),
            weight=jnp.asarray(ww, jnp.float32),
        )
        fixed = jnp.zeros(V, bool).at[0].set(True)
        opt, cost = optimize_pose_graph(est, fixed, edges, sim3=False, iters=25)
        err_after = np.linalg.norm(
            np.asarray(opt)[:, :3, 3] - np.asarray(gt)[:, :3, 3], axis=1
        )
        # End-of-loop error should collapse well below the open-loop drift;
        # mid-chain error is redistributed, not eliminated (biased odometry
        # edges still pull), so only a loose bound applies there.
        assert err_after[-1] < 0.05 * drift_before, (err_after[-1], drift_before)
        assert err_after.max() < 1.5 * drift_before

    def test_sim3_mode_fixes_scale_drift(self, rng):
        V = 10
        gt = jnp.stack([
            lie.exp_se3(jnp.asarray([0.5 * k, 0, 0, 0, 0, 0], jnp.float32))
            for k in range(V)
        ])
        # Inject scale drift into estimates.
        est = jnp.stack([
            lie.exp_sim3(
                jnp.asarray([0.5 * k * (1.02 ** k) - 0.5 * k, 0, 0, 0, 0, 0, 0.02 * k],
                            jnp.float32)
            ) @ gt[k]
            for k in range(V)
        ])
        ii = list(range(V - 1)) + [V - 1]
        jj = list(range(1, V)) + [0]
        TT = [np.asarray(relative_measurement(est[k], est[k + 1], sim3=True))
              for k in range(V - 1)]
        TT.append(np.asarray(relative_measurement(gt[V - 1], gt[0], sim3=True)))
        ww = [1.0] * (V - 1) + [5.0]
        edges = PoseGraphEdges(
            i=jnp.asarray(ii, jnp.int32), j=jnp.asarray(jj, jnp.int32),
            T_ij=jnp.asarray(np.stack(TT), jnp.float32),
            weight=jnp.asarray(ww, jnp.float32),
        )
        fixed = jnp.zeros(V, bool).at[0].set(True)
        opt, _ = optimize_pose_graph(est, fixed, edges, sim3=True, iters=30)
        s_end = float(lie.sim3_scale(opt[-1]))
        s_drift = float(lie.sim3_scale(est[-1]))
        assert abs(s_end - 1.0) < abs(s_drift - 1.0) * 0.5


class TestPlaceRecognition:
    def test_same_view_scores_high(self, rng):
        from qsp_slam_tpu.data.render import make_room, render_frame, orbit_trajectory
        from qsp_slam_tpu.frontend.orb import OrbConfig, extract_features
        from qsp_slam_tpu.slam.tracking import TrackingConfig

        cfg = TrackingConfig(orb=OrbConfig(num_features=300))
        room = make_room()
        traj = orbit_trajectory(40, step=0.03)
        db = empty_database(16)
        sigs = []
        for i in [0, 10, 20, 30]:
            gray, _ = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            f = extract_features(gray, cfg.orb)
            sig = bow_signature(f.desc_pm, f.valid)
            sigs.append(sig)
            db = add_signature(db, sig)
        # Re-render view 0 (same pose) and query, excluding nothing.
        gray0, _ = render_frame(room, jnp.asarray(traj[0]), cfg.intr)
        f0 = extract_features(gray0, cfg.orb)
        sig0 = bow_signature(f0.desc_pm, f0.valid)
        best, score = query(db, sig0, exclude_recent=0)
        assert int(best) == 0
        assert float(score) > 0.8
        # Distinct views should score clearly lower than the true match.
        cross = float(jnp.dot(sigs[0], sigs[2]))
        assert cross < float(score) - 0.05
