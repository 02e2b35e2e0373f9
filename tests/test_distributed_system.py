"""Distributed global BA in the PRODUCT path (slam/distributed_mapping).

Covers VERDICT r03 item 1: the sharded solvers must be reachable from the
live system, and an e2e loop-closure-style correction on an 8-device virtual
mesh must land on the same answer as the single-device program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.data.synthetic import make_ba_problem
from qsp_slam_tpu.parallel.mesh import make_mesh
from qsp_slam_tpu.slam import map as mapmod
from qsp_slam_tpu.slam.distributed_mapping import (
    global_ba_sharded,
    global_joint_ba_sharded,
)
from qsp_slam_tpu.slam.local_mapping import global_ba_step
from qsp_slam_tpu.slam.objects import empty_objects
from qsp_slam_tpu.slam.tracking import TrackingConfig

CFG = TrackingConfig()  # intrinsics match data.synthetic.TUM_INTR


def map_from_problem(prob, kmax=16, nmax=256, emax=4096):
    """Pack a SyntheticBA into the live system's SoA MapState."""
    K = prob.Tcw_init.shape[0]
    N = prob.points_init.shape[0]
    m = mapmod.empty_map(kmax=kmax, nmax=nmax, emax=emax)
    for k in range(K):
        m, _ = mapmod.add_keyframe(m, jnp.asarray(prob.Tcw_init[k]))
    m, ids = mapmod.add_points(
        m,
        jnp.asarray(prob.points_init),
        jnp.zeros((N, 256), jnp.int8),
        jnp.zeros(N, jnp.int32),
        jnp.zeros((N, 3), jnp.float32),
        jnp.ones(N, bool),
    )
    idmap = np.asarray(ids)
    for k in range(K):
        sel = prob.kf_idx == k
        pt_ids = np.full(N, -1, np.int32)
        uv = np.zeros((N, 2), np.float32)
        ur = np.full(N, -1.0, np.float32)
        pt_ids[: sel.sum()] = idmap[prob.pt_idx[sel]]
        uv[: sel.sum()] = prob.uv[sel]
        ur[: sel.sum()] = prob.u_right[sel]
        m = mapmod.add_observations(
            m, jnp.int32(k), jnp.asarray(pt_ids), jnp.asarray(uv),
            jnp.asarray(ur), jnp.zeros(N, jnp.int32),
        )
    return m


def kf_center_rmse(m, Tcw_gt):
    K = Tcw_gt.shape[0]
    Ta = np.asarray(m.kf_Tcw[:K])
    ca = -np.einsum("kji,kj->ki", Ta[:, :3, :3], Ta[:, :3, 3])
    cg = -np.einsum("kji,kj->ki", Tcw_gt[:, :3, :3], Tcw_gt[:, :3, 3])
    return float(np.sqrt(np.mean(np.sum((ca - cg) ** 2, -1))))


class TestGlobalBASharded:
    def test_matches_single_device_on_system_map(self):
        """8-device sharded whole-map BA ~= single-device global_ba_step."""
        prob = make_ba_problem(
            num_cams=8, num_points=200, obs_per_point=4,
            outlier_frac=0.0, seed=11,
        )
        m = map_from_problem(prob)
        mesh = make_mesh(8, axis="map")

        m_single = global_ba_step(m, CFG, iters=10)
        m_shard = global_ba_sharded(m, CFG, mesh, iters=10)

        e_single = kf_center_rmse(m_single, prob.Tcw_gt)
        e_shard = kf_center_rmse(m_shard, prob.Tcw_gt)
        e_init = kf_center_rmse(m, prob.Tcw_gt)
        # Both solvers converge from the perturbed init...
        assert e_single < 0.3 * e_init
        assert e_shard < 0.3 * e_init
        # ...to the same optimum (identical problem, different schedule —
        # the single path runs two-stage gated LM, the sharded path Huber
        # LM; agreement must be at noise level, not bitwise).
        assert abs(e_shard - e_single) < max(0.02, 0.5 * e_single)
        np.testing.assert_allclose(
            np.asarray(m_shard.kf_Tcw[:8, :3, 3]),
            np.asarray(m_single.kf_Tcw[:8, :3, 3]),
            atol=0.05,
        )

    def test_loop_closure_e2e_mesh_vs_single(self):
        """Drifted loop chain: correct_loop + global BA, mesh vs 1 device.

        The end-to-end post-loop pipeline of `SlamSystem._loop_closing`
        (pose-graph correction, then whole-map BA) must produce the same
        keyframe ATE whether the BA runs on one device or point-sharded
        over the 8-device virtual mesh.
        """
        from qsp_slam_tpu.slam.loop_closing import LoopDetection, correct_loop

        # pix_noise low enough that the estimator's noise floor (~7 mm at
        # 0.1 px for this geometry) sits well under the injected drift.
        prob = make_ba_problem(
            num_cams=10, num_points=200, obs_per_point=4, pix_noise=0.1,
            outlier_frac=0.0, pose_noise=0.0, point_noise=0.0, seed=5,
        )
        # Inject drift growing along the chain (the loop-closure scenario):
        # the map was built consistently with the drifted poses, so points
        # must be re-anchored by correction + BA, exactly like a real loop.
        drifted = prob.Tcw_init.copy()
        for k in range(10):
            xi = jnp.asarray([0.02 * k, 0.015 * k, 0.0, 0.0, 0.004 * k, 0.0])
            drifted[k] = np.asarray(lie.exp_se3(xi)) @ prob.Tcw_gt[k]
        prob = prob._replace(Tcw_init=drifted)
        m = map_from_problem(prob)

        det = LoopDetection(
            found=jnp.asarray(True),
            match_kf=jnp.int32(0),
            T_cur_match=jnp.asarray(
                prob.Tcw_gt[9] @ np.linalg.inv(prob.Tcw_gt[0]), jnp.float32
            ),
            num_inliers=jnp.int32(50),
            score=jnp.asarray(0.9),
        )
        objects = empty_objects(4)
        m_corr, _ = correct_loop(m, objects, jnp.int32(9), det)

        m_single = global_ba_step(m_corr, CFG, iters=10)
        mesh = make_mesh(8, axis="map")
        m_shard = global_ba_sharded(m_corr, CFG, mesh, iters=10)

        # ATE is Sim3-aligned: these are MONO edges, so fixing camera 0
        # leaves scale as a gauge freedom the optimizer may slide along
        # (the classic 7-DoF mono gauge); SE3 alignment would report that
        # gauge motion as error.
        from qsp_slam_tpu.eval.ate import ate_rmse

        def kf_ate(mm):
            return ate_rmse(np.asarray(mm.kf_Tcw[:10]), prob.Tcw_gt,
                            with_scale=True)

        e_before = kf_ate(m)
        e_single = kf_ate(m_single)
        e_shard = kf_ate(m_shard)
        # The loop correction + BA fixes the drift on BOTH paths...
        assert e_single < 0.3 * e_before, (e_before, e_single)
        assert e_shard < 0.3 * e_before, (e_before, e_shard)
        # ...and the two paths agree (same ATE within noise).
        assert abs(e_shard - e_single) < max(1e-3, 0.2 * e_single)

    def test_system_run_global_ba_uses_mesh(self):
        """SlamSystem.run_global_ba dispatches the sharded path with a mesh
        and the single-device path without, landing on the same map."""
        from qsp_slam_tpu.slam.system import SlamSystem

        prob = make_ba_problem(
            num_cams=6, num_points=150, obs_per_point=4,
            outlier_frac=0.0, seed=3,
        )

        def build(mesh):
            s = SlamSystem(CFG, kmax=16, nmax=256, emax=4096,
                           enable_objects=False, mesh=mesh)
            s.map_state = map_from_problem(prob)
            s.initialized = True
            return s

        s1 = build(None)
        s8 = build(make_mesh(8, axis="map"))
        s1.run_global_ba()
        s8.run_global_ba()
        e1 = kf_center_rmse(s1.map_state, prob.Tcw_gt)
        e8 = kf_center_rmse(s8.map_state, prob.Tcw_gt)
        e0 = kf_center_rmse(map_from_problem(prob), prob.Tcw_gt)
        assert e1 < 0.3 * e0 and e8 < 0.3 * e0
        assert abs(e8 - e1) < max(0.02, 0.5 * e1)
        # run_global_ba adopts the refreshed newest-KF pose.
        np.testing.assert_allclose(
            s8.Tcw, np.asarray(s8.map_state.kf_Tcw[5]), atol=1e-6
        )


class TestGlobalJointBASharded:
    def test_joint_objects_move_with_the_map(self):
        """Sharded joint global BA refines cameras AND object poses."""
        prob = make_ba_problem(
            num_cams=6, num_points=150, obs_per_point=4,
            outlier_frac=0.0, stereo=True, seed=9,
        )
        m = map_from_problem(prob)
        objects = empty_objects(4)
        # One object with two consistent camera-object measurements derived
        # from GT: T_oc = T_ow_gt @ inv(T_cw_gt_k); object init perturbed.
        T_wo_gt = np.eye(4, dtype=np.float32)
        T_wo_gt[:3, 3] = [0.5, 0.0, 1.0]
        T_ow_gt = np.linalg.inv(T_wo_gt)
        pm_Toc = np.array(objects.pm_Toc)
        pm_kf = np.array(objects.pm_kf)
        for j, k in enumerate([1, 3, 5]):
            pm_Toc[0, j] = T_ow_gt @ np.linalg.inv(
                np.asarray(prob.Tcw_gt[k])
            ) @ np.asarray(prob.Tcw_gt[k]) @ np.linalg.inv(
                np.asarray(prob.Tcw_init[k])
            )
            # measurement in the INIT frame so the optimum re-aligns object
            pm_Toc[0, j] = T_ow_gt @ np.linalg.inv(np.asarray(prob.Tcw_gt[k]))
            pm_kf[0, j] = k
        e0 = np.zeros(9, np.float32)
        e0[:3] = T_wo_gt[:3, 3] + np.asarray([0.2, -0.1, 0.15])
        e0[6:9] = 0.3
        objects = objects._replace(
            valid=objects.valid.at[0].set(True),
            ellipsoid=objects.ellipsoid.at[0].set(jnp.asarray(e0)),
            pm_Toc=jnp.asarray(pm_Toc),
            pm_kf=jnp.asarray(pm_kf),
        )
        mesh = make_mesh(8, axis="map")
        m2, o2 = global_joint_ba_sharded(m, objects, CFG, mesh, iters=8)
        assert np.isfinite(np.asarray(m2.kf_Tcw)).all()
        c_new = np.asarray(o2.ellipsoid[0, :3])
        err_before = np.linalg.norm(e0[:3] - T_wo_gt[:3, 3])
        err_after = np.linalg.norm(c_new - T_wo_gt[:3, 3])
        # Camera poses converge near GT, so the object's measured relative
        # poses pull its center back toward the true location.
        assert err_after < 0.5 * err_before, (err_before, err_after)
        # Scale column untouched by the pose-graph update.
        np.testing.assert_allclose(np.asarray(o2.ellipsoid[0, 6:9]), 0.3, atol=1e-6)
