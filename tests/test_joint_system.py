"""Stereo + objects end-to-end: the joint BA dispatch path (config-4-style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie, quadric
from qsp_slam_tpu.data.render import gt_detections, make_scene, render_scene
from qsp_slam_tpu.eval.ate import ate_rmse
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig


class TestGlobalJointBA:
    def test_full_window_refines_early_keyframes_and_objects(self):
        """`joint_ba_step(window=kmax)` — the post-loop global joint BA
        (`GlobalJointBundleAdjustemnt`, `src/LoopClosing_util.cc:295`) —
        must refine keyframes and objects OUTSIDE any local suffix window."""
        from qsp_slam_tpu.slam import map as mapmod
        from qsp_slam_tpu.slam.joint_mapping import joint_ba_step
        from qsp_slam_tpu.slam.objects import empty_objects

        rng = np.random.default_rng(5)
        cfg = TrackingConfig()
        K, P = 10, 300
        # GT: lateral camera arc; world points in front.
        gt_T = [
            np.asarray(lie.exp_se3(jnp.asarray(
                [0.15 * k, 0.02 * k, 0.0, 0.0, 0.01 * k, 0.0], jnp.float32)))
            for k in range(K)
        ]
        pts_gt = rng.uniform([-2, -2, 3.0], [2, 2, 7.0], (P, 3)).astype(np.float32)

        m = mapmod.empty_map(kmax=16, nmax=512, emax=8192)
        for k in range(K):
            noise = np.asarray(lie.exp_se3(jnp.asarray(
                np.concatenate([rng.normal(0, 0.03, 3), rng.normal(0, 0.01, 3)]),
                jnp.float32)))
            # Keep the gauge keyframes exact (slots 0-1 are fixed).
            m, _ = mapmod.add_keyframe(
                m, jnp.asarray(gt_T[k] if k < 2 else noise @ gt_T[k])
            )
        m, ids = mapmod.add_points(
            m,
            jnp.asarray(pts_gt + rng.normal(0, 0.02, (P, 3)).astype(np.float32)),
            jnp.zeros((P, 256), jnp.int8), jnp.zeros(P, jnp.int32),
            jnp.zeros((P, 3)), jnp.ones(P, bool),
        )
        fx, fy = float(cfg.fx), float(cfg.fy)
        cx, cy = float(cfg.cx), float(cfg.cy)
        for k in range(K):
            pc = (pts_gt @ gt_T[k][:3, :3].T) + gt_T[k][:3, 3]
            u = fx * pc[:, 0] / pc[:, 2] + cx
            v = fy * pc[:, 1] / pc[:, 2] + cy
            uv = np.stack([u, v], -1) + rng.normal(0, 0.3, (P, 2))
            m = mapmod.add_observations(
                m, jnp.int32(k), ids, jnp.asarray(uv, jnp.float32),
                jnp.full(P, -1.0), jnp.zeros(P, jnp.int32),
            )

        # One object measured ONLY at the EARLIEST keyframes (0-3): any
        # suffix window misses it; the global window must refine it.
        objects = empty_objects(4)
        e_gt = jnp.asarray([0.5, 0.3, 5.0, 0.0, 0.0, 0.0, 0.3, 0.3, 0.3])
        e_init = e_gt.at[0:3].add(jnp.asarray([0.15, -0.1, 0.2]))
        objects = objects._replace(
            ellipsoid=objects.ellipsoid.at[0].set(e_init),
            valid=objects.valid.at[0].set(True),
            num_objects=jnp.int32(1),
        )
        R_gt = quadric.euler_to_rotmat(e_gt[3:6])
        T_wo = np.asarray(lie.rt_to_se3(R_gt, e_gt[0:3]))
        for k in range(4):
            T_oc = np.linalg.inv(T_wo) @ np.linalg.inv(gt_T[k])
            objects = objects._replace(
                pm_Toc=objects.pm_Toc.at[0, k].set(jnp.asarray(T_oc, jnp.float32)),
                pm_kf=objects.pm_kf.at[0, k].set(k),
                pm_next=objects.pm_next.at[0].set(k + 1),
            )

        m2, obj2 = joint_ba_step(m, objects, cfg, window=16)
        # Early keyframes (2-4) improve toward GT.
        def rmse(mm, ks):
            errs = [
                np.linalg.norm(np.asarray(mm.kf_Tcw[k])[:3, 3] - gt_T[k][:3, 3])
                for k in ks
            ]
            return float(np.mean(errs))

        early = list(range(2, 5))
        assert rmse(m2, early) < rmse(m, early) * 0.5, (rmse(m, early), rmse(m2, early))
        # The early-only object lands near GT.
        d_obj = np.linalg.norm(np.asarray(obj2.ellipsoid[0, :3] - e_gt[:3]))
        d_init = np.linalg.norm(np.asarray(e_init[:3] - e_gt[:3]))
        assert d_obj < d_init * 0.5, (d_init, d_obj)


@pytest.mark.slow
class TestStereoJointBA:
    def test_stereo_objects_joint(self):
        cfg = TrackingConfig(orb=OrbConfig(num_features=500), baseline=0.12)
        scene = make_scene(num_objects=3, seed=2)
        sysm = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, ba_window=6, omax=8,
            enable_loop_closing=False,
        )
        base = lie.exp_se3(jnp.asarray([0, 0, 0, 0.44, 0, 0], jnp.float32))
        shift = np.eye(4, dtype=np.float32)
        shift[0, 3] = -cfg.baseline
        gts = []
        for i in range(20):
            xi = jnp.asarray([0.045 * i, 0, 0, 0, 0, 0], jnp.float32)
            T_cw = np.asarray(lie.exp_se3(xi) @ base, np.float32)
            gts.append(T_cw)
            gl, _, _ = render_scene(scene, jnp.asarray(T_cw), cfg.intr)
            gr, _, _ = render_scene(scene, jnp.asarray(shift @ T_cw), cfg.intr)
            det = gt_detections(scene, jnp.asarray(T_cw), cfg.intr)
            sysm.track_stereo(
                np.asarray(gl), np.asarray(gr),
                {k: np.asarray(v) for k, v in det.items()},
            )
        est = np.stack(sysm.trajectory)
        ate = ate_rmse(est, np.stack(gts))
        assert ate < 0.06, ate
        # Joint path engaged and objects exist with pose measurements.
        valid = np.asarray(sysm.objects.valid)
        assert valid.sum() >= 1
        assert int((np.asarray(sysm.objects.pm_kf) >= 0).sum()) >= 2
        # Matched object centers near GT (SLAM world = first camera frame).
        est_e = np.asarray(
            quadric.transform_ellipsoid(
                jnp.asarray(np.asarray(sysm.objects.ellipsoid)[valid]),
                lie.inv_se3(jnp.asarray(gts[0])),
            )
        )
        gt_e = np.asarray(scene.ellipsoids)
        matched = 0
        for e in est_e:
            d = np.linalg.norm(gt_e[:, :3] - e[:3], axis=1).min()
            if d < 0.35:
                matched += 1
        assert matched >= 1
