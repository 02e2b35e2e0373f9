"""Sim3 loop correction (mono mode): scale drift absorbed by the loop edge."""

import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.slam import map as mapmod
from qsp_slam_tpu.slam.loop_closing import LoopDetection, correct_loop
from qsp_slam_tpu.slam.objects import empty_objects


class TestSim3LoopCorrection:
    def test_scale_drift_corrected(self):
        K = 12
        m = mapmod.empty_map(kmax=16, nmax=64, emax=256)
        # GT: unit-spaced poses along x, returning near the start.
        gt = []
        for k in range(K):
            th = 2 * np.pi * k / K
            gt.append(
                np.asarray(
                    lie.exp_se3(
                        jnp.asarray(
                            [np.sin(th), 0, 1 - np.cos(th), 0, 0, 0], jnp.float32
                        )
                    )
                )
            )
        # Estimates with growing SCALE drift (mono failure mode).
        est = []
        for k in range(K):
            s = 1.02 ** k
            T = gt[k].copy()
            T[:3, 3] *= s
            est.append(T)
        for k in range(K):
            m, _ = mapmod.add_keyframe(m, jnp.asarray(est[k]))

        T_true_rel = jnp.asarray(
            gt[K - 1] @ np.linalg.inv(gt[0]), jnp.float32
        )
        det = LoopDetection(
            found=jnp.asarray(True), match_kf=jnp.int32(0),
            T_cur_match=T_true_rel, num_inliers=jnp.int32(50),
            score=jnp.asarray(0.9),
        )
        objects = empty_objects(4)
        m2, _ = correct_loop(
            m, objects, jnp.int32(K - 1), det, fix_scale=False, iters=25
        )
        # The corrected chain's end pose should approach GT much closer than
        # the scale-drifted estimate.
        err_before = np.linalg.norm(est[K - 1][:3, 3] - gt[K - 1][:3, 3])
        err_after = np.linalg.norm(
            np.asarray(m2.kf_Tcw[K - 1])[:3, 3] - gt[K - 1][:3, 3]
        )
        assert err_after < 0.5 * err_before, (err_before, err_after)
        # Scales move back toward 1.
        s_end = float(lie.sim3_scale(m2.kf_Tcw[K - 1]))
        assert abs(s_end - 1.0) < 0.15, s_end
