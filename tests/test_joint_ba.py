"""Joint camera-point-object BA golden test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.data.synthetic import ba_edges, make_ba_problem
from qsp_slam_tpu.opt.joint_ba import ObjectPoseEdges, joint_bundle_adjustment


def cam_rmse(Ta, Tb):
    ca = -np.einsum("kji,kj->ki", np.asarray(Ta)[:, :3, :3], np.asarray(Ta)[:, :3, 3])
    cb = -np.einsum("kji,kj->ki", np.asarray(Tb)[:, :3, :3], np.asarray(Tb)[:, :3, 3])
    return float(np.sqrt(np.mean(np.sum((ca - cb) ** 2, -1))))


class TestJointBA:
    def test_objects_and_cameras_converge(self, rng):
        prob = make_ba_problem(num_cams=8, num_points=400, outlier_frac=0.02, seed=9)
        edges = ba_edges(prob)
        K = 8
        O = 3
        # GT object poses scattered in the scene.
        Tow_gt = jnp.stack(
            [
                lie.exp_se3(jnp.asarray(
                    np.concatenate([rng.uniform(-1, 1, 3), rng.uniform(-0.5, 0.5, 3)]),
                    jnp.float32))
                for _ in range(O)
            ]
        )
        # Observations: each camera observes each object with the GT
        # relative transform T_oc = Tow @ Twc, with small SE3 noise.
        ci, oi, Ms = [], [], []
        for k in range(K):
            for o in range(O):
                T_oc = np.asarray(Tow_gt[o]) @ np.asarray(
                    lie.inv_se3(jnp.asarray(prob.Tcw_gt[k]))
                )
                noise = np.asarray(
                    lie.exp_se3(jnp.asarray(rng.normal(0, 0.01, 6), jnp.float32))
                )
                ci.append(k)
                oi.append(o)
                Ms.append(noise @ T_oc)
        obj_edges = ObjectPoseEdges(
            cam_idx=jnp.asarray(ci, jnp.int32),
            obj_idx=jnp.asarray(oi, jnp.int32),
            T_oc=jnp.asarray(np.stack(Ms), jnp.float32),
            valid=jnp.ones(len(ci), bool),
        )
        # Perturb object inits.
        Tow_init = jnp.stack(
            [
                lie.exp_se3(jnp.asarray(rng.normal(0, 0.05, 6), jnp.float32)) @ Tow_gt[o]
                for o in range(O)
            ]
        )
        cam_fixed = jnp.zeros(K, bool).at[0].set(True)
        obj_fixed = jnp.zeros(O, bool)
        res = joint_bundle_adjustment(
            jnp.asarray(prob.Tcw_init), Tow_init, jnp.asarray(prob.points_init),
            cam_fixed, obj_fixed, edges, obj_edges, prob.intr,
        )
        # Cameras converge as in plain BA.
        assert cam_rmse(res.Tcw, prob.Tcw_gt) < 0.04  # 1cm object-edge noise at
        # info 1e3 legitimately shifts the joint optimum off the vision-only one
        # Objects land on their GT poses (noise floor ~ 1 cm edge noise).
        for o in range(3):
            dt = np.linalg.norm(
                np.asarray(res.Tow[o])[:3, 3] - np.asarray(Tow_gt[o])[:3, 3]
            )
            assert dt < 0.05, (o, dt)

    def test_object_edges_constrain_free_camera(self, rng):
        """A camera with NO reprojection edges is still recoverable through
        its object observations (the pose-graph coupling)."""
        prob = make_ba_problem(num_cams=4, num_points=200, outlier_frac=0.0, seed=11)
        edges = ba_edges(prob)
        # Cut all reprojection edges of camera 3.
        keep = prob.kf_idx != 3
        edges = edges._replace(valid=jnp.asarray(keep))
        Tow_gt = lie.exp_se3(jnp.asarray([0.5, 0.2, 0.1, 0.1, 0.2, 0.0]))[None]
        ci, oi, Ms = [], [], []
        for k in range(4):
            T_oc = np.asarray(Tow_gt[0]) @ np.asarray(
                lie.inv_se3(jnp.asarray(prob.Tcw_gt[k]))
            )
            ci.append(k)
            oi.append(0)
            Ms.append(T_oc)
        obj_edges = ObjectPoseEdges(
            cam_idx=jnp.asarray(ci, jnp.int32),
            obj_idx=jnp.asarray(oi, jnp.int32),
            T_oc=jnp.asarray(np.stack(Ms), jnp.float32),
            valid=jnp.ones(4, bool),
        )
        cam_fixed = jnp.zeros(4, bool).at[0].set(True)
        res = joint_bundle_adjustment(
            jnp.asarray(prob.Tcw_init), Tow_gt, jnp.asarray(prob.points_init),
            cam_fixed, jnp.zeros(1, bool), edges, obj_edges, prob.intr,
        )
        err3 = np.linalg.norm(
            np.asarray(res.Tcw[3] - jnp.asarray(prob.Tcw_gt[3]))
        )
        assert err3 < 0.05, err3
