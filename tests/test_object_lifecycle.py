"""Object lifecycle: dynamic arbitration, culling, global BA smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.slam.objects import (
    Associations,
    cull_objects,
    empty_objects,
    integrate_keyframe,
)


def _mk_table():
    t = empty_objects(4)
    e = jnp.asarray([0.0, 1.8, 3.0, 0, 0, 0, 0.3, 0.3, 0.3], jnp.float32)
    return t._replace(
        ellipsoid=t.ellipsoid.at[0].set(e),
        label=t.label.at[0].set(1),
        valid=t.valid.at[0].set(True),
        num_objects=jnp.int32(1),
    )


def _integrate(table, kf_id, e_cam, fit_ok=True):
    D = 1
    assoc = Associations(
        obj_for_det=jnp.asarray([0], jnp.int32), iou=jnp.asarray([0.8])
    )
    return integrate_keyframe(
        table,
        jnp.eye(4),
        det_bbox=jnp.zeros((D, 4)),
        det_label=jnp.asarray([1], jnp.int32),
        det_prob=jnp.asarray([0.9]),
        det_valid=jnp.asarray([True]),
        det_ellipsoid_cam=e_cam[None],
        det_fit_ok=jnp.asarray([fit_ok]),
        assoc=assoc,
        kf_id=jnp.int32(kf_id),
    )


class TestDynamic:
    def test_moving_object_flagged(self):
        t = _mk_table()
        # Two consecutive fits each ~0.5 m away from the landmark.
        e_moved = jnp.asarray([0.5, 1.8, 3.0, 0, 0, 0, 0.3, 0.3, 0.3], jnp.float32)
        t = _integrate(t, 1, e_moved)
        assert not bool(t.dynamic[0])
        e_moved2 = jnp.asarray([1.0, 1.8, 3.0, 0, 0, 0, 0.3, 0.3, 0.3], jnp.float32)
        t = _integrate(t, 2, e_moved2)
        assert bool(t.dynamic[0])

    def test_static_object_not_flagged(self):
        t = _mk_table()
        e_same = t.ellipsoid[0]
        for k in range(3):
            t = _integrate(t, k + 1, e_same)
        assert not bool(t.dynamic[0])
        assert int(t.last_seen_kf[0]) == 3


class TestCulling:
    def test_stale_weak_object_dropped(self):
        t = _mk_table()  # obs_count 0, last_seen 0
        t2 = cull_objects(t, jnp.int32(20))
        assert not bool(t2.valid[0])

    def test_supported_object_kept(self):
        t = _mk_table()
        e_same = t.ellipsoid[0]
        t = _integrate(t, 1, e_same)
        t = _integrate(t, 2, e_same)
        t2 = cull_objects(t, jnp.int32(20))
        assert bool(t2.valid[0])  # enough observations, stale but strong


class TestGlobalBA:
    def test_global_ba_improves_map(self):
        from qsp_slam_tpu.data.synthetic import make_ba_problem
        from qsp_slam_tpu.slam import map as mapmod
        from qsp_slam_tpu.slam.local_mapping import global_ba_step
        from qsp_slam_tpu.slam.tracking import TrackingConfig

        prob = make_ba_problem(num_cams=6, num_points=200, obs_per_point=4,
                               outlier_frac=0.0, seed=3)
        m = mapmod.empty_map(kmax=8, nmax=256, emax=4096)
        for k in range(6):
            m, _ = mapmod.add_keyframe(m, jnp.asarray(prob.Tcw_init[k]))
        m, ids = mapmod.add_points(
            m, jnp.asarray(prob.points_init),
            jnp.zeros((200, 256), jnp.int8), jnp.zeros(200, jnp.int32),
            jnp.zeros((200, 3)), jnp.ones(200, bool),
        )
        # insert observations per keyframe
        for k in range(6):
            sel = prob.kf_idx == k
            n = sel.sum()
            pt = jnp.asarray(ids)[jnp.asarray(prob.pt_idx[sel])]
            pad = 512 - n
            m = mapmod.add_observations(
                m, jnp.int32(k),
                jnp.concatenate([pt, jnp.full(pad, -1, jnp.int32)]),
                jnp.concatenate([jnp.asarray(prob.uv[sel]), jnp.zeros((pad, 2))]),
                jnp.full(512, -1.0),
                jnp.zeros(512, jnp.int32),
            )
        cfg = TrackingConfig()
        m2 = global_ba_step(m, cfg)
        err_before = np.linalg.norm(
            np.asarray(m.kf_Tcw[:6, :3, 3]) - prob.Tcw_init[:, :3, 3]
        )
        gt_err = lambda mm: np.linalg.norm(
            np.asarray(mm.kf_Tcw[:6, :3, 3]) - prob.Tcw_gt[:, :3, 3]
        )
        assert gt_err(m2) < 0.5 * gt_err(m)
