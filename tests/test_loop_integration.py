"""Integration test: loop detection + correction against rendered frames."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.core.camera import backproject
from qsp_slam_tpu.data.render import make_room, render_frame
from qsp_slam_tpu.frontend.orb import OrbConfig, extract_features
from qsp_slam_tpu.slam import map as mapmod
from qsp_slam_tpu.slam.loop_closing import (
    correct_loop,
    detect_loop,
    empty_loop_state,
    snapshot_keyframe,
)
from qsp_slam_tpu.slam.objects import empty_objects
from qsp_slam_tpu.slam.tracking import TrackingConfig


@pytest.fixture(scope="module")
def loop_scene():
    cfg = TrackingConfig(orb=OrbConfig(num_features=400))
    room = make_room()

    def frame_at(T_cw):
        gray, depth = render_frame(room, jnp.asarray(T_cw), cfg.intr)
        f = extract_features(gray, cfg.orb)
        xi = jnp.clip(jnp.round(f.xy[:, 0]).astype(jnp.int32), 0, 639)
        yi = jnp.clip(jnp.round(f.xy[:, 1]).astype(jnp.int32), 0, 479)
        d = depth[yi, xi]
        ok = (d > 0.1) & (d < 8.0) & f.valid
        pts = backproject(f.xy, jnp.where(ok, d, 0.0), cfg.intr)
        return f, pts, ok

    return cfg, frame_at


def _detect(cfg, ls, f, pts, ok, key, **kw):
    return detect_loop(
        ls, f.desc_pm, f.valid, pts, ok, key,
        intr=cfg.intr, xy=f.xy, octave=f.octave, **kw,
    )


class TestLoopDetection:
    def test_detects_revisit_and_recovers_relative_pose(self, loop_scene):
        cfg, frame_at = loop_scene
        ls = empty_loop_state(kmax=32)
        # KF 0: origin view; KFs 1..14: distinct poses sweeping away.
        poses = [jnp.eye(4)]
        for k in range(1, 15):
            xi = jnp.asarray(
                [0.12 * k, 0.0, 0.0, 0.0, 0.05 * k, 0.0], jnp.float32
            )
            poses.append(lie.exp_se3(xi))
        for T in poses:
            f, pts, ok = frame_at(T)
            ls = snapshot_keyframe(ls, f.desc_pm, f.valid, pts, ok, f.xy,
                                   f.octave)

        # Current view: near KF 0 with a known small offset.
        T_off = lie.exp_se3(jnp.asarray([0.05, 0.02, 0.03, 0.0, 0.03, 0.0]))
        T_cur = T_off  # pose = offset from origin
        f, pts, ok = frame_at(T_cur)
        det = _detect(
            cfg, ls, f, pts, ok, jax.random.PRNGKey(0), exclude_recent=10,
        )
        assert bool(det.found)
        # The query sits between KF 0 (offset 0.05) and KF 1 (offset 0.12);
        # either is a correct appearance match — what must hold exactly is
        # the geometric consistency of the recovered relative pose below.
        mk = int(det.match_kf)
        assert mk in (0, 1)
        # T_cur_match maps match-frame points into the current frame:
        # p_cur = T_cw_cur @ T_wc_match @ p_match.
        expected = np.asarray(T_cur) @ np.linalg.inv(np.asarray(poses[mk]))
        np.testing.assert_allclose(
            np.asarray(det.T_cur_match), expected, atol=0.03
        )

    def test_no_false_positive_on_new_view(self, loop_scene):
        cfg, frame_at = loop_scene
        ls = empty_loop_state(kmax=32)
        for k in range(15):
            xi = jnp.asarray([0.12 * k, 0.0, 0.0, 0.0, 0.05 * k, 0.0], jnp.float32)
            f, pts, ok = frame_at(lie.exp_se3(xi))
            ls = snapshot_keyframe(ls, f.desc_pm, f.valid, pts, ok, f.xy,
                                   f.octave)
        # A genuinely new viewpoint (large rotation) should not verify.
        f, pts, ok = frame_at(lie.exp_se3(jnp.asarray([0, 0, 0, 0, 2.6, 0], jnp.float32)))
        det = _detect(cfg, ls, f, pts, ok, jax.random.PRNGKey(1))
        assert not bool(det.found)


class TestLoopCorrection:
    def test_correction_pulls_drifted_chain(self, loop_scene):
        cfg, frame_at = loop_scene
        K = 16
        m = mapmod.empty_map(kmax=32, nmax=256, emax=1024)
        # GT chain: out and back to the start.
        gt = []
        for k in range(K):
            th = 2 * np.pi * k / K
            gt.append(
                np.asarray(
                    lie.exp_se3(
                        jnp.asarray(
                            [0.5 * np.sin(th), 0, 0.5 * (1 - np.cos(th)), 0, 0, 0],
                            jnp.float32,
                        )
                    )
                )
            )
        # Estimated chain with drift growing linearly.
        drift = lambda k: np.asarray(
            lie.exp_se3(jnp.asarray([0.02 * k, 0.01 * k, 0.0, 0.0, 0.0, 0.0], jnp.float32))
        )
        for k in range(K):
            m, _ = mapmod.add_keyframe(m, jnp.asarray(drift(k) @ gt[k]))
        # A few map points anchored at KF 3 (world positions).
        pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 3)), jnp.float32)
        m, ids = mapmod.add_points(
            m, pts, jnp.zeros((8, 256), jnp.int8), jnp.zeros(8, jnp.int32),
            jnp.zeros((8, 3)), jnp.ones(8, bool),
        )
        m = mapmod.add_observations(
            m, jnp.int32(3), ids, jnp.zeros((8, 2)), jnp.full(8, -1.0),
            jnp.zeros(8, jnp.int32),
        )

        # Verified loop: last KF vs KF 0 with the TRUE relative pose.
        from qsp_slam_tpu.slam.loop_closing import LoopDetection

        T_true_rel = jnp.asarray(gt[K - 1] @ np.linalg.inv(gt[0]), jnp.float32)
        det = LoopDetection(
            found=jnp.asarray(True),
            match_kf=jnp.int32(0),
            T_cur_match=T_true_rel,
            num_inliers=jnp.int32(50),
            score=jnp.asarray(0.9),
        )
        objects = empty_objects(8)
        m2, objects2 = correct_loop(m, objects, jnp.int32(K - 1), det)
        err_before = np.linalg.norm(
            np.asarray(m.kf_Tcw[K - 1])[:3, 3] - gt[K - 1][:3, 3]
        )
        err_after = np.linalg.norm(
            np.asarray(m2.kf_Tcw[K - 1])[:3, 3] - gt[K - 1][:3, 3]
        )
        assert err_after < 0.3 * err_before, (err_before, err_after)
        # Points anchored at KF3 moved by KF3's correction (stay finite).
        assert np.isfinite(np.asarray(m2.pt_xyz[:8])).all()
        moved = np.abs(np.asarray(m2.pt_xyz[:8]) - np.asarray(m.pt_xyz[:8])).max()
        assert moved > 1e-4  # correction actually propagated to the map
