"""Loop-closing hardening (VERDICT round-1 Missing #4): top-k candidates,
3-consecutive consistency gating, geometric rejection of appearance decoys.

Parity anchors: `LoopClosing::DetectLoop` consistency groups
(`src/LoopClosing.cc:113-241`), `KeyFrameDatabase::DetectLoopCandidates`
(`src/KeyFrameDatabase.cc:76`).
"""

import numpy as np
import jax
import jax.numpy as jnp

import qsp_slam_tpu  # noqa: F401
from qsp_slam_tpu.slam.loop_closing import (
    ConsistencyGate,
    empty_loop_state,
    snapshot_keyframe,
    verify_loop,
)
from qsp_slam_tpu.slam.place_recognition import (
    bow_signature,
    empty_database,
    add_signature,
    query_topk,
)


class TestConsistencyGate:
    def test_three_consecutive_accepts(self):
        g = ConsistencyGate(required=3, neighborhood=3)
        assert g.update([5], [0.9]) == -1
        assert g.update([6], [0.9]) == -1  # neighborhood of 5
        assert g.update([5], [0.9]) == 5  # third consecutive round

    def test_single_shot_rejected(self):
        g = ConsistencyGate()
        assert g.update([5], [0.9]) == -1
        assert g.update([], []) == -1
        assert g.update([5], [0.9]) == -1  # streak was broken

    def test_far_candidates_do_not_chain(self):
        g = ConsistencyGate(required=3, neighborhood=3)
        g.update([5], [0.9])
        g.update([30], [0.9])  # different place
        assert g.update([5], [0.9]) == -1

    def test_best_scored_consistent_wins(self):
        g = ConsistencyGate(required=3, neighborhood=3)
        g.update([5, 20], [0.5, 0.6])
        g.update([5, 20], [0.5, 0.6])
        assert g.update([5, 20], [0.5, 0.9]) == 20


class TestQueryTopK:
    def test_order_and_padding(self):
        rng = np.random.default_rng(0)
        db = empty_database(8)
        sigs = []
        for i in range(5):
            desc = jnp.asarray(
                rng.choice([-1, 1], size=(64, 256)).astype(np.int8)
            )
            s = bow_signature(desc, jnp.ones(64, bool))
            sigs.append(s)
            db = add_signature(db, s)
        ids, scores = query_topk(db, sigs[1], k=4, exclude_recent=0)
        ids = np.asarray(ids)
        scores = np.asarray(scores)
        assert ids[0] == 1 and scores[0] > 0.99  # exact self-match first
        assert (scores[1:] <= scores[0]).all()

    def test_exclude_recent_pads_with_minus_one(self):
        db = empty_database(8)
        desc = jnp.ones((64, 256), jnp.int8)
        db = add_signature(db, bow_signature(desc, jnp.ones(64, bool)))
        ids, scores = query_topk(db, bow_signature(desc, jnp.ones(64, bool)), k=4)
        assert (np.asarray(ids) == -1).all()  # everything is too recent


class TestGeometricDecoyRejection:
    """Same appearance, different geometry: the Sim3 verification must
    refuse the loop (this is what fires false loops on perceptually
    aliased corridors).  Pixels are each frame's own projection of its
    camera-frame points — the image-space chi2 gate (`Sim3Solver::
    CheckInliers` parity) judges matches by reprojection in BOTH frames."""

    INTR = None  # set lazily (Intrinsics holds jnp scalars)

    @classmethod
    def _intr(cls):
        from qsp_slam_tpu.core.camera import Intrinsics

        if cls.INTR is None:
            cls.INTR = Intrinsics(
                jnp.float32(500.0), jnp.float32(500.0),
                jnp.float32(320.0), jnp.float32(240.0),
            )
        return cls.INTR

    def _uv(self, pts):
        from qsp_slam_tpu.core.camera import project

        return project(pts, self._intr())[0]

    def _snapshot(self, ls, desc, pts):
        F = desc.shape[0]
        ok = jnp.ones(F, bool)
        return snapshot_keyframe(
            ls, desc, ok, pts, ok, self._uv(pts), jnp.zeros(F, jnp.int32)
        )

    def test_decoy_rejected_true_loop_accepted(self):
        rng = np.random.default_rng(3)
        F = 128
        desc = jnp.asarray(rng.choice([-1, 1], size=(F, 256)).astype(np.int8))
        # Points in front of the camera (driving-scene depth range).
        xyz = rng.uniform(-2, 2, size=(F, 3)).astype(np.float32)
        xyz[:, 2] = rng.uniform(3.0, 12.0, size=F).astype(np.float32)
        pts_a = jnp.asarray(xyz)
        # Decoy: identical descriptors, unrelated random geometry.
        xyz_d = rng.uniform(-2, 2, size=(F, 3)).astype(np.float32)
        xyz_d[:, 2] = rng.uniform(3.0, 12.0, size=F).astype(np.float32)
        pts_decoy = jnp.asarray(xyz_d)
        # True revisit: same points seen from a rigidly moved camera.
        th = 0.1
        R = jnp.asarray(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
            jnp.float32,
        )
        t = jnp.asarray([0.3, -0.1, 0.5])
        pts_true = pts_a @ R.T + t

        ls = empty_loop_state(kmax=8, snap=F)
        ls = self._snapshot(ls, desc, pts_a)  # KF 0: the stored place

        key = jax.random.PRNGKey(0)
        common = dict(intr=self._intr(), octave=jnp.zeros(F, jnp.int32))
        det_decoy = verify_loop(
            ls, jnp.int32(0), desc, jnp.ones(F, bool), pts_decoy,
            jnp.ones(F, bool), key, xy=self._uv(pts_decoy), **common,
        )
        det_true = verify_loop(
            ls, jnp.int32(0), desc, jnp.ones(F, bool), pts_true,
            jnp.ones(F, bool), key, xy=self._uv(pts_true), **common,
        )
        assert not bool(det_decoy.found)
        assert bool(det_true.found)
        # And the recovered transform maps stored place -> current frame.
        T = np.asarray(det_true.T_cur_match)
        np.testing.assert_allclose(T[:3, :3], np.asarray(R), atol=2e-2)
        np.testing.assert_allclose(T[:3, 3], np.asarray(t), atol=5e-2)
