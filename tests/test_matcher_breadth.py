"""Matcher strategy breadth: epipolar gate (`SearchForTriangulation`),
vocabulary buckets (`SearchByBoW`), Sim3 correspondence growth
(`SearchBySim3`) — `src/ORBmatcher.cc:159,522,657,1102`."""

import jax
import jax.numpy as jnp
import numpy as np

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.frontend import matcher
from qsp_slam_tpu.slam.loop_closing import _match_and_solve_sim3, empty_loop_state
from qsp_slam_tpu.slam.place_recognition import quantize_words
from qsp_slam_tpu.slam.tracking import TrackingConfig

INTR = TrackingConfig().intr


def _rand_desc(rng, n):
    return (rng.integers(0, 2, (n, 256)) * 2 - 1).astype(np.int8)


def _flip_bits(desc, k, rng):
    out = desc.copy()
    for i in range(len(out)):
        idx = rng.choice(256, k, replace=False)
        out[i, idx] = -out[i, idx]
    return out


class TestEpipolarMask:
    def test_on_line_passes_off_line_fails(self):
        # cam2 is cam1 translated +x by 0.3 (pure baseline).
        T_21 = np.eye(4, dtype=np.float32)
        T_21[0, 3] = -0.3
        p_c1 = jnp.asarray([[0.4, -0.2, 3.0]])
        fx, fy = float(INTR.fx), float(INTR.fy)
        cx, cy = float(INTR.cx), float(INTR.cy)
        uv1 = jnp.asarray(
            [[fx * 0.4 / 3.0 + cx, fy * -0.2 / 3.0 + cy]], jnp.float32
        )
        p_c2 = (jnp.asarray(T_21) @ jnp.asarray([0.4, -0.2, 3.0, 1.0]))[:3]
        u2 = fx * p_c2[0] / p_c2[2] + cx
        v2 = fy * p_c2[1] / p_c2[2] + cy
        # true correspondence, a point shifted ALONG the (horizontal)
        # epipolar line, and one shifted OFF it.
        uv2 = jnp.asarray(
            [[u2, v2], [u2 + 40.0, v2], [u2, v2 + 8.0]], jnp.float32
        )
        mask = matcher.epipolar_mask(uv1, uv2, jnp.asarray(T_21), INTR)
        assert bool(mask[0, 0])
        assert bool(mask[0, 1])  # along the line: epipolar-consistent
        assert not bool(mask[0, 2])  # off the line

    def test_disambiguates_repeated_texture(self):
        rng = np.random.default_rng(0)
        desc = _rand_desc(rng, 2)
        # Frame B: column 0 = the TRUE correspondence (viewpoint-damaged by
        # 6 bits), column 1 = an exact repeated-texture impostor elsewhere.
        true_col = _flip_bits(desc[:1], 6, rng)[0]
        desc_b = np.vstack([true_col, desc[0], desc[1]])
        ok_a = jnp.ones(2, bool)
        ok_b = jnp.ones(3, bool)
        plain = matcher.mutual_match(
            jnp.asarray(desc), ok_a, jnp.asarray(desc_b), ok_b, ratio=0.9
        )
        assert int(plain.idx[0]) == 1  # appearance alone picks the impostor
        # The epipolar gate removes the impostor column -> true match wins.
        gate = jnp.asarray([[True, False, True], [True, True, True]])
        gated = matcher.mutual_match(
            jnp.asarray(desc), ok_a, jnp.asarray(desc_b), ok_b,
            ratio=0.9, pair_mask=gate,
        )
        assert bool(gated.valid[0]) and int(gated.idx[0]) == 0


class TestWordMask:
    def test_same_descriptor_same_word(self):
        rng = np.random.default_rng(1)
        d = _rand_desc(rng, 8)
        w1 = quantize_words(jnp.asarray(d))
        w2 = quantize_words(jnp.asarray(d.copy()))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        m = matcher.word_mask(w1, w2)
        assert bool(jnp.all(jnp.diagonal(m)))

    def test_near_descriptors_usually_share_words(self):
        rng = np.random.default_rng(2)
        d = _rand_desc(rng, 64)
        d2 = _flip_bits(d, 8, rng)  # 8/256 bits flipped
        w1 = quantize_words(jnp.asarray(d))
        w2 = quantize_words(jnp.asarray(d2))
        agree = float((np.asarray(w1) == np.asarray(w2)).mean())
        assert agree > 0.5, agree


class TestIdfScoring:
    def test_idf_downweights_ubiquitous_words(self):
        """Aliasing: every stored KF shares a dominant common-word block;
        only the true match shares the query's distinctive words.  Raw tf
        cosine ranks an impostor (more common-word mass) first; idf ranks
        the true match first."""
        from qsp_slam_tpu.slam.place_recognition import (
            SIG_DIM, empty_database, add_signature, query,
        )

        def sig(common_w, distinct, distinct_w):
            s = np.zeros(SIG_DIM, np.float32)
            s[:24] = common_w  # words 0..23 appear in EVERY keyframe
            for d in distinct:
                s[d] = distinct_w
            return jnp.asarray(s / np.linalg.norm(s))

        db = empty_database(kmax=16)
        # 12 aliased keyframes with heavy common mass, light distinct words
        for k in range(12):
            db = add_signature(db, sig(1.0, [100 + 3 * k, 101 + 3 * k], 0.6))
        # the true match: lighter common mass, strong distinctive overlap
        db = add_signature(db, sig(0.4, [400, 401, 402], 1.0))
        true_id = 12
        for _ in range(3):  # recency padding so the match is eligible
            db = add_signature(db, sig(1.0, [300], 0.2))

        q = sig(1.0, [400, 401, 402], 1.0)
        raw = np.asarray(db.signatures @ q).copy()
        raw[int(db.count) - 3:] = -1
        best, score = query(db, q, exclude_recent=3)
        assert int(np.argmax(raw)) != true_id  # tf alone is fooled
        assert int(best) == true_id
        assert float(score) > 0.5


class TestSim3Growth:
    def test_growth_recovers_damaged_correspondences(self):
        from qsp_slam_tpu.core.camera import Intrinsics, project

        rng = np.random.default_rng(3)
        S = 120
        pts_src = rng.uniform(-2, 2, (S, 3)).astype(np.float32)
        pts_src[:, 2] = rng.uniform(3.0, 10.0, S).astype(np.float32)
        desc_src = _rand_desc(rng, S)
        # ground-truth Sim3: rotation about y + translation
        xi = jnp.asarray([0.3, -0.1, 0.2, 0.0, 0.15, 0.0], jnp.float32)
        T = np.asarray(lie.exp_se3(xi))
        pts_dst = (pts_src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        # 40% of descriptors survive exactly; 60% damaged by 70 bit flips
        # (beyond TH_LOW=50, within TH_HIGH=100): the appearance-only pass
        # cannot use them, the Sim3-radius growth pass can.
        desc_dst = desc_src.copy()
        damaged = rng.choice(S, int(0.6 * S), replace=False)
        desc_dst[damaged] = _flip_bits(desc_src[damaged], 70, rng)

        intr = Intrinsics(jnp.float32(500.0), jnp.float32(500.0),
                          jnp.float32(320.0), jnp.float32(240.0))
        snap = 128
        ls = empty_loop_state(kmax=2, snap=snap)
        pad = snap - S
        uv_src = project(jnp.asarray(pts_src), intr)[0]
        ls = ls._replace(
            kf_desc=ls.kf_desc.at[0, :S].set(jnp.asarray(desc_src)),
            kf_pts_cam=ls.kf_pts_cam.at[0, :S].set(jnp.asarray(pts_src)),
            kf_pts_ok=ls.kf_pts_ok.at[0, :S].set(True),
            kf_xy=ls.kf_xy.at[0, :S].set(uv_src),
        )
        pts_cur = jnp.asarray(
            np.vstack([pts_dst, rng.uniform(5, 9, (pad, 3))]).astype(np.float32)
        )
        res, first = _match_and_solve_sim3(
            ls, jnp.int32(0),
            jnp.asarray(np.vstack([desc_dst, _rand_desc(rng, pad)])),
            jnp.ones(snap, bool),
            pts_cur,
            jnp.concatenate([jnp.ones(S, bool), jnp.zeros(pad, bool)]),
            project(pts_cur, intr)[0],
            jnp.zeros(snap, jnp.int32),
            jax.random.PRNGKey(0), True, intr,
        )
        assert bool(res.ok)
        n_first = int(jnp.sum(first.valid))
        assert int(res.num_inliers) > n_first, (
            f"growth added nothing ({int(res.num_inliers)} <= {n_first})"
        )
        # The refined Sim3 matches the ground truth.
        err = np.asarray(res.T_ds) @ np.linalg.inv(T) - np.eye(4)
        assert np.abs(err).max() < 0.02, np.abs(err).max()
