"""Tests for FAST detection, ORB descriptors, and matmul Hamming matching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.frontend import fast, matcher, orb
from qsp_slam_tpu.frontend.pyramid import PyramidConfig, build_pyramid


def make_texture(rng, h=480, w=640, blobs=300):
    """Random bright blobs on dark background — corner-rich synthetic image."""
    img = np.zeros((h, w), np.float32)
    ys = rng.integers(10, h - 20, blobs)
    xs = rng.integers(10, w - 20, blobs)
    sz = rng.integers(4, 14, blobs)
    val = rng.uniform(80, 255, blobs)
    for y, x, s, v in zip(ys, xs, sz, val):
        img[y : y + s, x : x + s] = np.maximum(img[y : y + s, x : x + s], v)
    return img


class TestFast:
    def test_detects_square_corners(self):
        img = np.zeros((64, 64), np.float32)
        img[20:40, 20:40] = 200.0
        kp = fast.detect_keypoints(jnp.asarray(img), 20.0, 16)
        pts = np.asarray(kp.xy)[np.asarray(kp.valid)]
        assert len(pts) >= 4
        corners = np.array([[20, 20], [39, 20], [20, 39], [39, 39]])
        for c in corners:
            d = np.min(np.linalg.norm(pts - c, axis=1))
            assert d <= 2.0, (c, pts)

    def test_no_corners_in_flat_image(self):
        img = jnp.full((64, 64), 100.0)
        kp = fast.detect_keypoints(img, 20.0, 16)
        assert not bool(np.asarray(kp.valid).any())

    def test_spatial_distribution(self, rng):
        img = make_texture(rng)
        kp = fast.detect_keypoints(jnp.asarray(img), 20.0, 256, cell=32, cell_cap=4)
        pts = np.asarray(kp.xy)[np.asarray(kp.valid)]
        assert len(pts) > 100
        # No 32px cell may contain more than cell_cap points.
        cells = (pts[:, 1] // 32).astype(int) * 100 + (pts[:, 0] // 32).astype(int)
        _, counts = np.unique(cells, return_counts=True)
        assert counts.max() <= 4


class TestDescriptors:
    def test_hamming_matmul_equals_popcount(self, rng):
        img = make_texture(rng)
        feats = orb.extract_features(jnp.asarray(img), orb.OrbConfig(num_features=128))
        bits = np.asarray(feats.desc_bits)
        pm = feats.desc_pm
        d_mat = np.asarray(matcher.hamming_matrix(pm[:32], pm[32:64]))
        a = bits[:32]
        b = bits[32:64]
        d_ref = np.zeros((32, 32), np.int32)
        for i in range(32):
            for j in range(32):
                x = a[i] ^ b[j]
                d_ref[i, j] = sum(bin(int(w)).count("1") for w in x)
        np.testing.assert_array_equal(d_mat, d_ref)

    def test_match_under_translation(self, rng):
        img = make_texture(rng)
        shift = 7
        img2 = np.roll(img, (shift, shift), axis=(0, 1))
        cfg = orb.OrbConfig(num_features=256)
        fa = orb.extract_features(jnp.asarray(img), cfg)
        fb = orb.extract_features(jnp.asarray(img2), cfg)
        m = matcher.mutual_match(fa.desc_pm, fa.valid, fb.desc_pm, fb.valid)
        idx = np.asarray(m.idx)
        ok = np.asarray(m.valid)
        assert ok.sum() > 50
        dxy = np.asarray(fb.xy)[idx[ok]] - np.asarray(fa.xy)[ok]
        med = np.median(dxy, axis=0)
        # Most matches should agree with the true shift.
        frac = (np.linalg.norm(dxy - [shift, shift], axis=1) < 2.0).mean()
        assert frac > 0.7, (med, frac)

    def test_match_under_rotation(self, rng):
        # Band-passed noise: full-entropy descriptors (blob images produce
        # correlated bits — random-pair distance drops from ~128 to ~46 and
        # global mutual matching legitimately drowns).
        from scipy.ndimage import gaussian_filter, rotate as nd_rotate

        noise = rng.normal(size=(480, 640))
        img = gaussian_filter(noise, 2.0) - gaussian_filter(noise, 6.0)
        img = ((img - img.min()) / np.ptp(img) * 255).astype(np.float32)
        img2 = nd_rotate(img, 10.0, reshape=False, order=1).astype(np.float32)
        cfg = orb.OrbConfig(num_features=256)
        fa = orb.extract_features(jnp.asarray(img), cfg)
        fb = orb.extract_features(jnp.asarray(img2), cfg)
        # Full-entropy sanity: random pairs should sit near 128 bits apart.
        pa, pb = np.asarray(fa.desc_pm), np.asarray(fb.desc_pm)
        drand = (256 - pa.astype(np.int32) @ pb.astype(np.int32).T) // 2
        assert 110 < np.median(drand) < 146
        m = matcher.mutual_match(fa.desc_pm, fa.valid, fb.desc_pm, fb.valid)
        ok = np.asarray(m.valid)
        idx = np.asarray(m.idx)
        # Verify matches geometrically: rotate fa.xy by 10 deg about center.
        th = np.deg2rad(-10.0)
        c = np.array([320.0, 240.0])
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        pred = (np.asarray(fa.xy)[ok] - c) @ R.T + c
        err = np.linalg.norm(np.asarray(fb.xy)[idx[ok]] - pred, axis=1)
        assert ok.sum() >= 20
        assert (err < 3.0).mean() > 0.7

    def test_rotation_consistency_filter(self, rng):
        n = 200
        angle_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        angle_b = angle_a - 0.3  # consistent rotation
        angle_b[:20] = rng.uniform(0, 2 * np.pi, 20)  # inconsistent subset
        valid = np.ones(n, bool)
        keep = np.asarray(
            matcher.rotation_consistency(
                jnp.asarray(angle_a), jnp.asarray(angle_b), jnp.asarray(valid)
            )
        )
        assert keep[20:].mean() > 0.9
        assert keep[:20].mean() < 0.5


class TestResolve:
    def test_duplicate_resolution(self):
        m = matcher.MatchResult(
            idx=jnp.asarray([2, 2, 1, -1], jnp.int32),
            dist=jnp.asarray([10, 5, 7, 99], jnp.int32),
            valid=jnp.asarray([True, True, True, False]),
        )
        r = matcher.resolve_duplicates(m, num_targets=4)
        np.testing.assert_array_equal(np.asarray(r.idx), [-1, 2, 1, -1])


class TestPyramid:
    def test_level_shapes(self):
        cfg = PyramidConfig()
        pyr = build_pyramid(jnp.zeros((480, 640)), cfg)
        assert len(pyr) == 8
        assert pyr[0].shape == (480, 640)
        assert pyr[1].shape == (400, 533)
        assert pyr[7].shape[0] < 140


class TestExtractor:
    def test_full_extraction(self, rng):
        img = make_texture(rng)
        feats = orb.extract_features(jnp.asarray(img), orb.OrbConfig(num_features=512))
        v = np.asarray(feats.valid)
        assert v.sum() > 300
        assert feats.xy.shape[0] == 512
        # Multiple octaves represented.
        assert len(np.unique(np.asarray(feats.octave)[v])) >= 3
        # Level-0 coords within image bounds.
        xy = np.asarray(feats.xy)[v]
        assert xy[:, 0].max() < 640 * 1.01 and xy[:, 1].max() < 480 * 1.01
