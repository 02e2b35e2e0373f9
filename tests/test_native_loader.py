"""Native C++ dataset loader (native/data_loader.cpp via ctypes).

The native decode must be BIT-IDENTICAL to the PIL fallback for every PNG
variant the datasets use (8-bit gray / RGB / RGBA, 16-bit gray depth), and
the prefetch pool must reproduce the synchronous loader's frames exactly.
"""

import numpy as np
import pytest
from PIL import Image

from qsp_slam_tpu.data.native_loader import (
    FramePrefetcher,
    load_png,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader unavailable"
)


def _pil_gray(path):
    return np.asarray(Image.open(path).convert("L"), np.float32)


class TestPngDecode:
    def test_gray8(self, tmp_path, rng):
        img = rng.integers(0, 256, (48, 64), np.uint8)
        p = str(tmp_path / "g.png")
        Image.fromarray(img).save(p)
        out = load_png(p)
        np.testing.assert_array_equal(out, img.astype(np.float32))

    def test_rgb8_matches_pil_luminance(self, tmp_path, rng):
        img = rng.integers(0, 256, (40, 56, 3), np.uint8)
        p = str(tmp_path / "c.png")
        Image.fromarray(img).save(p)
        out = load_png(p)
        np.testing.assert_array_equal(out, _pil_gray(p))

    def test_rgba8(self, tmp_path, rng):
        img = rng.integers(0, 256, (32, 32, 4), np.uint8)
        p = str(tmp_path / "a.png")
        Image.fromarray(img, "RGBA").save(p)
        out = load_png(p)
        np.testing.assert_array_equal(out, _pil_gray(p))

    def test_gray16_depth_scaling(self, tmp_path, rng):
        d = rng.integers(0, 40000, (48, 64)).astype(np.uint16)
        p = str(tmp_path / "d.png")
        Image.fromarray(d, mode="I;16").save(p)
        out = load_png(p, scale=1.0 / 5000.0)
        ref = np.asarray(Image.open(p), np.float32) / 5000.0
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)

    def test_unsupported_palette_falls_back(self, tmp_path):
        img = Image.fromarray(
            np.arange(64, dtype=np.uint8).reshape(8, 8)
        ).convert("P")
        p = str(tmp_path / "p.png")
        img.save(p)
        assert load_png(p) is None  # caller falls back to PIL

    def test_missing_file(self):
        assert load_png("/nonexistent/x.png") is None


class TestPrefetcher:
    def _make_seq(self, tmp_path, rng, n=6):
        pairs = []
        for i in range(n):
            g = rng.integers(0, 256, (24, 32), np.uint8)
            d = rng.integers(0, 30000, (24, 32)).astype(np.uint16)
            gp = str(tmp_path / f"g{i}.png")
            dp = str(tmp_path / f"d{i}.png")
            Image.fromarray(g).save(gp)
            Image.fromarray(d, mode="I;16").save(dp)
            pairs.append((gp, dp))
        return pairs

    def test_matches_sync_decode(self, tmp_path, rng):
        pairs = self._make_seq(tmp_path, rng)
        pf = FramePrefetcher(pairs, 1.0 / 5000.0, threads=3, lookahead=2)
        try:
            for i, (gp, dp) in enumerate(pairs):
                got = pf.get(i)
                assert got is not None
                gray, depth = got
                np.testing.assert_array_equal(gray, load_png(gp))
                np.testing.assert_array_equal(
                    depth, load_png(dp, 1.0 / 5000.0)
                )
        finally:
            pf.close()

    def test_bad_frame_reports_none(self, tmp_path, rng):
        pairs = self._make_seq(tmp_path, rng, n=2)
        pairs[1] = (pairs[1][0], str(tmp_path / "missing.png"))
        pf = FramePrefetcher(pairs, 1.0, threads=1)
        try:
            assert pf.get(0) is not None
            assert pf.get(1) is None  # decode failure -> PIL fallback signal
        finally:
            pf.close()


class TestTumIntegration:
    def test_prefetch_iter_matches_load(self, tmp_path, rng):
        from qsp_slam_tpu.data import make_tum
        from qsp_slam_tpu.data.tum import TumSequence

        root = tmp_path / "seq"
        make_tum.main([str(root), "--frames", "8", "--objects", "1"])
        seq = TumSequence(str(root))
        indices = list(range(0, len(seq), 2))
        got = list(seq.prefetch_iter(indices, threads=2))
        assert [g[4] for g in got] == indices
        for gray, depth, t, T_cw, i in got:
            g0, d0, t0, T0 = seq.load(i)
            np.testing.assert_array_equal(gray, g0)
            np.testing.assert_array_equal(depth, d0)
            assert t == t0
            if T0 is None:
                assert T_cw is None
            else:
                np.testing.assert_allclose(T_cw, T0)
