"""Two-view monocular initialization + stereo matching tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.core.camera import Intrinsics, project
from qsp_slam_tpu.data.render import make_room, render_frame
from qsp_slam_tpu.frontend import matcher
from qsp_slam_tpu.frontend.initializer import two_view_init
from qsp_slam_tpu.frontend.orb import OrbConfig, extract_features
from qsp_slam_tpu.frontend.stereo import depth_from_u_right, match_stereo
from qsp_slam_tpu.slam.tracking import TrackingConfig


def make_intr():
    return Intrinsics(
        jnp.float32(520.9), jnp.float32(521.0), jnp.float32(325.1), jnp.float32(249.7)
    )


class TestTwoViewInit:
    def test_synthetic_correspondences(self, rng):
        """Noise-free synthetic matches: recover R, t direction and structure."""
        intr = make_intr()
        M = 200
        pts = jnp.asarray(
            rng.uniform([-2, -1.5, 3], [2, 1.5, 8], (M, 3)), jnp.float32
        )
        T2_gt = lie.exp_se3(jnp.asarray([0.3, 0.02, 0.05, 0.02, -0.06, 0.01]))
        uv1, z1 = project(pts, intr)
        uv2, z2 = project(lie.transform_points(T2_gt, pts[None])[0], intr)
        uv1 = np.array(uv1) + rng.normal(0, 0.3, (M, 2))
        uv2 = np.array(uv2) + rng.normal(0, 0.3, (M, 2))
        res = two_view_init(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.ones(M, bool), intr, jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        # Translation direction matches (mono scale is free).
        t_est = np.asarray(res.T_cw2[:3, 3])
        t_gt = np.asarray(T2_gt[:3, 3])
        cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
        assert cos > 0.99, cos  # 8pt w/o BA polish; BA refines right after init
        R_err = np.abs(
            np.asarray(res.T_cw2[:3, :3]) - np.asarray(T2_gt[:3, :3])
        ).max()
        assert R_err < 0.01
        # Structure: triangulated points proportional to GT (same scale factor).
        ok = np.asarray(res.pt_ok)
        assert ok.sum() > 120
        ratio = np.asarray(res.points)[ok][:, 2] / np.asarray(pts)[ok][:, 2]
        assert np.std(ratio) / np.mean(ratio) < 0.05

    def test_planar_scene_homography_path(self, rng):
        """All points on one plane: H model selected, pose still recovered."""
        intr = make_intr()
        M = 150
        xy = rng.uniform([-2, -1.5], [2, 1.5], (M, 2))
        pts = jnp.asarray(
            np.concatenate([xy, np.full((M, 1), 5.0)], -1), jnp.float32
        )  # z = 5 plane
        T2_gt = lie.exp_se3(jnp.asarray([0.4, 0.0, 0.1, 0.0, -0.08, 0.0]))
        uv1, _ = project(pts, intr)
        uv2, _ = project(lie.transform_points(T2_gt, pts[None])[0], intr)
        res = two_view_init(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(M, bool), intr,
            jax.random.PRNGKey(1),
        )
        assert bool(res.used_homography)
        assert bool(res.ok)
        t_est = np.asarray(res.T_cw2[:3, 3])
        t_gt = np.asarray(T2_gt[:3, 3])
        cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
        assert cos > 0.99, cos

    def test_rejects_pure_rotation(self, rng):
        intr = make_intr()
        M = 150
        pts = jnp.asarray(rng.uniform([-2, -1.5, 3], [2, 1.5, 8], (M, 3)), jnp.float32)
        T2 = lie.exp_se3(jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.06, 0.0]))  # no t
        uv1, _ = project(pts, intr)
        uv2, _ = project(lie.transform_points(T2, pts[None])[0], intr)
        res = two_view_init(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(M, bool), intr,
            jax.random.PRNGKey(2),
        )
        assert not bool(res.ok)  # no parallax -> no init


class TestStereo:
    def test_rendered_stereo_pair_depth(self):
        cfg = TrackingConfig(orb=OrbConfig(num_features=400))
        room = make_room()
        baseline = 0.12
        bf = baseline * float(cfg.intr.fx)
        T_l = jnp.eye(4)
        # right camera: shifted along +x in camera frame
        T_r = jnp.eye(4).at[0, 3].set(-baseline)  # T_cw: x_cam = x_w - b
        gl, dl = render_frame(room, T_l, cfg.intr)
        gr, _ = render_frame(room, T_r, cfg.intr)
        fl = extract_features(gl, cfg.orb)
        fr = extract_features(gr, cfg.orb)
        u_r = match_stereo(fl, fr, bf)
        depth = depth_from_u_right(fl.xy[:, 0], u_r, bf)
        ok = np.asarray(depth) > 0
        assert ok.sum() > 150
        # Compare against rendered depth at the keypoint.
        xi = np.clip(np.round(np.asarray(fl.xy[:, 0])).astype(int), 0, 639)
        yi = np.clip(np.round(np.asarray(fl.xy[:, 1])).astype(int), 0, 479)
        d_gt = np.asarray(dl)[yi, xi]
        err = np.abs(np.asarray(depth)[ok] - d_gt[ok]) / d_gt[ok]
        assert np.median(err) < 0.05, np.median(err)

    def test_subpixel_refinement_tightens_disparity(self):
        """With images, the SAD subpixel scan + median prune must hold
        disparity error well under a pixel (the coarse feature-to-feature
        disparity is only pixel-accurate, a multi-meter depth error at
        driving ranges — see frontend/stereo.py)."""
        cfg = TrackingConfig(orb=OrbConfig(num_features=400))
        room = make_room()
        baseline = 0.12
        bf = baseline * float(cfg.intr.fx)
        T_l = jnp.eye(4)
        T_r = jnp.eye(4).at[0, 3].set(-baseline)
        gl, dl = render_frame(room, T_l, cfg.intr)
        gr, _ = render_frame(room, T_r, cfg.intr)
        fl = extract_features(gl, cfg.orb)
        fr = extract_features(gr, cfg.orb)
        u_coarse = match_stereo(fl, fr, bf)
        u_fine = match_stereo(fl, fr, bf, gray_left=gl, gray_right=gr)
        xi = np.clip(np.round(np.asarray(fl.xy[:, 0])).astype(int), 0, 639)
        yi = np.clip(np.round(np.asarray(fl.xy[:, 1])).astype(int), 0, 479)
        d_gt = np.asarray(dl)[yi, xi]
        disp_gt = bf / np.maximum(d_gt, 1e-6)

        def disp_err(u_r):
            ok = np.asarray(u_r) >= 0
            disp = np.asarray(fl.xy[:, 0]) - np.asarray(u_r)
            return ok, np.abs(disp - disp_gt)

        ok_c, err_c = disp_err(u_coarse)
        ok_f, err_f = disp_err(u_fine)
        assert ok_f.sum() > 100
        med_f = float(np.median(err_f[ok_f]))
        assert med_f < 0.4, med_f
        assert med_f < float(np.median(err_c[ok_c]))
        # Gross mismatches (> 2 px) must be pruned to a small fraction.
        assert float(np.mean(err_f[ok_f] > 2.0)) < 0.08
