"""Tests: dataset readers, trajectory/map persistence, object eval, config."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie


class TestTumReader:
    def test_parse_and_associate(self, tmp_path, rng):
        # Fabricate a tiny TUM-format dataset with PIL images.
        from PIL import Image

        root = tmp_path / "seq"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir()
        rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
        for i in range(4):
            t = 100.0 + i * 0.033
            img = Image.fromarray(
                rng.integers(0, 255, (24, 32), np.uint8), mode="L"
            )
            img.save(root / "rgb" / f"{i}.png")
            d = (rng.uniform(0.5, 3.0, (24, 32)) * 5000).astype(np.uint16)
            Image.fromarray(d, mode="I;16").save(root / "depth" / f"{i}.png")
            rgb_lines.append(f"{t:.6f} rgb/{i}.png")
            depth_lines.append(f"{t + 0.005:.6f} depth/{i}.png")
            gt_lines.append(f"{t:.6f} {0.1 * i} 0 0 0 0 0 1")
        (root / "rgb.txt").write_text("\n".join(rgb_lines))
        (root / "depth.txt").write_text("\n".join(depth_lines))
        (root / "groundtruth.txt").write_text("\n".join(gt_lines))

        from qsp_slam_tpu.data.tum import TumSequence

        seq = TumSequence(str(root))
        assert len(seq) == 4
        gray, depth, t, T_cw = seq.load(1)
        assert gray.shape == (24, 32) and depth.shape == (24, 32)
        assert 0.4 < depth.mean() < 3.1  # meters after scaling
        np.testing.assert_allclose(T_cw[:3, 3], [-0.1, 0, 0], atol=1e-6)


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path, rng):
        from qsp_slam_tpu.data.io import load_trajectory_tum, save_trajectory_tum

        F = 5
        Tcw = np.stack(
            [
                np.asarray(lie.exp_se3(jnp.asarray(rng.normal(0, 0.3, 6), jnp.float32)))
                for _ in range(F)
            ]
        )
        ts = 100 + np.arange(F) * 0.1
        p = tmp_path / "traj.txt"
        save_trajectory_tum(str(p), ts, Tcw)
        ts2, Tcw2 = load_trajectory_tum(str(p))
        np.testing.assert_allclose(ts2, ts, atol=1e-5)
        np.testing.assert_allclose(Tcw2, Tcw, atol=1e-4)

    def test_kitti_format(self, tmp_path):
        from qsp_slam_tpu.data.io import save_trajectory_kitti

        Tcw = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        p = tmp_path / "00.txt"
        save_trajectory_kitti(str(p), Tcw)
        rows = np.loadtxt(p)
        assert rows.shape == (3, 12)
        np.testing.assert_allclose(rows[0].reshape(3, 4), np.eye(4)[:3], atol=1e-8)


class TestMapIO:
    def test_save_load_roundtrip(self, tmp_path):
        from qsp_slam_tpu.data.io import export_map_txt, load_map, save_map
        from qsp_slam_tpu.slam import map as mapmod
        from qsp_slam_tpu.slam.objects import empty_objects

        m = mapmod.empty_map(8, 64, 256)
        m, _ = mapmod.add_keyframe(m, jnp.eye(4))
        m, ids = mapmod.add_points(
            m, jnp.ones((4, 3)), jnp.zeros((4, 256), jnp.int8),
            jnp.zeros(4, jnp.int32), jnp.zeros((4, 3)), jnp.ones(4, bool),
        )
        obj = empty_objects(4)
        p = tmp_path / "map.npz"
        save_map(str(p), m, obj)
        z = load_map(str(p))
        assert z["num_pts"] == 4 and z["num_kfs"] == 1
        export_map_txt(str(tmp_path / "txt"), m, obj)
        pts = np.loadtxt(tmp_path / "txt" / "MapPoints.txt")
        assert pts.shape == (4, 3)


class TestObjectEval:
    def test_perfect_match(self):
        from qsp_slam_tpu.eval.objects import evaluate_objects

        gt = np.array(
            [
                [0, 0, 0, 0, 0, 0, 0.3, 0.2, 0.4],
                [2, 0, 1, 0, 0, 0.5, 0.2, 0.2, 0.2],
            ],
            np.float32,
        )
        labels = np.array([1, 2])
        res = evaluate_objects(gt, labels, gt, labels)
        assert res.precision == 1.0 and res.recall == 1.0
        assert res.mean_iou > 0.9
        assert res.mean_center_err < 1e-6

    def test_partial_and_label_gate(self):
        from qsp_slam_tpu.eval.objects import evaluate_objects

        gt = np.array(
            [
                [0, 0, 0, 0, 0, 0, 0.3, 0.2, 0.4],
                [2, 0, 1, 0, 0, 0.0, 0.2, 0.2, 0.2],
            ],
            np.float32,
        )
        est = np.array(
            [
                [0.05, 0, 0, 0, 0, 0, 0.3, 0.2, 0.4],  # good match for gt0
                [9, 9, 9, 0, 0, 0, 0.2, 0.2, 0.2],  # false positive
            ],
            np.float32,
        )
        res = evaluate_objects(
            est, np.array([1, 2]), gt, np.array([1, 2])
        )
        assert res.precision == 0.5 and res.recall == 0.5
        assert res.matches[0][:2] == (0, 0)

    def test_iou_mc_known_value(self):
        from qsp_slam_tpu.eval.objects import ellipsoid_iou_mc

        a = np.array([0, 0, 0, 0, 0, 0, 1, 1, 1], np.float32)
        b = np.array([1, 0, 0, 0, 0, 0, 1, 1, 1], np.float32)  # unit spheres 1 apart
        iou = ellipsoid_iou_mc(a, b, samples=20000)
        # analytic: lens volume / union = ~0.1875 / ... = 0.2026...
        v_lens = 2 * np.pi * (2 / 3 - 1 / 2 + 1 / 24) / (np.pi * 4 / 3 * 2 - 2 * np.pi * (2 / 3 - 1 / 2 + 1 / 24))
        assert abs(iou - v_lens) < 0.03


class TestConfig:
    def test_yaml_to_tracking_config(self, tmp_path):
        from qsp_slam_tpu.slam.config import tracking_config_from_yaml

        y = tmp_path / "seq.yaml"
        y.write_text(
            "%YAML:1.0\n"
            "Camera.fx: 500.0\nCamera.fy: 501.0\nCamera.cx: 320.0\n"
            "Camera.cy: 240.0\nCamera.bf: 40.0\n"
            "ORBextractor.nFeatures: 1500\nORBextractor.scaleFactor: 1.25\n"
            "ORBextractor.nLevels: 6\n"
        )
        cfg = tracking_config_from_yaml(str(y))
        assert cfg.fx == 500.0
        assert cfg.orb.num_features == 1500
        assert cfg.orb.pyramid.num_levels == 6
        assert abs(cfg.baseline - 40.0 / 500.0) < 1e-9

    def test_unknown_key_warns(self, tmp_path):
        from qsp_slam_tpu.slam.config import tracking_config_from_yaml

        y = tmp_path / "seq.yaml"
        y.write_text("Camera.fx: 500.0\nBogus.key: 1\n")
        with pytest.warns(UserWarning, match="Bogus.key"):
            tracking_config_from_yaml(str(y))

    def test_shape_json(self, tmp_path):
        from qsp_slam_tpu.slam.config import shape_config_from_json

        j = tmp_path / "model.json"
        j.write_text('{"optimizer": {"num_iterations": 5, "k1": 2.0, "b1": 0.1}}')
        cfg = shape_config_from_json(str(j))
        assert cfg.iters == 5 and cfg.w_sdf == 2.0 and cfg.huber_sdf == 0.1


class TestVizExport:
    def test_export_scene(self, tmp_path):
        from qsp_slam_tpu.slam import map as mapmod
        from qsp_slam_tpu.slam.objects import empty_objects
        from qsp_slam_tpu.viz.export import export_scene

        m = mapmod.empty_map(4, 32, 64)
        m, _ = mapmod.add_points(
            m, jnp.ones((4, 3)), jnp.zeros((4, 256), jnp.int8),
            jnp.zeros(4, jnp.int32), jnp.zeros((4, 3)), jnp.ones(4, bool),
        )
        obj = empty_objects(4)
        obj = obj._replace(
            ellipsoid=obj.ellipsoid.at[0].set(
                jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1, 1.0])
            ),
            valid=obj.valid.at[0].set(True),
        )
        out = tmp_path / "viz"
        export_scene(str(out), m, obj, trajectory=np.tile(np.eye(4), (3, 1, 1)))
        assert (out / "map_points.ply").exists()
        assert (out / "object_wireframes.ply").exists()
        assert (out / "trajectory.ply").exists()
