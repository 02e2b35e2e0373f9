"""FrameDrawer artifact + labeller CLI (reference `src/FrameDrawer.cc:1`,
`src/Labeller.cc:1` — headless equivalents)."""

import numpy as np
import jax.numpy as jnp

from qsp_slam_tpu.viz.frame_draw import annotate_frame, frame_status, save_annotated
from qsp_slam_tpu import label_tool


class TestFrameDraw:
    def test_annotate_and_save(self, tmp_path):
        gray = np.full((120, 160), 40.0)
        kp = np.array([[30.0, 40.0], [80.0, 60.0], [0.0, 0.0]])  # last=pad
        tracked = np.array([True, False, False])
        bboxes = np.array([[20.0, 30.0, 60.0, 70.0]])
        img = annotate_frame(
            gray, kp_xy=kp, kp_tracked=tracked, bboxes=bboxes,
            labels=np.array([1]), probs=np.array([0.9]), status="f0 OK",
        )
        assert img.size == (160, 120)
        a = np.asarray(img)
        # tracked keypoint drew green-ish, bbox edge drew its label color
        assert a[40 - 2, 30 - 2, 1] > 200 and a[40 - 2, 30 - 2, 0] < 100
        assert tuple(a[30, 40]) != (40, 40, 40)  # on the bbox top edge
        # status bar strip is black-backed
        assert a[-7, 80].sum() < 300
        p = tmp_path / "f" / "000001.png"
        save_annotated(str(p), gray, kp_xy=kp, status="x")
        assert p.exists()

    def test_system_frame_info(self):
        from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
        from qsp_slam_tpu.frontend.orb import OrbConfig
        from qsp_slam_tpu.slam.system import SlamSystem
        from qsp_slam_tpu.slam.tracking import TrackingConfig

        cfg = TrackingConfig(orb=OrbConfig(num_features=400))
        room = make_room()
        traj = orbit_trajectory(6)
        sysm = SlamSystem(
            cfg, kmax=8, nmax=2048, emax=16384,
            enable_objects=False, keep_frame_info=True,
        )
        for i in range(6):
            gray, depth = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
            sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
        info = sysm.last_frame_info
        assert info is not None
        assert info["kp_xy"].shape[1] == 2
        assert info["kp_tracked"].sum() > 50  # healthy tracking
        s = frame_status(sysm, 5)
        assert "kfs=" in s and "OK" in s


class TestLabelTool:
    def test_det_roundtrip(self, tmp_path, capsys):
        d = str(tmp_path)
        label_tool.main([
            "det", "add", d, "0", "--bbox", "10", "20", "50", "60",
            "--label", "2", "--prob", "0.8",
        ])
        label_tool.main([
            "det", "add", d, "0", "--bbox", "5", "5", "30", "30",
            "--label", "1",
        ])
        label_tool.main(["det", "list", d])
        out = capsys.readouterr().out
        assert "label=2" in out and "label=1" in out
        label_tool.main(["det", "remove", d, "0", "0"])
        label_tool.main(["det", "list", d])
        out = capsys.readouterr().out
        assert "label=1" in out and "label=2" not in out
        # The edited cache still loads through the replay seam.
        from qsp_slam_tpu.data.io import load_detection_cache

        det = load_detection_cache(str(tmp_path / "0.npz"))
        assert det["bbox"].shape == (1, 4) and int(det["label"][0]) == 1

    def test_det_edit_preserves_masks(self, tmp_path):
        from qsp_slam_tpu.data.io import load_detection_cache, save_detection_cache

        p = str(tmp_path / "3.npz")
        mask = np.zeros((2, 24, 32), bool)
        mask[0, 2:6, 3:9] = True
        save_detection_cache(p, {
            "bbox": np.array([[1, 1, 9, 9], [2, 2, 8, 8]], np.float32),
            "label": np.array([0, 1], np.int32),
            "prob": np.array([0.9, 0.8], np.float32),
            "valid": np.array([True, True]),
            "mask": mask,
        })
        label_tool.main(["det", "remove", str(tmp_path), "3", "1"])
        det = load_detection_cache(p)
        assert det["mask"].shape == (1, 24, 32)
        np.testing.assert_array_equal(det["mask"][0], mask[0])

    def test_gt_roundtrip_and_from_map(self, tmp_path, capsys):
        f = str(tmp_path / "gt.npz")
        e = [1.0, 0.5, 2.0, 0, 0.3, 0, 0.2, 0.15, 0.2]
        label_tool.main(["gt", "add", f, "--ellipsoid", *map(str, e),
                         "--label", "1"])
        label_tool.main(["gt", "list", f])
        assert "label=1" in capsys.readouterr().out
        label_tool.main(["gt", "remove", f, "0"])
        capsys.readouterr()  # drop the remove command's own message
        label_tool.main(["gt", "list", f])
        assert "obj" not in capsys.readouterr().out

        # from-map: seed GT from a saved SLAM map artifact.
        from qsp_slam_tpu.data.io import save_map
        from qsp_slam_tpu.slam.map import empty_map
        from qsp_slam_tpu.slam.objects import empty_objects

        obj = empty_objects(omax=4)
        obj = obj._replace(
            ellipsoid=obj.ellipsoid.at[0].set(jnp.asarray(e)),
            label=obj.label.at[0].set(2),
            valid=obj.valid.at[0].set(True),
        )
        mp = str(tmp_path / "map.npz")
        save_map(mp, empty_map(4, 64, 256), objects=obj)
        label_tool.main(["gt", "from-map", f, "--map", mp])
        label_tool.main(["gt", "list", f])
        out = capsys.readouterr().out
        assert "label=2" in out


class TestVisualizeMap:
    def test_cli_renders_from_saved_map(self, tmp_path, capsys):
        """visualize_map.py role: load map.npz -> PLYs + rendered PNG."""
        import json

        from qsp_slam_tpu import visualize_map
        from qsp_slam_tpu.data.io import save_map
        from qsp_slam_tpu.slam import map as mapmod
        from qsp_slam_tpu.slam.objects import empty_objects

        m = mapmod.empty_map(8, 64, 256)
        m, _ = mapmod.add_keyframe(m, jnp.eye(4))
        m, _ = mapmod.add_points(
            m, jnp.ones((4, 3)), jnp.zeros((4, 256), jnp.int8),
            jnp.zeros(4, jnp.int32), jnp.zeros((4, 3)), jnp.ones(4, bool),
        )
        obj = empty_objects(4)
        e = jnp.array([0.0, 0.0, 3.0, 0, 0, 0, 0.4, 0.4, 0.4], jnp.float32)
        obj = obj._replace(
            ellipsoid=obj.ellipsoid.at[0].set(e),
            valid=obj.valid.at[0].set(True),
        )
        mp = str(tmp_path / "map.npz")
        save_map(mp, m, obj)
        out = visualize_map.main(
            [mp, "--out", str(tmp_path / "viz"), "--views", "0",
             "--wh", "160", "120"]
        )
        assert out["objects"] == 1 and out["keyframes"] == 1
        assert len(out["renders"]) == 1
        import os

        assert os.path.exists(out["renders"][0])
        assert os.path.exists(tmp_path / "viz" / "map_points.ply")
        assert json.loads(capsys.readouterr().out.strip())["objects"] == 1
