"""Learned 3D detector (PointPillars-class, `reconstruct/detector3d.py` seam).

Covers: pillar canvas geometry, box→ellipsoid conversion, training on
procedural scans (recall / localization / rejection), the replay-dict
adapter + params persistence, and the ellipsoid_cam seeding seam into the
SLAM object pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qsp_slam_tpu  # noqa: F401  (matmul precision)
from qsp_slam_tpu.core import lie, quadric
from qsp_slam_tpu.core.camera import Intrinsics
from qsp_slam_tpu.perception.detector3d import (
    Detector3DConfig,
    boxes_to_ellipsoids,
    detect_objects_3d,
    init_detector3d,
    lidar_detections_learned,
    load_detector3d,
    pillar_canvas,
    save_detector3d,
    synth_scan,
    train_detector3d,
)

TEST_CFG = Detector3DConfig(grid=96, channels=24, widths=(24, 32))


@pytest.fixture(scope="module")
def trained():
    params, losses = train_detector3d(jax.random.PRNGKey(0), TEST_CFG, steps=400)
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.5
    return params


class TestPillarCanvas:
    def test_point_lands_in_its_cell(self):
        cfg = TEST_CFG
        params = init_detector3d(jax.random.PRNGKey(1), cfg)
        # One point at a known BEV cell; everything else invalid.
        x = cfg.x_min + 10.5 * cfg.cell
        z = cfg.z_min + 20.5 * cfg.cell
        pts = jnp.asarray([[x, 0.5, z], [0.0, 0.0, 5.0]], jnp.float32)
        canvas = pillar_canvas(params, cfg, pts, jnp.asarray([True, False]))
        occ = np.asarray(jnp.sum(canvas, -1) > 0)
        assert occ[20, 10]  # (iz, ix)
        assert occ.sum() == 1  # the invalid point contributed nothing

    def test_out_of_range_dropped(self):
        cfg = TEST_CFG
        params = init_detector3d(jax.random.PRNGKey(1), cfg)
        pts = jnp.asarray(
            [
                [cfg.x_min - 1.0, 0.0, 5.0],   # left of grid
                [0.0, cfg.y_range[1] + 1.0, 5.0],  # below the vertical gate
                [0.0, 0.0, cfg.z_min + cfg.grid * cfg.cell + 2.0],  # too far
            ],
            jnp.float32,
        )
        canvas = pillar_canvas(params, cfg, pts, jnp.ones(3, bool))
        assert float(jnp.sum(canvas)) == 0.0


class TestBoxesToEllipsoids:
    def test_yaw_is_rotation_about_camera_y(self):
        from qsp_slam_tpu.perception.detector3d import Boxes3D

        theta = 0.7
        b = Boxes3D(
            center=jnp.asarray([[1.0, 0.5, 8.0]]),
            size=jnp.asarray([[4.0, 1.6, 1.8]]),
            yaw=jnp.asarray([theta]),
            label=jnp.zeros(1, jnp.int32),
            prob=jnp.ones(1),
            valid=jnp.ones(1, bool),
        )
        e = boxes_to_ellipsoids(b)[0]
        np.testing.assert_allclose(np.asarray(e[:3]), [1.0, 0.5, 8.0], atol=1e-6)
        # Half-axes reordered to (length, width, height)/2 for the z-up frame.
        np.testing.assert_allclose(np.asarray(e[6:9]), [2.0, 0.9, 0.8], atol=1e-6)
        R = np.asarray(quadric.euler_to_rotmat(e[3:6]))
        # Local x = yawed long axis; local z = up (camera −y): the engine's
        # gravity/support priors require a z-up object frame.
        np.testing.assert_allclose(
            R @ [1, 0, 0], [np.cos(theta), 0, -np.sin(theta)], atol=1e-6
        )
        np.testing.assert_allclose(R @ [0, 0, 1], [0, -1, 0], atol=1e-6)
        assert np.linalg.det(R) > 0.99


@pytest.mark.slow
class TestLearnedDetection:
    def test_recall_and_localization_on_fresh_scans(self, trained):
        cfg = TEST_CFG
        hits, tot, fp = 0, 0, 0
        cerr, serr, yerr = [], [], []
        for s in range(12):
            pts, pv, gt = synth_scan(jax.random.PRNGKey(50_000 + s), cfg)
            det = detect_objects_3d(trained, cfg, pts, pv)
            dv = np.asarray(det.valid)
            dc, ds, dy = (
                np.asarray(det.center)[dv],
                np.asarray(det.size)[dv],
                np.asarray(det.yaw)[dv],
            )
            gc, gs, gy = np.asarray(gt["center"]), np.asarray(gt["size"]), np.asarray(gt["yaw"])
            gv = np.asarray(gt["valid"])
            used = np.zeros(len(dc), bool)
            for b in range(len(gc)):
                if not gv[b]:
                    continue
                tot += 1
                if len(dc) == 0:
                    continue
                d = np.linalg.norm(dc - gc[b], axis=1)
                j = int(np.argmin(d))
                if d[j] < 2.0 and not used[j]:
                    used[j] = True
                    hits += 1
                    cerr.append(d[j])
                    serr.append(np.abs(ds[j] - gs[b]).mean())
                    yerr.append(abs((dy[j] - gy[b] + np.pi / 2) % np.pi - np.pi / 2))
            fp += int((~used).sum())
        assert hits / max(tot, 1) > 0.85, (hits, tot)
        assert fp / 12 < 0.75, fp  # clutter (poles/walls) mostly rejected
        assert np.mean(cerr) < 0.6, np.mean(cerr)
        assert np.mean(serr) < 0.6, np.mean(serr)
        assert np.degrees(np.mean(yerr)) < 20.0, np.degrees(np.mean(yerr))

    def test_empty_scene_yields_nothing(self, trained):
        cfg = TEST_CFG
        # Ground-only scan.
        k = jax.random.PRNGKey(7)
        gx = jax.random.uniform(k, (4096,), minval=cfg.x_min, maxval=cfg.x_min + 30)
        gz = jax.random.uniform(jax.random.fold_in(k, 1), (4096,), minval=0.5,
                                maxval=30.0)
        pts = jnp.stack([gx, jnp.full((4096,), cfg.ground_y), gz], -1)
        det = detect_objects_3d(trained, cfg, pts, jnp.ones(4096, bool))
        assert int(det.valid.sum()) == 0


@pytest.mark.slow
class TestReplayAdapter:
    def test_dict_contract_and_projection(self, trained):
        cfg = TEST_CFG
        intr = Intrinsics(
            jnp.float32(718.0), jnp.float32(718.0),
            jnp.float32(607.0), jnp.float32(185.0),
        )
        pts, pv, gt = synth_scan(jax.random.PRNGKey(123), cfg)
        pts_np = np.asarray(pts)[np.asarray(pv)]
        det = lidar_detections_learned(
            trained, cfg, pts_np, intr, 1241, 376, budget=8192
        )
        for key, shape in [
            ("bbox", (cfg.max_det, 4)), ("label", (cfg.max_det,)),
            ("prob", (cfg.max_det,)), ("valid", (cfg.max_det,)),
            ("ellipsoid_cam", (cfg.max_det, 9)), ("fit_ok", (cfg.max_det,)),
        ]:
            assert det[key].shape == shape, key
        # Every valid detection's 3D center projects inside its 2D bbox
        # (when in front of the camera).
        for d in range(cfg.max_det):
            if not det["valid"][d]:
                continue
            c = det["ellipsoid_cam"][d, :3]
            if c[2] < 1.0:
                continue
            u = 718.0 * c[0] / c[2] + 607.0
            v = 718.0 * c[1] / c[2] + 185.0
            b = det["bbox"][d]
            assert b[0] - 1 <= u <= b[2] + 1, (b, u)
            assert b[1] - 1 <= v <= b[3] + 1, (b, v)

    def test_save_load_round_trip(self, trained, tmp_path):
        cfg = TEST_CFG
        p = str(tmp_path / "d3d.npz")
        save_detector3d(p, trained, cfg)
        params2, cfg2 = load_detector3d(p)
        assert cfg2 == cfg
        pts, pv, _ = synth_scan(jax.random.PRNGKey(3), cfg)
        a = detect_objects_3d(trained, cfg, pts, pv)
        b = detect_objects_3d(params2, cfg2, pts, pv)
        np.testing.assert_array_equal(np.asarray(a.center), np.asarray(b.center))
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


@pytest.mark.slow
class TestEllipsoidSeedingSeam:
    def test_detections_with_ellipsoid_cam_seed_objects_directly(self):
        """Detections carrying `ellipsoid_cam` bypass the geometric fit: the
        object table should reproduce the injected geometry almost exactly
        (the reference's `det->SE3Tco` seeding role)."""
        from qsp_slam_tpu.data.render import (
            gt_detections, make_scene, render_scene,
        )
        from qsp_slam_tpu.data.synthetic import _lookat
        from qsp_slam_tpu.frontend.orb import OrbConfig
        from qsp_slam_tpu.slam.system import SlamSystem
        from qsp_slam_tpu.slam.tracking import TrackingConfig

        cfg = TrackingConfig(orb=OrbConfig(num_features=500))
        scene = make_scene(num_objects=2, seed=4)
        sysm = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, ba_window=4, omax=8,
            enable_loop_closing=False, enable_structures=False,
            enable_symmetry=False,
        )
        c = np.asarray(scene.ellipsoids[:, :3]).mean(0)
        base = _lookat(c + np.array([0.0, -1.2, -3.5]), c)
        for i in range(10):
            xi = jnp.asarray([0.03 * i, 0, 0, 0, 0, 0], jnp.float32)
            T_cw = np.asarray(lie.exp_se3(xi) @ base, np.float32)
            gray, depth, _ = render_scene(scene, jnp.asarray(T_cw), cfg.intr)
            det = {
                k: np.asarray(v)
                for k, v in gt_detections(scene, jnp.asarray(T_cw), cfg.intr).items()
            }
            # Inject exact camera-frame ellipsoids (a perfect 3D detector).
            # Scene GT carries y-vertical boxes; route them through
            # boxes_to_ellipsoids so they arrive in the engine's z-up object
            # frame (as a real detector's output would).
            from qsp_slam_tpu.perception.detector3d import Boxes3D

            gt_e = jnp.asarray(scene.ellipsoids)
            nB = gt_e.shape[0]
            world_boxes = Boxes3D(
                center=gt_e[:, :3],
                size=jnp.stack(
                    [gt_e[:, 6], gt_e[:, 8], gt_e[:, 7]], -1
                ) * 2.0,  # (length, height, width) from y-vertical half-axes
                yaw=gt_e[:, 4],  # scene yaw = Ry(pitch term) about world y
                label=jnp.zeros(nB, jnp.int32),
                prob=jnp.ones(nB),
                valid=jnp.ones(nB, bool),
            )
            e_w_zup = boxes_to_ellipsoids(world_boxes)
            e_cam = quadric.transform_ellipsoid(e_w_zup, jnp.asarray(T_cw))
            D = det["bbox"].shape[0]
            full = np.zeros((D, 9), np.float32)
            full[: e_cam.shape[0]] = np.asarray(e_cam)
            det["ellipsoid_cam"] = full
            det["fit_ok"] = det["valid"].copy()
            sysm.track_rgbd(np.asarray(gray), np.asarray(depth), det)

        valid = np.asarray(sysm.objects.valid)
        assert valid.sum() >= 1
        est_slam = jnp.asarray(np.asarray(sysm.objects.ellipsoid)[valid])
        # SLAM world = first camera frame.
        est = np.asarray(
            quadric.transform_ellipsoid(est_slam, lie.inv_se3(jnp.asarray(base)))
        )
        gt = np.asarray(scene.ellipsoids)
        matched = 0
        for e in est:
            d = np.linalg.norm(gt[:, :3] - e[:3], axis=1)
            j = d.argmin()
            if d[j] < 0.25:
                matched += 1
                np.testing.assert_allclose(
                    np.sort(e[6:9]), np.sort(gt[j, 6:9]), rtol=0.5
                )
        assert matched >= 1
