"""Structural perception in the live loop (VERDICT round-1 Missing #3):
Manhattan plane set, relations, supporting-plane selection, and the e2e
improvement they buy on a table-top scene.

Reference parity anchors: `src/Tracking_util.cc:1081-1375`
(`TaskRelationship` / `RefineObjectsWithRelations`),
`src/plane/PlaneExtractorManhattan.h`, `src/symmetry/SymmetrySolver.cpp`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qsp_slam_tpu  # noqa: F401
from qsp_slam_tpu.core import lie, quadric
from qsp_slam_tpu.perception.relations import (
    SUPPORT,
    Relations,
    extract_relations,
    select_support_plane,
    support_planes_for_objects,
)


class TestSelectSupportPlane:
    GROUND = jnp.asarray([0.0, -1.0, 0.0, 2.0])  # camera frame, up = -y

    def _planes(self):
        # plane set: the ground itself + a table top 0.75 above ground + a wall
        table = jnp.asarray([0.0, -1.0, 0.0, 1.25])
        wall = jnp.asarray([1.0, 0.0, 0.0, -3.0])
        planes = jnp.stack([self.GROUND, table, wall])
        return planes, jnp.ones(3, bool)

    def test_object_on_table_selects_table(self):
        planes, pv = self._planes()
        key = jax.random.PRNGKey(0)
        # cluster sitting on the table: heights in [-1.25+eps ...] about y
        pts = jax.random.uniform(
            key, (200, 3), minval=jnp.asarray([-0.2, -1.55, 1.8]),
            maxval=jnp.asarray([0.2, -1.25, 2.2]),
        )
        ok = jnp.ones(200, bool)
        sp = select_support_plane(pts, ok, planes, pv, self.GROUND)
        # chosen plane must be the table: offset 1.25 (up-oriented normal -y)
        np.testing.assert_allclose(np.asarray(sp), [0, -1, 0, 1.25], atol=1e-5)

    def test_object_on_floor_selects_ground(self):
        planes, pv = self._planes()
        key = jax.random.PRNGKey(1)
        pts = jax.random.uniform(
            key, (200, 3), minval=jnp.asarray([-0.2, 1.6, 1.8]),
            maxval=jnp.asarray([0.2, 2.0, 2.2]),
        )
        ok = jnp.ones(200, bool)
        sp = select_support_plane(pts, ok, planes, pv, self.GROUND)
        np.testing.assert_allclose(np.asarray(sp), [0, -1, 0, 2.0], atol=1e-5)

    def test_empty_set_falls_back_to_ground(self):
        planes = jnp.zeros((3, 4))
        pv = jnp.zeros(3, bool)
        pts = jnp.ones((50, 3))
        sp = select_support_plane(pts, jnp.ones(50, bool), planes, pv, self.GROUND)
        np.testing.assert_allclose(np.asarray(sp), [0, -1, 0, 2.0], atol=1e-5)


class TestSupportPlanesForObjects:
    def test_support_relation_routes_plane(self):
        ground = jnp.asarray([0.0, -1.0, 0.0, 2.0])
        table = jnp.asarray([0.0, -1.0, 0.0, 1.25])
        planes = jnp.stack([ground, table])
        pv = jnp.ones(2, bool)
        kind = jnp.asarray([[0, SUPPORT], [SUPPORT, 0]], jnp.int32)
        dist = jnp.asarray([[0.5, 0.01], [0.02, 0.8]])
        rel = Relations(kind=kind, distance=dist)
        sp = support_planes_for_objects(rel, planes, pv, ground)
        np.testing.assert_allclose(np.asarray(sp[0]), [0, -1, 0, 1.25], atol=1e-5)
        np.testing.assert_allclose(np.asarray(sp[1]), [0, -1, 0, 2.0], atol=1e-5)

    def test_no_relation_falls_back(self):
        ground = jnp.asarray([0.0, -1.0, 0.0, 2.0])
        planes = jnp.zeros((2, 4))
        rel = Relations(
            kind=jnp.zeros((1, 2), jnp.int32), distance=jnp.zeros((1, 2))
        )
        sp = support_planes_for_objects(rel, planes, jnp.zeros(2, bool), ground)
        np.testing.assert_allclose(np.asarray(sp[0]), np.asarray(ground))


@pytest.mark.slow
class TestStructuresE2E:
    """Table scene: the supporting-plane pipeline must place the table-top
    object correctly, where the ground-only pipeline stretches it to the
    floor."""

    def _run(self, enable_structures):
        from qsp_slam_tpu.data.render import gt_detections, make_scene, render_scene
        from qsp_slam_tpu.frontend.orb import OrbConfig
        from qsp_slam_tpu.slam.system import SlamSystem
        from qsp_slam_tpu.slam.tracking import TrackingConfig

        cfg = TrackingConfig(orb=OrbConfig(num_features=500))
        scene = make_scene(num_objects=3, seed=2, num_tables=1)
        sysm = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, ba_window=6, omax=8,
            enable_loop_closing=False, enable_structures=enable_structures,
        )
        base = lie.exp_se3(jnp.asarray([0, 0, 0, 0.35, 0, 0], jnp.float32))
        for i in range(24):
            xi = jnp.asarray([0.04 * i, 0, 0, 0, 0, 0], jnp.float32)
            T = np.asarray(lie.exp_se3(xi) @ base, np.float32)
            g, d, _ = render_scene(scene, jnp.asarray(T), cfg.intr)
            det = gt_detections(scene, jnp.asarray(T), cfg.intr)
            sysm.track_rgbd(
                np.asarray(g), np.asarray(d),
                {k: np.asarray(v) for k, v in det.items()},
            )
        return sysm, scene, np.asarray(base)

    def _table_object_error(self, sysm, scene, base):
        """Center error + vertical half-extent of the estimated object
        matched to GT object 0 (the one on the table), in SLAM world."""
        gt_slam = np.asarray(
            quadric.transform_ellipsoid(scene.ellipsoids, jnp.asarray(base)[None])
        )
        valid = np.asarray(sysm.objects.valid)
        est = np.asarray(sysm.objects.ellipsoid)
        assert valid.sum() >= 1
        d = np.linalg.norm(est[valid, :3] - gt_slam[0, :3], axis=1)
        j = d.argmin()
        e = est[valid][j]
        return float(d[j]), float(e[8]), gt_slam[0]

    def test_table_object_improves_with_structures(self):
        sys_on, scene, base = self._run(True)
        sys_off, _, _ = self._run(False)

        err_on, halfz_on, gt0 = self._table_object_error(sys_on, scene, base)
        err_off, halfz_off, _ = self._table_object_error(sys_off, scene, base)
        gt_halfz = float(gt0[8])

        # Structure pipeline found a non-ground horizontal plane (the table).
        votes = np.asarray(sys_on.plane_set.votes)
        pvalid = np.asarray(sys_on.plane_set.valid) & (votes >= 2)
        assert pvalid.sum() >= 2, (pvalid, votes)

        # The table object: correct center and height with structures...
        assert err_on < 0.15, (err_on, err_off)
        assert abs(halfz_on - gt_halfz) < 0.12, (halfz_on, gt_halfz)
        # ...and measurably better than the ground-only pipeline, which
        # stretches the object toward the floor (table height 0.75 m).
        assert err_on < err_off - 0.10, (err_on, err_off)
        assert halfz_off > halfz_on + 0.05, (halfz_off, halfz_on)

    def test_relations_typed_for_live_objects(self):
        sys_on, scene, base = self._run(True)
        assert sys_on.relations is not None
        kinds = np.asarray(sys_on.relations.kind)
        valid = np.asarray(sys_on.objects.valid)
        # every live object should be typed SUPPORT against some plane
        assert ((kinds == SUPPORT).any(axis=1) & valid).sum() >= 1
