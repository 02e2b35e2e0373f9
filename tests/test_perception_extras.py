"""Tests for Manhattan planes, relations, symmetry completion, dense builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie, plane as plane_mod
from qsp_slam_tpu.data.render import make_scene, render_scene
from qsp_slam_tpu.perception.dense_builder import DenseBuilder
from qsp_slam_tpu.perception.groundplane import depth_to_cloud, estimate_ground_plane
from qsp_slam_tpu.perception.manhattan import (
    dominant_planes,
    empty_plane_set,
    extract_manhattan_planes,
    update_plane_set,
)
from qsp_slam_tpu.perception.relations import LEAN_ON, NONE, SUPPORT, extract_relations
from qsp_slam_tpu.perception.symmetry import estimate_symmetry
from qsp_slam_tpu.slam.tracking import TrackingConfig


@pytest.fixture(scope="module")
def room_frame():
    cfg = TrackingConfig()
    scene = make_scene(num_objects=2, seed=3)
    T_cw = lie.exp_se3(jnp.asarray([0, 0, 0, 0.35, 0.3, 0], jnp.float32))
    gray, depth, inst = render_scene(scene, T_cw, cfg.intr)
    return cfg, scene, T_cw, depth


class TestManhattan:
    def test_finds_walls_and_floor(self, room_frame):
        cfg, scene, T_cw, depth = room_frame
        gp = estimate_ground_plane(depth, cfg.intr, jax.random.PRNGKey(0))
        assert bool(gp.ok)
        pts, valid = depth_to_cloud(depth, cfg.intr, stride=8)
        planes, oks = extract_manhattan_planes(
            pts, valid, gp.plane, jax.random.PRNGKey(1)
        )
        assert bool(oks.any())
        # Every accepted plane is ⊥ or ∥ to the ground normal.
        up = np.asarray(gp.plane[:3])
        for r in np.where(np.asarray(oks))[0]:
            n = np.asarray(planes[r][:3])
            a = abs(float(np.dot(n, up)))
            assert a > 0.85 or a < 0.15, a

    def test_vote_accumulation(self):
        ps = empty_plane_set(4)
        pi = jnp.asarray([0.0, 0.0, -1.0, 4.0])
        for _ in range(3):
            ps = update_plane_set(ps, pi[None], jnp.asarray([True]))
        assert int(ps.votes[0]) == 3
        assert len(dominant_planes(ps, min_votes=3)) == 1
        # A different plane claims a new slot.
        pi2 = jnp.asarray([1.0, 0.0, 0.0, 2.0])
        ps = update_plane_set(ps, pi2[None], jnp.asarray([True]))
        assert bool(ps.valid[1])


class TestRelations:
    def test_support_and_lean(self):
        up = jnp.asarray([0.0, -1.0, 0.0])  # y down; up = -y
        # Object resting on floor y = 2 (normal -y): center y = 2 - halfz...
        # Build in a frame where the object's z-axis is up: roll=pi/2 about x
        # rotates z->-y. Use euler (roll=+pi/2, 0, 0): R z = (0,-1,0) = up.
        e_support = jnp.asarray([0.0, 1.7, 3.0, jnp.pi / 2, 0, 0, 0.2, 0.2, 0.3])
        floor = jnp.asarray([0.0, -1.0, 0.0, 2.0])  # -y + 2 = 0 -> y = 2
        wall = jnp.asarray([1.0, 0.0, 0.0, 0.25])  # x = -0.25 vertical plane
        e_lean = jnp.asarray([0.0, 1.0, 3.0, jnp.pi / 2, 0, 0, 0.25, 0.25, 0.4])
        ells = jnp.stack([e_support, e_lean])
        planes = jnp.stack([floor, wall])
        rel = extract_relations(
            ells, jnp.ones(2, bool), planes, jnp.ones(2, bool), up
        )
        kind = np.asarray(rel.kind)
        assert kind[0, 0] == SUPPORT  # bottom at y = 1.7+0.3 = 2.0
        assert kind[1, 1] == LEAN_ON  # |center.x - (-0.25)| = 0.25 = radius
        assert kind[0, 1] in (NONE, LEAN_ON)  # not supported by the wall


class TestSymmetry:
    def test_half_ellipsoid_completion(self, rng):
        # Front half of an ellipsoid (z < center) — symmetric about its
        # vertical mid-plane x = 0 when up = y.
        d = rng.normal(size=(400, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        surf = d * [0.3, 0.2, 0.25] + [0.0, 0.0, 2.0]
        front = surf[surf[:, 2] < 2.0]
        pts = jnp.asarray(front, jnp.float32)
        res = estimate_symmetry(
            pts, jnp.ones(len(front), bool), jnp.asarray([0.0, 1.0, 0.0])
        )
        assert bool(res.ok), float(res.score)
        # Plane direction: roughly the x = 0 mid-plane (sparse sampling makes
        # the chamfer objective tolerant to small tilts).
        n = np.abs(np.asarray(res.plane[:3]))
        assert n[0] > 0.9, n
        assert res.completed.shape[0] == 2 * len(front)
        # The contract that matters: mirrored points still lie ON the
        # ellipsoid surface (completion is geometrically consistent).
        comp = np.asarray(res.completed)[len(front):]
        lvl = np.linalg.norm((comp - [0, 0, 2.0]) / [0.3, 0.2, 0.25], axis=1)
        assert np.median(np.abs(lvl - 1.0)) < 0.15, np.median(np.abs(lvl - 1))


class TestDenseBuilder:
    def test_accumulates_and_saves(self, room_frame, tmp_path):
        cfg, scene, T_cw, depth = room_frame
        from qsp_slam_tpu.data.render import render_scene

        b = DenseBuilder(cfg.intr, voxel=0.1)
        gray, depth, _ = render_scene(scene, T_cw, cfg.intr)
        b.process_frame(np.asarray(gray), np.asarray(depth), np.asarray(T_cw))
        n1 = b.num_points
        assert n1 > 500
        # Same frame again: voxel dedup keeps the count stable.
        b.process_frame(np.asarray(gray), np.asarray(depth), np.asarray(T_cw))
        assert b.num_points == n1
        p = tmp_path / "map.ply"
        b.save_ply(str(p))
        assert p.exists() and p.stat().st_size > 1000
