"""Native marching-tetrahedra mesh extraction tests."""

from collections import Counter

import numpy as np
import pytest

from qsp_slam_tpu.models.mesh import marching_cubes


def sphere_grid(n=48, r=0.6):
    lin = np.linspace(-1, 1, n)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    return (np.sqrt(xx**2 + yy**2 + zz**2) - r).astype(np.float32)


class TestMarchingTetrahedra:
    def test_sphere_accuracy(self):
        n = 48
        m = marching_cubes(sphere_grid(n))
        assert len(m.vertices) > 1000
        v = m.vertices * (2.0 / (n - 1)) - 1.0
        r = np.linalg.norm(v, axis=1)
        assert abs(r.mean() - 0.6) < 0.005
        assert r.std() < 0.005

    def test_watertight(self):
        m = marching_cubes(sphere_grid(32))
        edges = Counter()
        for t in m.faces:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edges[(min(a, b), max(a, b))] += 1
        counts = np.array(list(edges.values()))
        assert (counts == 2).all()  # closed 2-manifold

    def test_empty_grid(self):
        sdf = np.full((16, 16, 16), 1.0, np.float32)
        m = marching_cubes(sdf)
        assert len(m.vertices) == 0 and len(m.faces) == 0

    def test_consistent_winding(self):
        # All triangle normals of a sphere should point outward (positive
        # dot with the vertex position relative to center).
        n = 32
        m = marching_cubes(sphere_grid(n))
        v = m.vertices * (2.0 / (n - 1)) - 1.0
        tri = v[m.faces]
        normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centers = tri.mean(axis=1)
        dots = np.einsum("ij,ij->i", normals, centers)
        frac_out = (dots > 0).mean()
        assert frac_out > 0.99 or frac_out < 0.01  # consistent orientation
