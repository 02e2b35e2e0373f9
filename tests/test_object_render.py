"""Offscreen object renderer (viz.object_render) — the ObjectRenderer role.

Analytic checks: a ray-traced sphere must produce the right depth at the
center pixel and no hits outside its silhouette; a sphere-traced toy
decoder must agree with the analytic ellipsoid depth on the same shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core.camera import Intrinsics
from qsp_slam_tpu.models.deepsdf import DeepSDFConfig, train_toy_decoder
from qsp_slam_tpu.viz.object_render import (
    render_ellipsoids,
    render_objects_png,
    render_shape_crop,
)

INTR = Intrinsics(
    jnp.float32(120.0), jnp.float32(120.0), jnp.float32(80.0), jnp.float32(60.0)
)
H, W = 120, 160


class TestEllipsoidRayTrace:
    def test_sphere_depth_and_silhouette(self):
        # Unit-ish sphere 3 m in front of an identity camera.
        e = jnp.array([[0.0, 0.0, 3.0, 0, 0, 0, 0.5, 0.5, 0.5]], jnp.float32)
        depth, rgb = render_ellipsoids(
            e, jnp.array([True]), jnp.array([0]), jnp.eye(4), INTR, H, W
        )
        d = np.asarray(depth)
        # Center pixel: first intersection at z = 3 - 0.5.
        assert abs(d[60, 80] - 2.5) < 1e-2
        # Corner pixel: far outside the silhouette.
        assert np.isinf(d[0, 0])
        # Shaded color is lit and inside [0, 1].
        c = np.asarray(rgb)[60, 80]
        assert (c >= 0).all() and (c <= 1).all() and c.max() > 0.05

    def test_invalid_objects_do_not_render(self):
        e = jnp.array([[0.0, 0.0, 3.0, 0, 0, 0, 0.5, 0.5, 0.5]], jnp.float32)
        depth, _ = render_ellipsoids(
            e, jnp.array([False]), jnp.array([0]), jnp.eye(4), INTR, H, W
        )
        assert np.isinf(np.asarray(depth)).all()

    def test_nearest_object_wins(self):
        e = jnp.array(
            [
                [0.0, 0.0, 3.0, 0, 0, 0, 0.5, 0.5, 0.5],
                [0.0, 0.0, 2.0, 0, 0, 0, 0.3, 0.3, 0.3],
            ],
            jnp.float32,
        )
        depth, _ = render_ellipsoids(
            e, jnp.array([True, True]), jnp.array([0, 1]), jnp.eye(4), INTR, H, W
        )
        assert abs(np.asarray(depth)[60, 80] - 1.7) < 1e-2

    def test_anisotropic_and_offset_camera(self):
        # Ellipsoid viewed from a translated camera: depth at the center of
        # its projection equals distance minus the half-axis along the view.
        e = jnp.array([[1.0, 0.0, 4.0, 0, 0, 0, 0.2, 0.3, 0.4]], jnp.float32)
        Tcw = jnp.eye(4).at[0, 3].set(-1.0)  # camera at x = +1 (world)
        depth, _ = render_ellipsoids(
            e, jnp.array([True]), jnp.array([0]), Tcw, INTR, H, W
        )
        assert abs(np.asarray(depth)[60, 80] - 3.6) < 2e-2


CFG = DeepSDFConfig(code_dim=16, hidden=96, num_layers=6, latent_in=(3,))


@pytest.fixture(scope="module")
def toy_decoder():
    return train_toy_decoder(
        jax.random.PRNGKey(0), CFG, num_shapes=4, steps=500, batch=512
    )


class TestShapeSphereTrace:
    def test_matches_analytic_depth(self, toy_decoder):
        params, codes, halves = toy_decoder
        # Object frame == world up to scale 1/s, centered 3 m ahead.
        s = 2.0  # world -> object scale (object half-extent 0.5 m in world)
        Tow = jnp.eye(4).at[:3, :3].multiply(s).at[2, 3].set(-3.0 * s)
        bbox = jnp.array([40.0, 20.0, 120.0, 100.0])
        uv, depth, rgb = render_shape_crop(
            params, CFG, codes[0], Tow, jnp.eye(4), INTR, bbox, jnp.int32(0),
            res=64, steps=32,
        )
        d = np.asarray(depth)
        uvn = np.asarray(uv)
        # Expected analytic depth at the projection center: 3 - h_z/s.
        hz = float(halves[0][2]) / s
        center = np.argmin(
            (uvn[..., 0] - 80.0) ** 2 + (uvn[..., 1] - 60.0) ** 2
        )
        dc = d.reshape(-1)[center]
        assert np.isfinite(dc)
        assert abs(dc - (3.0 - hz)) < 0.05
        # Far corner of the crop misses.
        assert np.isinf(d[0, 0])

    def test_png_compositing(self, toy_decoder, tmp_path):
        params, codes, halves = toy_decoder
        from qsp_slam_tpu.slam.objects import empty_objects

        tb = empty_objects(4, code_dim=CFG.code_dim)
        e = jnp.array([0.0, 0.0, 3.0, 0, 0, 0, 0.25, 0.25, 0.25], jnp.float32)
        s = 2.0
        Tow = jnp.eye(4).at[:3, :3].multiply(s).at[2, 3].set(-3.0 * s)
        tb = tb._replace(
            ellipsoid=tb.ellipsoid.at[0].set(e),
            valid=tb.valid.at[0].set(True),
            label=tb.label.at[0].set(1),
            code=tb.code.at[0].set(codes[0]),
            Tow_shape=tb.Tow_shape.at[0].set(Tow),
            shape_ok=tb.shape_ok.at[0].set(True),
        )
        out = tmp_path / "objects.png"
        img = render_objects_png(
            str(out), tb, np.eye(4, dtype=np.float32), INTR, H, W,
            gray=np.full((H, W), 128, np.uint8),
            shape_prior=(params, CFG),
        )
        assert out.exists()
        assert img.shape == (H, W, 3) and img.dtype == np.uint8
        # The object region is colored (differs from the uniform background).
        bg = img[0, 0]
        assert (img[55:65, 75:85] != bg).any()
