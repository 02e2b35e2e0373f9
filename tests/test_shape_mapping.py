"""Shape reconstruction inside the SLAM loop (config-3 analogue: per-object
DeepSDF latent optimization on a rendered sequence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsp_slam_tpu.core import lie, quadric
from qsp_slam_tpu.data.render import gt_detections, make_scene, render_scene
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.models.deepsdf import DeepSDFConfig, decode_sdf, train_toy_decoder
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig

CFG_DEC = DeepSDFConfig(code_dim=16, hidden=96, num_layers=6, latent_in=(3,))


@pytest.mark.slow
class TestShapeInLoop:
    def test_objects_get_reconstructed(self):
        params, codes, halves = train_toy_decoder(
            jax.random.PRNGKey(0), CFG_DEC, num_shapes=8, steps=400, batch=512
        )
        cfg = TrackingConfig(orb=OrbConfig(num_features=500))
        scene = make_scene(num_objects=3, seed=2)
        sysm = SlamSystem(
            cfg, kmax=16, nmax=2048, emax=16384, ba_window=6, omax=8,
            shape_prior=(params, CFG_DEC), enable_loop_closing=False,
        )
        base = lie.exp_se3(jnp.asarray([0, 0, 0, 0.44, 0, 0], jnp.float32))
        for i in range(20):
            xi = jnp.asarray([0.04 * i, 0, 0, 0, 0, 0], jnp.float32)
            T_cw = np.asarray(lie.exp_se3(xi) @ base, np.float32)
            gray, depth, inst = render_scene(scene, jnp.asarray(T_cw), cfg.intr)
            det = gt_detections(scene, jnp.asarray(T_cw), cfg.intr)
            sysm.track_rgbd(
                np.asarray(gray), np.asarray(depth),
                {k: np.asarray(v) for k, v in det.items()},
            )
        shape_ok = np.asarray(sysm.objects.shape_ok)
        valid = np.asarray(sysm.objects.valid)
        assert (shape_ok & valid).sum() >= 1, (shape_ok, valid)

        # Quality: for each reconstructed object, GT surface points mapped
        # through Tow_shape should lie near the decoded zero level set.
        # (SLAM world = first camera frame = base-transformed render world.)
        for o in np.where(shape_ok & valid)[0]:
            # match to nearest GT object (in SLAM world)
            e_slam = np.asarray(sysm.objects.ellipsoid[o])
            gt_slam = np.asarray(
                quadric.transform_ellipsoid(scene.ellipsoids, base[None])
            )
            j = np.linalg.norm(gt_slam[:, :3] - e_slam[:3], axis=1).argmin()
            # sample GT surface in SLAM world
            rng = np.random.default_rng(o)
            d = rng.normal(size=(200, 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            T_sim = np.asarray(quadric.similarity_transform(jnp.asarray(gt_slam[j])))
            pts_w = d @ T_sim[:3, :3].T + T_sim[:3, 3]
            p_obj = lie.transform_points(
                jnp.asarray(sysm.objects.Tow_shape[o]), jnp.asarray(pts_w, jnp.float32)[None]
            )[0]
            sdf = decode_sdf(params, CFG_DEC, sysm.objects.code[o], p_obj)
            med = float(jnp.median(jnp.abs(sdf)))
            assert med < 0.12, (o, j, med)
