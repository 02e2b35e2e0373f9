"""Masked shape-input gathering: instance masks separate surface points from
free-space rays (parity: `reconstruct/mono_sequence.py:141-154` fg/bg ray
separation; `src/LocalMapping_util.cc:585-672` mask-gated surface samples).
"""

import jax
import jax.numpy as jnp
import numpy as np

from qsp_slam_tpu.data.render import gt_detections, make_scene, render_scene
from qsp_slam_tpu.slam.objects import empty_objects
from qsp_slam_tpu.slam.shape_mapping import gather_shape_inputs
from qsp_slam_tpu.slam.tracking import TrackingConfig


def _setup():
    cfg = TrackingConfig()
    scene = make_scene(num_objects=1, seed=4)
    # Look at the object from 2.2 m away along its -z.
    c = np.asarray(scene.ellipsoids[0, :3])
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = -(c + np.array([0, 0, -2.2], np.float32))
    T_cw = jnp.asarray(T)
    gray, depth, inst = render_scene(scene, T_cw, cfg.intr)
    det = gt_detections(scene, T_cw, cfg.intr, instance=inst)
    assert bool(det["valid"][0]), "object must be visible for this test"
    return cfg, scene, T_cw, depth, inst, det


def _table_for(scene):
    table = empty_objects(omax=4)
    return table._replace(
        ellipsoid=table.ellipsoid.at[0].set(scene.ellipsoids[0]),
        valid=table.valid.at[0].set(True),
        obs_count=table.obs_count.at[0].set(2),
        num_objects=jnp.int32(1),
    )


class TestMaskedGather:
    def test_masks_exclude_clutter_from_surface_keep_rays(self):
        cfg, scene, T_cw, depth, inst, det = _setup()
        table = _table_for(scene)
        b = np.asarray(det["bbox"][0]).astype(int)
        mask0 = np.asarray(det["mask"][0])

        # Inject clutter INSIDE the bbox but OFF the instance mask, at the
        # object's own depth (so the geometric radius gate cannot reject it).
        zc = float(np.median(np.asarray(depth)[mask0]))
        clutter = np.zeros_like(mask0)
        x0 = max(b[0], 0)
        clutter[b[1] : b[3] + 1, x0 : x0 + 6] = ~mask0[b[1] : b[3] + 1, x0 : x0 + 6]
        d_clut = jnp.asarray(np.where(clutter, zc, np.asarray(depth)))

        ground = jnp.asarray([0.0, -1.0, 0.0, 10.0])  # far plane: no ground cut
        key = jax.random.PRNGKey(7)
        kw = dict(num_samples=512, recon_every=2, min_obs=2)

        unmasked = gather_shape_inputs(
            table, T_cw, d_clut, ground, cfg.intr, key, **kw
        )
        masked = gather_shape_inputs(
            table, T_cw, d_clut, ground, cfg.intr, key,
            det_masks=jnp.asarray(det["mask"]),
            det_assoc=jnp.asarray([0], jnp.int32),
            **kw,
        )
        assert bool(masked.due[0]) and bool(unmasked.due[0])

        # Recover sampled pixel coords from the camera rays: u = fx*rx + cx.
        # Same key -> both calls sampled the same pixels.
        def sampled_px(inp):
            r = np.asarray(inp.rays[0])
            u = np.round(r[:, 0] * float(cfg.intr.fx) + float(cfg.intr.cx))
            v = np.round(r[:, 1] * float(cfg.intr.fy) + float(cfg.intr.cy))
            return u.astype(int), v.astype(int)

        u, v = sampled_px(unmasked)
        on_clutter = clutter[np.clip(v, 0, clutter.shape[0] - 1),
                             np.clip(u, 0, clutter.shape[1] - 1)]
        um_ok = np.asarray(unmasked.pts_ok[0])
        m_ok = np.asarray(masked.pts_ok[0])
        m_rays = np.asarray(masked.rays_ok[0])

        # Unmasked: clutter leaks into the surface term.
        assert (um_ok & on_clutter).sum() > 0
        # Masked: zero clutter surface points...
        assert (m_ok & on_clutter).sum() == 0
        # ...but the clutter rays survive as free-space evidence,
        assert (m_rays & on_clutter).sum() > 0
        # and genuine surface points remain.
        assert m_ok.sum() >= 32

    def test_clean_depth_masked_subset_of_geometric(self):
        cfg, scene, T_cw, depth, inst, det = _setup()
        table = _table_for(scene)
        ground = jnp.asarray([0.0, -1.0, 0.0, 10.0])
        key = jax.random.PRNGKey(3)
        kw = dict(num_samples=256, recon_every=2, min_obs=2)
        unmasked = gather_shape_inputs(
            table, T_cw, depth, ground, cfg.intr, key, **kw
        )
        masked = gather_shape_inputs(
            table, T_cw, depth, ground, cfg.intr, key,
            det_masks=jnp.asarray(det["mask"]),
            det_assoc=jnp.asarray([0], jnp.int32),
            **kw,
        )
        um = np.asarray(unmasked.pts_ok[0])
        m = np.asarray(masked.pts_ok[0])
        # Masked surface set is a subset of the geometric one (same samples),
        # and on clean depth it keeps most of it.
        assert not np.any(m & ~um)
        assert m.sum() >= 0.5 * um.sum()
