"""Offline map browser — the `visualize_map.py` equivalent, headless.

Parity: the reference opens a saved map in an Open3D window
(`visualize_map.py`, driven by `scripts/showMap_step1_extract_objects.sh`).
This deployment is headless, so the same capability produces artifacts:

* `map_points.ply`, `object_wireframes.ply`, `trajectory.ply` (MapDrawer
  content, via `viz.export.export_scene`),
* `render_####.png` — the object map RENDERED from chosen keyframe
  cameras with the offscreen renderer (`viz.object_render`): ray-traced
  shaded ellipsoids, plus sphere-traced DeepSDF shapes when the map
  carries codes and a decoder is given (or the toy decoder is used).

    python -m qsp_slam_tpu.visualize_map MAP.npz --out DIR
        [--checkpoint decoder.pth] [--views 0 -1] [--wh 640 480] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("map_npz")
    ap.add_argument("--out", default="map_viz")
    ap.add_argument("--checkpoint", default=None, help="torch DeepSDF weights")
    ap.add_argument(
        "--views", type=int, nargs="*", default=[0, -1],
        help="keyframe indices to render from (negative = from the end)",
    )
    ap.add_argument("--wh", type=int, nargs=2, default=[640, 480])
    ap.add_argument(
        "--intr", type=float, nargs=4, default=[520.9, 521.0, 325.1, 249.7],
        metavar=("FX", "FY", "CX", "CY"),
    )
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from qsp_slam_tpu.core.camera import Intrinsics
    from qsp_slam_tpu.slam.objects import empty_objects
    from qsp_slam_tpu.viz.export import export_scene, save_ply_points
    from qsp_slam_tpu.viz.object_render import render_objects_png

    with np.load(args.map_npz) as z:
        data = {k: z[k] for k in z.files}
    os.makedirs(args.out, exist_ok=True)

    # Rebuild the pieces export_scene/renderer need from the npz.
    class _Map:
        pt_xyz = data["pt_xyz"]
        pt_valid = data["pt_valid"]

    O = len(data["obj_ellipsoid"]) if "obj_ellipsoid" in data else 0
    objects = None
    if O:
        code = data.get("obj_code")
        code_dim = code.shape[1] if code is not None else 16
        objects = empty_objects(O, code_dim=code_dim)
        objects = objects._replace(
            ellipsoid=jnp.asarray(data["obj_ellipsoid"]),
            label=jnp.asarray(data["obj_label"]),
            prob=jnp.asarray(data["obj_prob"]),
            valid=jnp.asarray(data["obj_valid"]),
        )
        if code is not None:
            objects = objects._replace(
                code=jnp.asarray(code),
                Tow_shape=jnp.asarray(data["obj_Tow_shape"]),
                shape_ok=jnp.asarray(data["obj_shape_ok"]),
            )

    num_kfs = int(data.get("num_kfs", 0))
    traj = data["kf_Tcw"][:num_kfs] if num_kfs else None
    export_scene(args.out, _Map, objects, trajectory=traj)

    shape_prior = None
    if objects is not None and bool(np.asarray(objects.shape_ok).any()):
        from qsp_slam_tpu.models.deepsdf import (
            DeepSDFConfig,
            load_torch_checkpoint,
            train_toy_decoder,
        )

        code_dim = objects.code.shape[1]
        if args.checkpoint:
            cfg = DeepSDFConfig(code_dim=code_dim)
            params = load_torch_checkpoint(args.checkpoint, cfg)
        else:
            cfg = DeepSDFConfig(
                code_dim=code_dim, hidden=96, num_layers=6, latent_in=(3,)
            )
            params, _, _ = train_toy_decoder(
                jax.random.PRNGKey(0), cfg, num_shapes=8, steps=300, batch=512
            )
        shape_prior = (params, cfg)

    W, H = args.wh
    intr = Intrinsics(*(jnp.float32(v) for v in args.intr))
    rendered = []
    if objects is not None and num_kfs:
        for v in args.views:
            k = v % num_kfs
            path = os.path.join(args.out, f"render_{k:04d}.png")
            render_objects_png(
                path, objects, data["kf_Tcw"][k], intr, H, W,
                shape_prior=shape_prior,
            )
            rendered.append(path)

    out = {
        "out": args.out,
        "keyframes": num_kfs,
        "points": int(np.asarray(_Map.pt_valid).sum()),
        "objects": int(np.asarray(objects.valid).sum()) if objects is not None else 0,
        "renders": rendered,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
