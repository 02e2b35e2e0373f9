"""Offline object-mesh extraction from a saved map.

Parity: `extract_map_objects.py:36-63` — reload the persisted object codes,
decode each through the DeepSDF decoder, run isosurface extraction, and
write world-frame PLY meshes (offline resume = re-decode from codes).

    python -m qsp_slam_tpu.extract_objects MAP.npz --out DIR
        [--checkpoint decoder.pth] [--resolution 64] [--cpu]

Without --checkpoint a toy decoder is trained on the fly (matching the
shape prior used by the synthetic pipeline).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("map_npz")
    ap.add_argument("--out", default="objects_out")
    ap.add_argument("--checkpoint", default=None, help="torch DeepSDF weights")
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from qsp_slam_tpu.core import lie
    from qsp_slam_tpu.models.deepsdf import (
        DeepSDFConfig,
        load_torch_checkpoint,
        train_toy_decoder,
    )
    from qsp_slam_tpu.models.mesh import extract_mesh_from_code
    from qsp_slam_tpu.viz.export import save_ply_mesh

    with np.load(args.map_npz) as z:
        data = {k: z[k] for k in z.files}
    codes = next(
        (data[k] for k in ("obj_code", "obj_codes", "obj.code") if k in data),
        None,
    )
    if codes is None:
        raise SystemExit("map has no object codes")
    valid = data.get("obj_valid", data.get("obj.valid"))
    shape_ok = data.get(
        "obj_shape_ok", data.get("obj.shape_ok", np.ones(len(codes), bool))
    )
    Tow = data.get(
        "obj_Tow_shape",
        data.get(
            "obj.Tow_shape",
            np.tile(np.eye(4, dtype=np.float32), (len(codes), 1, 1)),
        ),
    )

    code_dim = codes.shape[1]
    if args.checkpoint:
        cfg = DeepSDFConfig(code_dim=code_dim)
        params = load_torch_checkpoint(args.checkpoint, cfg)
    else:
        cfg = DeepSDFConfig(code_dim=code_dim, hidden=96, num_layers=6, latent_in=(3,))
        params, _, _ = train_toy_decoder(
            jax.random.PRNGKey(0), cfg, num_shapes=8, steps=300, batch=512
        )

    os.makedirs(args.out, exist_ok=True)
    count = 0
    for i in np.where(valid & shape_ok)[0]:
        mesh = extract_mesh_from_code(
            params, cfg, jnp.asarray(codes[i]), resolution=args.resolution
        )
        if len(mesh.vertices) == 0:
            continue
        # normalized object frame -> world: inverse of Tow_shape (sim3)
        T_wo = np.asarray(lie.inv_sim3(jnp.asarray(Tow[i])))
        verts_w = mesh.vertices @ T_wo[:3, :3].T + T_wo[:3, 3]
        save_ply_mesh(os.path.join(args.out, f"object_{i}.ply"), verts_w, mesh.faces)
        count += 1
    print(json.dumps({"meshes_written": count, "out": args.out}))
    return count


if __name__ == "__main__":
    main()
