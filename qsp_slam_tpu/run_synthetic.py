"""End-to-end synthetic RGB-D SLAM run (BASELINE config-1 analogue).

Renders a textured-room sequence with known ground truth, runs the full
tracking + mapping loop, and prints a JSON summary with ATE RMSE and stage
timings.  Usage:

    python -m qsp_slam_tpu.run_synthetic [num_frames] [--cpu]
"""

from __future__ import annotations

import json
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv.remove("--cpu")
    with_objects = "--objects" in argv
    if with_objects:
        argv.remove("--objects")
    with_detector = "--detector" in argv
    if with_detector:
        argv.remove("--detector")
        with_objects = True
    num_frames = int(argv[0]) if argv else 120

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qsp_slam_tpu.core import lie, quadric
    from qsp_slam_tpu.data.render import (
        gt_detections,
        make_room,
        make_scene,
        orbit_trajectory,
        render_frame,
        render_scene,
    )
    from qsp_slam_tpu.eval.ate import ate_rmse
    from qsp_slam_tpu.frontend.orb import OrbConfig
    from qsp_slam_tpu.slam.system import SlamSystem
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    cfg = TrackingConfig(orb=OrbConfig(num_features=1000))
    Tcw_gt = orbit_trajectory(num_frames)

    if with_objects:
        # Full pipeline: objects resting on the floor + GT detections + a
        # toy DeepSDF prior trained on the fly (config-2/3 analogue).
        from qsp_slam_tpu.models.deepsdf import DeepSDFConfig, train_toy_decoder

        dec_cfg = DeepSDFConfig(code_dim=16, hidden=96, num_layers=6, latent_in=(3,))
        params, _, _ = train_toy_decoder(
            jax.random.PRNGKey(0), dec_cfg, num_shapes=8, steps=300, batch=512
        )
        scene = make_scene(num_objects=3, seed=2)
        pitch = lie.exp_se3(jnp.asarray([0, 0, 0, 0.44, 0, 0], jnp.float32))
        Tcw_gt = np.asarray(
            jnp.einsum("fij,jk->fik", jnp.asarray(Tcw_gt), pitch), np.float32
        )
        detector = None
        if with_detector:
            # detect_online mode: train the on-mesh detector on renderer GT
            # and let it supply detections (no replay seam).
            from qsp_slam_tpu.perception.detector2d import (
                DetectorConfig,
                train_detector,
            )

            dcfg = DetectorConfig()
            # 3000 steps x 8 scenes with the full-weight size loss measured
            # recall 0.82 / matched-bbox IoU 0.81 on held-out views (vs
            # 0.73 / 0.69 at 1500x6 with the old 0.1 size weight).
            dparams, _ = train_detector(
                jax.random.PRNGKey(7), dcfg, steps=3000, scenes=8, lr=2e-3
            )
            detector = (dparams, dcfg)
        sysm = SlamSystem(cfg, shape_prior=(params, dec_cfg), detector=detector)
        for i in range(num_frames):
            gray, depth, _inst = render_scene(scene, jnp.asarray(Tcw_gt[i]), cfg.intr)
            if with_detector:
                sysm.track_rgbd(np.asarray(gray), np.asarray(depth), None)
                continue
            det = gt_detections(
                scene, jnp.asarray(Tcw_gt[i]), cfg.intr, instance=_inst
            )
            sysm.track_rgbd(
                np.asarray(gray), np.asarray(depth),
                {k: np.asarray(v) for k, v in det.items()},
            )
    else:
        room = make_room()
        sysm = SlamSystem(cfg)
        for i in range(num_frames):
            gray, depth = render_frame(room, Tcw_gt[i], cfg.intr)
            sysm.track_rgbd(gray, depth)

    est = np.stack(sysm.trajectory)
    out = sysm.summary()
    out["num_frames"] = num_frames
    out["ate_rmse_m"] = ate_rmse(est, Tcw_gt[: len(est)])
    from qsp_slam_tpu.eval.ate import rpe

    out.update(rpe(est, Tcw_gt[: len(est)]))
    out["backend"] = jax.default_backend()
    if with_objects:
        import jax.numpy as jnp

        valid = np.asarray(sysm.objects.valid) & (
            np.asarray(sysm.objects.obs_count) >= 2
        )
        if valid.any():
            from qsp_slam_tpu.eval.objects import evaluate_objects

            # SLAM world = first camera frame.
            est_e = np.asarray(
                quadric.transform_ellipsoid(
                    jnp.asarray(np.asarray(sysm.objects.ellipsoid)[valid]),
                    lie.inv_se3(jnp.asarray(Tcw_gt[0])),
                )
            )
            res = evaluate_objects(
                est_e, np.asarray(sysm.objects.label)[valid],
                np.asarray(scene.ellipsoids), np.asarray(scene.labels),
            )
            out["obj_precision"] = round(res.precision, 3)
            out["obj_recall"] = round(res.recall, 3)
            out["obj_mean_iou"] = round(res.mean_iou, 3)
            out["obj_center_err_m"] = round(res.mean_center_err, 4)
        out["shapes_reconstructed"] = int(
            (np.asarray(sysm.objects.shape_ok) & valid).sum()
        )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
