"""Prove-or-retire symmetry completion (VERDICT r03 weak #4 / item 8).

Scenario designed for symmetry's purpose (`src/symmetry/SymmetrySolver.cpp`,
`EllipsoidExtraction.Symmetry.Open`): the camera sees each object from ONE
side only (a lateral sweep, no orbit), so depth clouds are front-only and an
ellipsoid fit without completion underestimates the unseen-depth axis.

Runs the identical system twice (enable_symmetry off/on, structures on in
both) with GT detections, and reports object-map IoU / center error.

Run: PALLAS_AXON_POOL_IPS= python experiments/symmetry_ablation.py [--cpu]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    import qsp_slam_tpu  # noqa: F401
    from qsp_slam_tpu.core import lie, quadric
    from qsp_slam_tpu.data.render import gt_detections, make_scene, render_scene
    from qsp_slam_tpu.data.synthetic import _lookat
    from qsp_slam_tpu.eval.objects import evaluate_objects
    from qsp_slam_tpu.frontend.orb import OrbConfig
    from qsp_slam_tpu.slam.system import SlamSystem
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    cfg = TrackingConfig(orb=OrbConfig(num_features=1000))
    scene = make_scene(num_objects=3, seed=2)

    # Single-side viewing: sweep laterally at z = -4.5, always facing the
    # room center — every object cloud is front-only.
    num_frames = 50
    traj = []
    for i in range(num_frames):
        x = -1.0 + 2.0 * i / (num_frames - 1)
        traj.append(_lookat(np.array([x, -0.35, -4.5]), np.zeros(3)))
    traj = np.stack(traj).astype(np.float32)

    def run(enable_symmetry):
        sysm = SlamSystem(
            cfg, enable_structures=True, enable_symmetry=enable_symmetry,
            enable_loop_closing=False,
        )
        for i in range(num_frames):
            gray, depth, inst = render_scene(scene, jnp.asarray(traj[i]), cfg.intr)
            det = gt_detections(scene, jnp.asarray(traj[i]), cfg.intr, instance=inst)
            sysm.track_rgbd(
                np.asarray(gray), np.asarray(depth),
                {k: np.asarray(v) for k, v in det.items()},
            )
        valid = np.asarray(sysm.objects.valid) & (
            np.asarray(sysm.objects.obs_count) >= 2
        )
        if not valid.any():
            return {"detected": 0}
        est_e = np.asarray(
            quadric.transform_ellipsoid(
                jnp.asarray(np.asarray(sysm.objects.ellipsoid)[valid]),
                lie.inv_se3(jnp.asarray(traj[0])),
            )
        )
        res = evaluate_objects(
            est_e, np.asarray(sysm.objects.label)[valid],
            np.asarray(scene.ellipsoids), np.asarray(scene.labels),
        )
        return {
            "detected": int(valid.sum()),
            "precision": round(res.precision, 3),
            "recall": round(res.recall, 3),
            "mean_iou": round(res.mean_iou, 3),
            "center_err_m": round(res.mean_center_err, 4),
        }

    out = {"symmetry_off": run(False), "symmetry_on": run(True)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
