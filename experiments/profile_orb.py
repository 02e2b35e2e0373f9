"""Per-stage ORB extraction timings on the real TPU.

Stages: pyramid, FAST score+NMS, detect (top-k), orientation, descriptors,
full extract_features.  Each stage is jitted standalone and timed with
device-resident inputs (two runs: compile, then medians).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med_ms(fn, reps=7):
    import jax

    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t) * 1e3)
    return round(float(np.median(ts)), 2)


def main():
    import jax
    import jax.numpy as jnp

    import qsp_slam_tpu  # noqa: F401
    from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
    from qsp_slam_tpu.frontend.fast import detect_keypoints
    from qsp_slam_tpu.frontend.orb import (
        OrbConfig, compute_descriptors, compute_orientation, extract_features,
    )
    from qsp_slam_tpu.frontend.pyramid import build_pyramid, gaussian_blur
    from qsp_slam_tpu.ops.fast_pallas import fast_score_nms_auto
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    print("backend:", jax.devices())
    cfg = TrackingConfig(orb=OrbConfig(num_features=1000))
    room = make_room()
    traj = orbit_trajectory(4)
    g, _ = render_frame(room, jnp.asarray(traj[0]), cfg.intr)
    img = jnp.asarray(np.asarray(g))
    jax.block_until_ready(img)

    oc = cfg.orb
    f_pyr = jax.jit(lambda im: build_pyramid(im, oc.pyramid))
    print("pyramid_ms:", med_ms(lambda: f_pyr(img)))

    f_score = jax.jit(lambda im: fast_score_nms_auto(im, oc.fast_threshold))
    print("fast_score_nms_ms (L0):", med_ms(lambda: f_score(img)))

    f_det = jax.jit(
        lambda im: detect_keypoints(im, oc.fast_threshold, 217, oc.cell, oc.cell_cap)
    )
    print("detect_ms (L0, top-k incl):", med_ms(lambda: f_det(img)))

    kp = f_det(img)
    xy = jax.block_until_ready(kp.xy)

    f_ori = jax.jit(compute_orientation)
    print("orientation_ms (217 kp):", med_ms(lambda: f_ori(img, xy)))

    f_blur = jax.jit(gaussian_blur)
    blur = jax.block_until_ready(f_blur(img))
    print("blur_ms (L0):", med_ms(lambda: f_blur(img)))

    ang = jax.block_until_ready(f_ori(img, xy))
    f_desc = jax.jit(compute_descriptors)
    print("descriptors_ms (217 kp):", med_ms(lambda: f_desc(blur, xy, ang)))

    f_all = jax.jit(lambda im: extract_features(im, oc))
    print("extract_total_ms:", med_ms(lambda: f_all(img)))


if __name__ == "__main__":
    main()
