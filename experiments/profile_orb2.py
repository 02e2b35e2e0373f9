"""Two-point (loop-in-jit) compute split of ORB extraction on the TPU.

Measures device-only time of three nested aggregates by iterating each 8x
inside ONE jit (RTT cancels): pyramid only; pyramid+detect (all levels);
full extract.  Differences attribute compute to resize / FAST+top-k /
orientation+blur+descriptors.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def two_point(f1, f8, reps=5):
    import jax

    jax.block_until_ready(f1())
    jax.block_until_ready(f8())

    def med(f):
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            jax.block_until_ready(f())
            ts.append((time.perf_counter() - t) * 1e3)
        return float(np.median(ts))

    t1, t8 = med(f1), med(f8)
    return (t8 - t1) / 7.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import qsp_slam_tpu  # noqa: F401
    from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
    from qsp_slam_tpu.frontend.fast import detect_keypoints
    from qsp_slam_tpu.frontend.orb import OrbConfig, extract_features, _per_level_budget
    from qsp_slam_tpu.frontend.pyramid import build_pyramid
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    print("backend:", jax.devices())
    cfg = TrackingConfig(orb=OrbConfig(num_features=1000))
    oc = cfg.orb
    room = make_room()
    traj = orbit_trajectory(4)
    g, _ = render_frame(room, jnp.asarray(traj[0]), cfg.intr)
    img = jnp.asarray(np.asarray(g))
    jax.block_until_ready(img)

    def loopify(step):
        def run_n(n):
            def f(im):
                def body(i, acc):
                    return acc + step(im + acc * 1e-12)
                return lax.fori_loop(0, n, body, jnp.float32(0))
            return jax.jit(f)
        return run_n(1), run_n(8)

    # (a) pyramid only
    def pyr_step(im):
        pyr = build_pyramid(im, oc.pyramid)
        return sum(jnp.sum(p[::16, ::16]) for p in pyr) * 1e-20

    f1, f8 = loopify(pyr_step)
    t_pyr = two_point(lambda: f1(img), lambda: f8(img))
    print("pyramid_compute_ms:", round(t_pyr, 2))

    # (b) pyramid + detect on all levels (both thresholds, as extract does)
    budgets = _per_level_budget(oc)

    def det_step(im):
        pyr = build_pyramid(im, oc.pyramid)
        acc = jnp.float32(0)
        for lv, (p, b) in enumerate(zip(pyr, budgets)):
            if b <= 0:
                continue
            kp = detect_keypoints(p, oc.fast_threshold, b, oc.cell, oc.cell_cap)
            kp2 = detect_keypoints(p, oc.fast_threshold_min, b, oc.cell, oc.cell_cap)
            acc = acc + jnp.sum(kp.xy) * 1e-20 + jnp.sum(kp2.xy) * 1e-20
        return acc

    f1, f8 = loopify(det_step)
    t_det = two_point(lambda: f1(img), lambda: f8(img))
    print("pyramid+detect_compute_ms:", round(t_det, 2))

    # (c) full extraction
    def ext_step(im):
        f = extract_features(im, oc)
        return jnp.sum(f.xy) * 1e-20 + jnp.sum(f.response) * 1e-20

    f1, f8 = loopify(ext_step)
    t_ext = two_point(lambda: f1(img), lambda: f8(img))
    print("extract_compute_ms:", round(t_ext, 2))
    print("-> resize:", round(t_pyr, 1),
          "| FAST+topk:", round(t_det - t_pyr, 1),
          "| ori+blur+desc:", round(t_ext - t_det, 1))


if __name__ == "__main__":
    main()
