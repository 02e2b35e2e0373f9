"""Post-rewrite TPU fps check: extraction compute (two-point), fused
dispatch, and the end-to-end bench fps (uint8/uint16 inputs)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import qsp_slam_tpu  # noqa: F401
    from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
    from qsp_slam_tpu.frontend.orb import OrbConfig, extract_features
    from qsp_slam_tpu.slam.tracking import TrackingConfig

    print("backend:", jax.devices())
    cfg = TrackingConfig(orb=OrbConfig(num_features=1000))
    oc = cfg.orb
    room = make_room()
    traj = orbit_trajectory(4)
    g, _ = render_frame(room, jnp.asarray(traj[0]), cfg.intr)
    img = jnp.asarray(np.asarray(g))
    jax.block_until_ready(img)

    # Two-point extraction compute, consuming EVERY output (descriptors too).
    def ext_step(im):
        f = extract_features(im, oc)
        return (jnp.sum(f.xy) * 1e-20 + jnp.sum(f.angle) * 1e-20
                + jnp.sum(f.desc_pm.astype(jnp.float32)) * 1e-20)

    def loop(n):
        def f(im):
            def body(i, acc):
                return acc + ext_step(im + acc * 1e-12)
            return lax.fori_loop(0, n, body, jnp.float32(0))
        return jax.jit(f)

    f1, f8 = loop(1), loop(8)
    jax.block_until_ready(f1(img)); jax.block_until_ready(f8(img))

    def med(fn, reps=5):
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            jax.block_until_ready(fn(img))
            ts.append((time.perf_counter() - t) * 1e3)
        return float(np.median(ts))

    t1, t8 = med(f1), med(f8)
    print("extract_compute_ms (full, incl desc):", round((t8 - t1) / 7.0, 2))
    print("extract_single_dispatch_ms:", round(t1, 1))

    # End-to-end fps via the bench path.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import measure_fps

    fps = measure_fps()
    print("fps_synthetic:", round(fps, 2))


if __name__ == "__main__":
    main()
