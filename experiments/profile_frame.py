"""Where do the per-frame milliseconds go on the tunneled TPU?

Measures, on the real chip (default backend):
  upload        h2d of one gray+depth pair (block_until_ready)
  process       process_frame dispatch+block
  track         track_frame dispatch+block
  fused         process_and_track dispatch+block
  fused+get     fused then device_get of the host-policy scalars
  chunk4        4 frames processed+tracked inside ONE jit (lax.scan),
                per-frame amortized — the micro-batched tracking candidate
  track_rgbd    the current SlamSystem end-to-end per-frame wall time

Run: timeout 1200 python experiments/profile_frame.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_ms(fn, reps=7):
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t) * 1e3)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    import qsp_slam_tpu  # noqa: F401  (sets matmul precision)
    from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
    from qsp_slam_tpu.frontend.orb import OrbConfig
    from qsp_slam_tpu.slam.system import SlamSystem
    from qsp_slam_tpu.slam.tracking import (
        TrackingConfig, process_and_track, process_frame, track_frame,
    )

    print("backend:", jax.devices())
    cfg = TrackingConfig(orb=OrbConfig(num_features=1000))
    room = make_room()
    traj = orbit_trajectory(24)
    frames = []
    for i in range(8):
        g, d = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
        frames.append((np.asarray(g), np.asarray(d)))
    g0, d0 = frames[0]

    # --- upload
    def upload():
        jax.block_until_ready((jnp.asarray(g0), jnp.asarray(d0)))

    print("upload_ms:", round(median_ms(upload), 1))

    # --- build a map via the normal system so track_frame has targets
    sysm = SlamSystem(cfg, enable_objects=False)
    for g, d in frames[:4]:
        sysm.track_rgbd(g, d)
    m = sysm.map_state
    Tp = jnp.asarray(sysm.Tcw)

    ga, da = jnp.asarray(g0), jnp.asarray(d0)
    jax.block_until_ready((ga, da))

    fr = process_frame(ga, da, cfg)
    jax.block_until_ready(fr)
    print("process_ms:", round(median_ms(
        lambda: jax.block_until_ready(process_frame(ga, da, cfg))), 1))

    res = track_frame(m, Tp, fr, cfg)
    jax.block_until_ready(res)
    print("track_ms:", round(median_ms(
        lambda: jax.block_until_ready(track_frame(m, Tp, fr, cfg))), 1))

    out = process_and_track(ga, da, m, Tp, cfg)
    jax.block_until_ready(out)
    print("fused_ms:", round(median_ms(
        lambda: jax.block_until_ready(process_and_track(ga, da, m, Tp, cfg))), 1))

    def fused_get():
        f, r = process_and_track(ga, da, m, Tp, cfg)
        jax.device_get((r.Tcw, r.num_inliers, r.pred_dev_t, r.pred_dev_r,
                        r.tracked_close, r.untracked_close))

    fused_get()
    print("fused_get_ms:", round(median_ms(fused_get), 1))

    # --- dispatch pipelining: enqueue fused for frame k+1 BEFORE the get of
    # frame k (does the tunnel overlap execute with the result fetch?)
    gb, db = jnp.asarray(frames[1][0]), jnp.asarray(frames[1][1])
    jax.block_until_ready((gb, db))

    def pipelined2():
        f1, r1 = process_and_track(ga, da, m, Tp, cfg)
        f2, r2 = process_and_track(gb, db, m, Tp, cfg)
        jax.device_get((r1.Tcw, r1.num_inliers))
        jax.device_get((r2.Tcw, r2.num_inliers))

    pipelined2()
    print("pipelined2_per_frame_ms:", round(median_ms(pipelined2) / 2, 1))

    # --- chunk4: scan over 4 stacked frames in ONE jit
    from functools import partial

    @partial(jax.jit, static_argnames=("cfg",))
    def chunk4(grays, depths, m, Tcw, vel, cfg):
        def body(carry, gd):
            Tcw, vel = carry
            g, d = gd
            fr = process_frame(g, d, cfg)
            pred = vel @ Tcw
            r = track_frame(m, pred, fr, cfg)
            ok = (r.num_inliers >= cfg.min_track_inliers) & (r.pred_dev_t < 0.5)
            Tnew = jnp.where(ok, r.Tcw, pred)
            vel_new = jnp.where(ok, Tnew @ jnp.linalg.inv(Tcw), vel)
            return (Tnew, vel_new), (Tnew, r.num_inliers)
        (Tl, vl), outs = jax.lax.scan(body, (Tcw, vel), (grays, depths))
        return Tl, vl, outs

    G = jnp.stack([jnp.asarray(f[0]) for f in frames[:4]])
    D = jnp.stack([jnp.asarray(f[1]) for f in frames[:4]])
    vel = jnp.eye(4)
    o = chunk4(G, D, m, Tp, vel, cfg)
    jax.block_until_ready(o)

    def chunk_run():
        o = chunk4(G, D, m, Tp, vel, cfg)
        jax.device_get((o[0], o[2][1]))

    print("chunk4_per_frame_ms:", round(median_ms(chunk_run) / 4, 1))

    # --- current end-to-end
    sys2 = SlamSystem(cfg, enable_objects=False)
    per = []
    for i in range(20):
        g, d = frames[i % 8]
        t = time.perf_counter()
        sys2.track_rgbd(g, d)
        per.append((time.perf_counter() - t) * 1e3)
    print("track_rgbd_ms (median last 10):", round(float(np.median(per[-10:])), 1))
    print("fps:", round(1000.0 / float(np.median(per[-10:])), 2))


if __name__ == "__main__":
    main()
