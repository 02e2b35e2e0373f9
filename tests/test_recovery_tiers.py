"""Recovery-tier tests (VERDICT r04 item 5).

Parity anchors:
  * `Tracking::TrackReferenceKeyFrame` (`src/Tracking.cc:881-989`) — the
    middle recovery tier between a failed motion-model track and full
    relocalization: a single bad velocity prediction must recover in one
    cheap dispatch, WITHOUT burning a top-k relocalization pass.
  * The sensor-uniform `Track()` state machine (`src/Tracking.cc:414-627`) —
    the monocular path shares the consistency gate / reset / localization-
    only spine with RGB-D.
"""

import jax.numpy as jnp
import numpy as np

from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig

CFG = TrackingConfig(orb=OrbConfig(num_features=500))


def test_ref_kf_fallback_recovers_without_full_reloc():
    """Kick the motion model hard: the windowed search fails, the reference-
    keyframe tier recovers the pose, and FULL relocalization never runs."""
    room = make_room()
    traj = orbit_trajectory(30)
    sysm = SlamSystem(CFG, kmax=16, nmax=4096, emax=32768, enable_objects=False)
    for i in range(12):
        gray, depth = render_frame(room, jnp.asarray(traj[i]), CFG.intr)
        sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
    assert sysm.stats["keyframes"] >= 2

    # Motion-model-breaking kick: 2 m sideways prediction error.
    kick = np.eye(4, dtype=np.float32)
    kick[0, 3] = 2.0
    sysm.velocity = kick
    gray, depth = render_frame(room, jnp.asarray(traj[12]), CFG.intr)
    T = sysm.track_rgbd(np.asarray(gray), np.asarray(depth))

    assert sysm.stats.get("ref_kf_recoveries", 0) >= 1
    assert sysm.stats.get("relocalizations", 0) == 0
    err = np.linalg.norm(np.asarray(T)[:3, 3] - traj[12][:3, 3])
    assert err < 0.08, err
    # And tracking continues normally afterwards.
    for i in range(13, 16):
        gray, depth = render_frame(room, jnp.asarray(traj[i]), CFG.intr)
        T = sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
    err = np.linalg.norm(np.asarray(T)[:3, 3] - traj[15][:3, 3])
    assert err < 0.08, err


def test_mono_poisoned_bootstrap_auto_resets():
    """Monocular sibling of the RGB-D poisoned-bootstrap test: break
    tracking right after the two-view bootstrap; the early-map reset must
    fire and the system must re-bootstrap from live frames."""
    cfg = TrackingConfig(orb=OrbConfig(num_features=600))
    room = make_room()
    traj = orbit_trajectory(40, step=0.025)
    rng = np.random.default_rng(0)
    sysm = SlamSystem(cfg, kmax=16, nmax=4096, emax=32768,
                      enable_objects=False)
    # Live frames until the bootstrap completes.
    i = 0
    while not sysm.initialized and i < 15:
        gray, _ = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
        sysm.track_mono(np.asarray(gray))
        i += 1
    assert sysm.initialized
    # Garbage frames (pure noise): tracking must fail and, with <=5
    # keyframes, auto-reset rather than coast forever.
    for _ in range(4):
        noise = rng.uniform(0, 255, (cfg.height, cfg.width)).astype(np.float32)
        sysm.track_mono(noise)
    assert sysm.stats.get("resets", 0) >= 1
    assert not sysm.initialized
    # Live frames again: the mono bootstrap re-seeds and re-initializes.
    for j in range(i, 40):
        gray, _ = render_frame(room, jnp.asarray(traj[j]), cfg.intr)
        sysm.track_mono(np.asarray(gray))
    assert sysm.initialized
    assert sysm.stats["keyframes"] >= 2


def test_mono_localization_only_freezes_map():
    """Mono localization-only: the frozen map neither grows keyframes nor
    points while tracking continues against it."""
    cfg = TrackingConfig(orb=OrbConfig(num_features=600))
    room = make_room()
    traj = orbit_trajectory(40, step=0.025)
    sysm = SlamSystem(cfg, kmax=16, nmax=4096, emax=32768,
                      enable_objects=False)
    for i in range(25):
        gray, _ = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
        sysm.track_mono(np.asarray(gray))
    assert sysm.initialized
    kfs = sysm.stats["keyframes"]
    pts = int(sysm.map_state.num_pts)

    sysm.set_localization_mode(True)
    ok = 0
    for i in range(25):
        gray, _ = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
        sysm.track_mono(np.asarray(gray))
        ok += int(sysm.stats["track_ok"][-1])
    assert sysm.stats["keyframes"] == kfs
    assert int(sysm.map_state.num_pts) == pts
    assert sysm.stats.get("resets", 0) == 0
    assert ok >= 15  # localization actually tracks the frozen map


def test_feature_points_from_matches_scatter():
    """Mono snapshot seam: tracked map points scatter onto the feature
    table (camera frame), invalid matches drop, out-of-range drops."""
    import jax.numpy as jnp
    from qsp_slam_tpu.slam.loop_closing import feature_points_from_matches

    pt_xyz = jnp.asarray([[0.0, 0.0, 2.0], [1.0, 0.0, 3.0], [0.0, 1.0, 4.0]])
    match_pt = jnp.asarray([1, -1, 5], jnp.int32)  # pt0->feat1, pt2->feat5(oob)
    match_inlier = jnp.asarray([True, False, True])
    Tcw = jnp.eye(4).at[0, 3].set(0.5)
    pts, ok = feature_points_from_matches(pt_xyz, match_pt, match_inlier, Tcw, 4)
    assert pts.shape == (4, 3) and ok.shape == (4,)
    assert bool(ok[1]) and int(ok.sum()) == 1  # only the in-range inlier
    np.testing.assert_allclose(np.asarray(pts[1]), [0.5, 0.0, 2.0], atol=1e-6)
