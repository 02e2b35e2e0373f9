"""Localization-only mode + the reset protocol (VERDICT r04 item 6).

Parity: `System::ActivateLocalizationMode` (`include/System.h:115`,
`mbOnlyTracking` `src/Tracking.cc:414,1045`) and the early-map reset
(`src/Tracking.cc:592-601`, `System::Reset` `src/Tracking.cc:1752`).
"""

import jax.numpy as jnp
import numpy as np

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.system import SlamSystem
from qsp_slam_tpu.slam.tracking import TrackingConfig


CFG = TrackingConfig(orb=OrbConfig(num_features=500))


def test_localization_only_freezes_map():
    """Build a map, freeze it, localize a second pass against it: poses stay
    accurate while keyframes/points/objects never change."""
    room = make_room()
    traj = orbit_trajectory(30)
    sysm = SlamSystem(CFG, kmax=16, nmax=4096, emax=32768, enable_objects=False)
    for i in range(20):
        gray, depth = render_frame(room, jnp.asarray(traj[i]), CFG.intr)
        sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
    kfs = sysm.stats["keyframes"]
    pts = int(sysm.map_state.num_pts)
    db = int(sysm.loop_state.db.count)
    assert kfs >= 3

    sysm.set_localization_mode(True)
    errs = []
    for i in range(20):
        gray, depth = render_frame(room, jnp.asarray(traj[i]), CFG.intr)
        T = sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
        errs.append(np.linalg.norm(T[:3, 3] - traj[i][:3, 3]))
    # Map frozen: nothing grew.
    assert sysm.stats["keyframes"] == kfs
    assert int(sysm.map_state.num_pts) == pts
    assert int(sysm.loop_state.db.count) == db
    assert sysm.stats.get("resets", 0) == 0
    # Steady localization (skip the first frame: the motion model restarts).
    assert float(np.median(errs[1:])) < 0.05, errs

    # Deactivation restores mapping.
    sysm.set_localization_mode(False)
    for i in range(20, 26):
        gray, depth = render_frame(room, jnp.asarray(traj[i]), CFG.intr)
        sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
    assert sysm.stats["keyframes"] >= kfs


def test_poisoned_bootstrap_auto_resets():
    """Initialize on a garbage frame (noise texture, valid depth): tracking
    against it must fail, the early-map reset must fire, and the system must
    re-bootstrap from live frames and track accurately afterwards."""
    rng = np.random.default_rng(7)
    room = make_room()
    traj = orbit_trajectory(30)
    sysm = SlamSystem(CFG, kmax=16, nmax=4096, emax=32768, enable_objects=False)

    # Poisoned first frame: random texture, plausible depth.
    noise_gray = rng.integers(0, 255, (CFG.height, CFG.width)).astype(np.float32)
    noise_depth = rng.uniform(1.0, 4.0, (CFG.height, CFG.width)).astype(np.float32)
    sysm.track_rgbd(noise_gray, noise_depth)
    assert sysm.initialized

    for i in range(12):
        gray, depth = render_frame(room, jnp.asarray(traj[i]), CFG.intr)
        sysm.track_rgbd(np.asarray(gray), np.asarray(depth))
    assert sysm.stats.get("resets", 0) >= 1, "auto-reset never fired"
    assert sysm.initialized, "post-reset bootstrap failed"

    # Post-reset tracking is metric: relative motion between consecutive
    # frames matches GT (the post-reset world frame differs by the reset
    # frame's pose, so compare relative transforms).
    T_prev = None
    rel_errs = []
    for i in range(12, 18):
        gray, depth = render_frame(room, jnp.asarray(traj[i]), CFG.intr)
        T = sysm.track_rgbd(np.asarray(gray), np.asarray(depth)).copy()
        if T_prev is not None:
            rel_est = T @ np.linalg.inv(T_prev)
            rel_gt = traj[i] @ np.linalg.inv(traj[i - 1])
            rel_errs.append(np.abs(rel_est - rel_gt).max())
        T_prev = T
    assert float(np.median(rel_errs)) < 0.02, rel_errs
