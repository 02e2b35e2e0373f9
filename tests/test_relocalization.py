"""Multi-candidate relocalization (VERDICT r04 item 7).

Parity: `Tracking::Relocalization` (`src/Tracking.cc:1589`) loops over ALL
BoW candidates from `DetectRelocalizationCandidates`
(`src/KeyFrameDatabase.cc:199`) running PnP per candidate until one succeeds.
The TPU shape vmaps match+PnP over the top-k in one dispatch; these tests pin
the key behavior — a decoy top-1 (same appearance, wrong geometry) must not
sink recovery.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qsp_slam_tpu.core import lie
from qsp_slam_tpu.core.camera import backproject
from qsp_slam_tpu.data.render import make_room, orbit_trajectory, render_frame
from qsp_slam_tpu.frontend.orb import OrbConfig
from qsp_slam_tpu.slam.loop_closing import empty_loop_state, snapshot_keyframe
from qsp_slam_tpu.slam.relocalization import relocalize
from qsp_slam_tpu.slam.tracking import TrackingConfig, process_frame


def _snap(ls, frame, cfg, scramble_points=False, seed=0):
    pts_cam = backproject(frame.feats.xy, frame.depth, cfg.intr)
    if scramble_points:
        # Same appearance, WRONG geometry: permute the 3D points so every
        # descriptor points at someone else's depth — PnP cannot succeed.
        rng = np.random.default_rng(seed)
        perm = rng.permutation(pts_cam.shape[0])
        pts_cam = jnp.asarray(np.asarray(pts_cam)[perm])
    return snapshot_keyframe(
        ls, frame.feats.desc_pm, frame.feats.valid,
        pts_cam, frame.depth > 0.0, frame.feats.xy,
    )


def test_decoy_top1_recovers_via_candidate_2():
    """KF0 = decoy with the QUERY's own descriptors (BoW top-1 by
    construction) but scrambled 3D points; KF1 = the true place.  Reloc must
    reject the decoy on inliers and accept the true candidate."""
    cfg = TrackingConfig(orb=OrbConfig(num_features=500))
    room = make_room()
    traj = orbit_trajectory(30)

    T_true = jnp.asarray(traj[3])
    gray, depth = render_frame(room, T_true, cfg.intr)
    query_frame = process_frame(gray, depth, cfg)

    ls = empty_loop_state(kmax=8, snap=384)
    # KF0: decoy — identical descriptors (max BoW score), permuted points.
    ls = _snap(ls, query_frame, cfg, scramble_points=True)
    # KF1: true place — a nearby view with consistent geometry.
    T_kf = jnp.asarray(traj[4])
    gray2, depth2 = render_frame(room, T_kf, cfg.intr)
    kf_frame = process_frame(gray2, depth2, cfg)
    ls = _snap(ls, kf_frame, cfg)

    kf_Tcw = jnp.tile(jnp.eye(4, dtype=jnp.float32), (8, 1, 1))
    kf_Tcw = kf_Tcw.at[0].set(jnp.asarray(traj[20], jnp.float32))  # decoy pose
    kf_Tcw = kf_Tcw.at[1].set(T_kf)

    # Sanity: the decoy really is the top-scoring candidate.
    from qsp_slam_tpu.slam.place_recognition import bow_signature, query_topk

    sig = bow_signature(query_frame.feats.desc_pm, query_frame.feats.valid)
    cands, scores = query_topk(ls.db, sig, k=4, exclude_recent=0)
    assert int(cands[0]) == 0 and int(cands[1]) == 1, np.asarray(cands)

    res = relocalize(ls, kf_Tcw, query_frame, cfg, jax.random.PRNGKey(5))
    assert bool(res.ok), "multi-candidate reloc failed outright"
    err = np.linalg.norm(np.asarray(res.Tcw)[:3, 3] - np.asarray(T_true)[:3, 3])
    assert err < 0.1, err

    # Contrast: restricted to the top-1 candidate only (the round-3
    # behavior), the decoy sinks relocalization.
    res1 = relocalize(ls, kf_Tcw, query_frame, cfg, jax.random.PRNGKey(5), k=1)
    assert not bool(res1.ok)


def test_reloc_still_works_plain():
    """No decoy: top-1 is correct and multi-candidate reloc matches it."""
    cfg = TrackingConfig(orb=OrbConfig(num_features=500))
    room = make_room()
    traj = orbit_trajectory(30)
    ls = empty_loop_state(kmax=8, snap=384)
    for i in (0, 6, 12):
        gray, depth = render_frame(room, jnp.asarray(traj[i]), cfg.intr)
        ls = _snap(ls, process_frame(gray, depth, cfg), cfg)
    kf_Tcw = jnp.tile(jnp.eye(4, dtype=jnp.float32), (8, 1, 1))
    for slot, i in enumerate((0, 6, 12)):
        kf_Tcw = kf_Tcw.at[slot].set(jnp.asarray(traj[i], jnp.float32))

    T_true = jnp.asarray(traj[7])
    gray, depth = render_frame(room, T_true, cfg.intr)
    frame = process_frame(gray, depth, cfg)
    res = relocalize(ls, kf_Tcw, frame, cfg, jax.random.PRNGKey(1))
    assert bool(res.ok)
    err = np.linalg.norm(np.asarray(res.Tcw)[:3, 3] - np.asarray(T_true)[:3, 3])
    assert err < 0.1, err
