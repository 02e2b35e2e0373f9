"""Mid-run checkpoint / resume for the whole SLAM session.

The reference has NO mid-run checkpointing (SURVEY.md §5 — only end-of-run
txt dumps); this module is the restartable-step-loop upgrade the TPU design
calls for: because all engine state is value-typed pytrees, a checkpoint is
a single npz and resume is exact.

Covers the FULL session, not just the map: sensor mode, telemetry stats,
loop-closure count + consistency-gate history, structural-plane set and
object relations, the monocular bootstrap reference frame, and the grown
capacities (host-side `grow_map` doubling) — restoring adopts the
checkpoint's capacities so `_ensure_capacity` bookkeeping stays coherent.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp


def _flatten(prefix: str, nt) -> dict:
    out = {}
    for name, val in nt._asdict().items():
        if hasattr(val, "_asdict"):
            out.update(_flatten(f"{prefix}{name}.", val))
        else:
            out[f"{prefix}{name}"] = np.asarray(val)
    return out


def _rebuild(cls, prefix: str, data: dict):
    from ..frontend.orb import Features
    from .place_recognition import PlaceDatabase

    nested = {
        ("LoopState", "db"): PlaceDatabase,
        ("FrameData", "feats"): Features,
    }
    kwargs = {}
    for name in cls._fields:
        key = f"{prefix}{name}"
        if key in data:
            kwargs[name] = jnp.asarray(data[key])
        else:
            sub_cls = nested[(cls.__name__, name)]
            kwargs[name] = _rebuild(sub_cls, f"{prefix}{name}.", data)
    return cls(**kwargs)


def _migrate_loop_state(data: dict) -> None:
    """In-place migrations for checkpoints written by older builds.

    * `loop.kf_octave` (added for octave-scaled Sim3 chi2 gating) — absent
      rows default to octave 0, the strictest gate.
    * Place-signature format changes (the 512-dim tf-idf store became a
      multi-table LSH histogram): the snapshot descriptors are still in the
      checkpoint, so the database is REBUILT by re-running `bow_signature`
      over them instead of crashing on the first add/query shape mismatch.
    """
    if "loop.kf_desc" not in data:
        return
    if "loop.kf_octave" not in data:
        data["loop.kf_octave"] = np.zeros(
            data["loop.kf_feat_ok"].shape, np.int8
        )
    from .place_recognition import SIG_DIM, bow_signature, quantize_signature

    sig = data["loop.db.signatures"]
    if sig.shape[1] != SIG_DIM or sig.dtype != np.uint8 or (
        "loop.db.df" not in data
    ):
        import jax

        sigs = np.asarray(
            jax.vmap(lambda d, ok: quantize_signature(bow_signature(d, ok)))(
                jnp.asarray(data["loop.kf_desc"]),
                jnp.asarray(data["loop.kf_feat_ok"]),
            )
        )
        sigs[int(data["loop.db.count"]):] = 0
        data["loop.db.signatures"] = sigs
        data["loop.db.df"] = (sigs > 0).sum(0).astype(np.float32)


def save_checkpoint(path: str, system) -> None:
    """Persist a SlamSystem's full session state to one npz."""
    data = {}
    data.update(_flatten("map.", system.map_state))
    data.update(_flatten("obj.", system.objects))
    data.update(_flatten("loop.", system.loop_state))
    data.update(_flatten("plane.", system.plane_set))
    if system.relations is not None:
        data.update(_flatten("rel.", system.relations))
    data["Tcw"] = system.Tcw
    data["velocity"] = system.velocity
    data["initialized"] = np.asarray(system.initialized)
    data["frames_since_kf"] = np.asarray(system.frames_since_kf)
    data["inliers_at_last_kf"] = np.asarray(system.inliers_at_last_kf)
    data["sensor"] = np.asarray(system._sensor)
    data["loops_closed"] = np.asarray(system.loops_closed)
    data["stats_json"] = np.asarray(json.dumps(system.stats))
    data["trajectory"] = (
        np.stack(system.trajectory) if system.trajectory else np.zeros((0, 4, 4))
    )
    if system.ground_plane is not None:
        data["ground_plane"] = system.ground_plane
    data["gp_count"] = np.asarray(system._gp_count)
    data["kf_fresh"] = np.asarray(getattr(system, "_kf_fresh", False))
    # Monocular bootstrap state (two-view reference frame + its age).
    mono_ref = getattr(system, "_mono_ref", None)
    if mono_ref is not None:
        data.update(_flatten("monoref.", mono_ref))
        data["mono_ref_age"] = np.asarray(system._mono_ref_age)
    # Loop-consistency gate streak (host-side list-of-lists).
    gate = getattr(system, "_loop_gate", None)
    if gate is not None:
        data["loop_gate_json"] = np.asarray(json.dumps(
            {"required": gate.required, "neighborhood": gate.neighborhood,
             "history": gate.history}))
    np.savez_compressed(path, **data)


def load_checkpoint(path: str, system) -> None:
    """Restore session state into an already-constructed SlamSystem.

    Capacities (kmax/nmax/emax/omax) are adopted FROM the checkpoint — a
    run that grew its stores resumes with the grown stores, regardless of
    the constructor defaults of the receiving system.
    """
    from ..perception.manhattan import PlaneSet
    from ..perception.relations import Relations
    from .loop_closing import ConsistencyGate, LoopState
    from .map import MapState
    from .objects import ObjectTable
    from .tracking import FrameData

    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    _migrate_loop_state(data)
    system.map_state = _rebuild(MapState, "map.", data)
    system.objects = _rebuild(ObjectTable, "obj.", data)
    system.loop_state = _rebuild(LoopState, "loop.", data)
    system.plane_set = _rebuild(PlaneSet, "plane.", data)
    system.relations = (
        _rebuild(Relations, "rel.", data) if "rel.kind" in data else None
    )
    system.kmax, system.nmax, system.emax = system.map_state.capacity
    system.omax = int(system.objects.valid.shape[0])
    system.Tcw = data["Tcw"]
    system.velocity = data["velocity"]
    system.initialized = bool(data["initialized"])
    system.frames_since_kf = int(data["frames_since_kf"])
    system.inliers_at_last_kf = int(data["inliers_at_last_kf"])
    system._sensor = str(data["sensor"]) if "sensor" in data else "rgbd"
    system.loops_closed = int(data.get("loops_closed", 0))
    if "stats_json" in data:
        system.stats = json.loads(str(data["stats_json"]))
        # JSON turns the (tag, value) capacity-event tuples into lists.
        ev = system.stats.get("capacity_events")
        if ev is not None:
            system.stats["capacity_events"] = [tuple(e) for e in ev]
    system.trajectory = list(data["trajectory"])
    system.ground_plane = data.get("ground_plane")
    system._gp_count = int(data.get("gp_count", 0))
    system._kf_fresh = bool(data.get("kf_fresh", False))
    if "monoref.depth" in data:
        system._mono_ref = _rebuild(FrameData, "monoref.", data)
        system._mono_ref_age = int(data["mono_ref_age"])
    else:
        system._mono_ref = None
        system._mono_ref_age = 0
    if "loop_gate_json" in data:
        g = json.loads(str(data["loop_gate_json"]))
        gate = ConsistencyGate(g["required"], g["neighborhood"])
        gate.history = [list(map(int, h)) for h in g["history"]]
        system._loop_gate = gate
