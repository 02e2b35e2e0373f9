"""Mid-run checkpoint / resume for the whole SLAM state.

The reference has NO mid-run checkpointing (SURVEY.md §5 — only end-of-run
txt dumps); this module is the restartable-step-loop upgrade the TPU design
calls for: because all state is value-typed pytrees, a checkpoint is a
single npz and resume is exact.
"""

from __future__ import annotations

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
    from .place_recognition import PlaceDatabase

    nested = {("LoopState", "db"): PlaceDatabase}
    kwargs = {}
    for name in cls._fields:
        key = f"{prefix}{name}"
        if key in data:
            kwargs[name] = jnp.asarray(data[key])
        else:
            sub_cls = nested[(cls.__name__, name)]
            kwargs[name] = _rebuild(sub_cls, f"{prefix}{name}.", data)
    return cls(**kwargs)


def save_checkpoint(path: str, system) -> None:
    """Persist a SlamSystem's full state (map, objects, loop db, pose)."""
    data = {}
    data.update(_flatten("map.", system.map_state))
    data.update(_flatten("obj.", system.objects))
    data.update(_flatten("loop.", system.loop_state))
    data["Tcw"] = system.Tcw
    data["velocity"] = system.velocity
    data["initialized"] = np.asarray(system.initialized)
    data["frames_since_kf"] = np.asarray(system.frames_since_kf)
    data["inliers_at_last_kf"] = np.asarray(system.inliers_at_last_kf)
    data["trajectory"] = (
        np.stack(system.trajectory) if system.trajectory else np.zeros((0, 4, 4))
    )
    if system.ground_plane is not None:
        data["ground_plane"] = system.ground_plane
    np.savez_compressed(path, **data)


def load_checkpoint(path: str, system) -> None:
    """Restore state into an already-constructed SlamSystem (same capacities)."""
    from .loop_closing import LoopState
    from .map import MapState
    from .objects import ObjectTable

    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    system.map_state = _rebuild(MapState, "map.", data)
    system.objects = _rebuild(ObjectTable, "obj.", data)
    system.loop_state = _rebuild(LoopState, "loop.", data)
    system.Tcw = data["Tcw"]
    system.velocity = data["velocity"]
    system.initialized = bool(data["initialized"])
    system.frames_since_kf = int(data["frames_since_kf"])
    system.inliers_at_last_kf = int(data["inliers_at_last_kf"])
    system.trajectory = list(data["trajectory"])
    if "ground_plane" in data:
        system.ground_plane = data["ground_plane"]
