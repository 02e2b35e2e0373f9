"""Two-level configuration: per-sequence YAML + model-side JSON.

Parity: the reference's config system (SURVEY.md §5) — an OpenCV-YAML
sequence file (`configs/tum_fr1_desk.yaml`) validated against
`configs/standard_param.yaml` (`Config::CheckParams`, `src/System.cc:81`),
cross-referencing a JSON (`DetectorConfigPath`) that carries DeepSDF/GN
hyperparameters.  Here: plain YAML/JSON into typed configs with unknown-key
warnings and runtime override support (`Config::SetValue` equivalent).
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Any

from ..frontend.orb import OrbConfig
from ..frontend.pyramid import PyramidConfig
from ..models.shape_opt import ShapeOptConfig
from .tracking import TrackingConfig

# YAML key -> TrackingConfig field (reference key names kept where they exist)
_YAML_KEYS = {
    "Camera.fx": "fx",
    "Camera.fy": "fy",
    "Camera.cx": "cx",
    "Camera.cy": "cy",
    "Camera.width": "width",
    "Camera.height": "height",
    "Camera.bf": None,  # handled: bf = baseline * fx
    "Camera.k1": None,  # handled: dist_coef = (k1, k2, p1, p2, k3)
    "Camera.k2": None,
    "Camera.p1": None,
    "Camera.p2": None,
    "Camera.k3": None,
    "ThDepth": None,
    "DepthMapFactor": None,
    "ORBextractor.nFeatures": ("orb", "num_features"),
    "ORBextractor.scaleFactor": ("orb", "pyramid", "scale_factor"),
    "ORBextractor.nLevels": ("orb", "pyramid", "num_levels"),
    "ORBextractor.iniThFAST": ("orb", "fast_threshold"),
    "ORBextractor.minThFAST": ("orb", "fast_threshold_min"),
}


def load_yaml(path: str) -> dict:
    import yaml

    with open(path) as f:
        text = f.read()
    # Tolerate the OpenCV "%YAML:1.0" header used by reference configs.
    if text.startswith("%YAML"):
        text = "\n".join(text.splitlines()[1:])
    return yaml.safe_load(text) or {}


def tracking_config_from_yaml(path: str, **overrides: Any) -> TrackingConfig:
    """Build a TrackingConfig from a sequence YAML (+ runtime overrides)."""
    raw = load_yaml(path)
    flat: dict[str, Any] = {}
    pyramid: dict[str, Any] = {}
    orb: dict[str, Any] = {}
    known = set(_YAML_KEYS)
    for key, val in raw.items():
        if key not in known:
            if "." in key:  # unknown dotted keys get the CheckParams warning
                warnings.warn(f"config: unknown key {key!r} ignored")
            continue
        target = _YAML_KEYS[key]
        if target is None:
            continue
        if isinstance(target, tuple):
            if target[:2] == ("orb", "pyramid"):
                pyramid[target[2]] = val
            elif target[0] == "orb":
                orb[target[1]] = val
        else:
            flat[target] = val
    if "Camera.bf" in raw and "Camera.fx" in raw:
        flat["baseline"] = float(raw["Camera.bf"]) / float(raw["Camera.fx"])
    if any(f"Camera.{k}" in raw for k in ("k1", "k2", "p1", "p2", "k3")):
        # DistCoef (`mDistCoef` layout): lens distortion, undistorted at
        # feature extraction (`Frame::UndistortKeyPoints`, `src/Frame.cc:89`).
        flat["dist_coef"] = tuple(
            float(raw.get(f"Camera.{k}", 0.0)) for k in ("k1", "k2", "p1", "p2", "k3")
        )
    if "Camera.width" in raw:
        flat["width"] = int(raw["Camera.width"])
    if "Camera.height" in raw:
        flat["height"] = int(raw["Camera.height"])
    if pyramid:
        if "num_levels" in pyramid:
            pyramid["num_levels"] = int(pyramid["num_levels"])
        base = PyramidConfig(
            height=int(flat.get("height", 480)), width=int(flat.get("width", 640))
        )
        orb["pyramid"] = base._replace(**pyramid)
    if orb:
        if "num_features" in orb:
            orb["num_features"] = int(orb["num_features"])
        flat["orb"] = OrbConfig()._replace(**orb)
    flat.update(overrides)
    return TrackingConfig()._replace(**flat)


def shape_config_from_json(path: str) -> ShapeOptConfig:
    """Model-side JSON (the reference's `configs/config_*.json` GN block)."""
    with open(path) as f:
        raw = json.load(f)
    opt = raw.get("optimizer", raw)
    mapping = {
        "iters": ("num_iterations", int),
        "w_sdf": ("k1", float),
        "w_render": ("k2", float),
        "w_rot": ("k3", float),
        "w_code": ("k4", float),
        "w_scale": ("scale_damping", float),
        "huber_sdf": ("b1", float),
        "huber_render": ("b2", float),
    }
    kwargs = {}
    for field, (key, conv) in mapping.items():
        if key in opt:
            kwargs[field] = conv(opt[key])
    return ShapeOptConfig()._replace(**kwargs)
