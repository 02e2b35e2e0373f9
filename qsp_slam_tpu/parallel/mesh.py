"""Shared 1-D device-mesh construction for the parallel BA modules."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_devices: int | None = None, axis: str = "devices") -> Mesh:
    """1-D mesh over the first `num_devices` devices (all if None)."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))
