"""Image pyramid construction (parity: `ORBextractor::ComputePyramid`,
`src/ORBextractor.cc:1120` — 8 levels, scale factor 1.2).

Static-shape design: level shapes are computed at trace time from the config;
each level is a separately-shaped array in a list pytree (XLA compiles one
fused program; no dynamic shapes).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PyramidConfig(NamedTuple):
    num_levels: int = 8
    scale_factor: float = 1.2
    height: int = 480
    width: int = 640

    @property
    def scales(self) -> list[float]:
        return [self.scale_factor**i for i in range(self.num_levels)]

    def level_shape(self, level: int) -> tuple[int, int]:
        s = self.scale_factor**level
        return (int(round(self.height / s)), int(round(self.width / s)))


def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur, SAME (zero) padding. img (H, W) f32.

    Written as static-slice shift-and-accumulate, NOT `conv_general_dilated`:
    a 1-channel NCHW conv cannot tile onto the MXU and XLA:TPU lowers it to
    a slow generic path — measured 16.2 ms for the 8-level pyramid (the
    single largest cost in the whole extractor) vs sub-ms for these 2x7
    fused shifted adds (pure VPU elementwise work).
    """
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    k = (k / k.sum()).astype(np.float32)
    H, W = img.shape
    pad = jnp.pad(img, ((0, 0), (radius, radius)))
    out = k[0] * pad[:, 0:W]
    for i in range(1, 2 * radius + 1):
        out = out + k[i] * pad[:, i:i + W]
    pad = jnp.pad(out, ((radius, radius), (0, 0)))
    out = k[0] * pad[0:H, :]
    for i in range(1, 2 * radius + 1):
        out = out + k[i] * pad[i:i + H, :]
    return out


def build_pyramid(img: jax.Array, cfg: PyramidConfig) -> list[jax.Array]:
    """Grayscale f32 image -> list of `num_levels` downscaled images."""
    levels = [img]
    for lv in range(1, cfg.num_levels):
        h, w = cfg.level_shape(lv)
        levels.append(
            jax.image.resize(levels[-1], (h, w), method="linear", antialias=True)
        )
    return levels
