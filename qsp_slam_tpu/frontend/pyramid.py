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
    """Separable Gaussian blur, SAME padding. img (H, W) f32."""
    x = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img4 = img[None, None]  # NCHW
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    out = jax.lax.conv_general_dilated(img4, kh, (1, 1), "SAME")
    out = jax.lax.conv_general_dilated(out, kv, (1, 1), "SAME")
    return out[0, 0]


def build_pyramid(img: jax.Array, cfg: PyramidConfig) -> list[jax.Array]:
    """Grayscale f32 image -> list of `num_levels` downscaled images."""
    levels = [img]
    for lv in range(1, cfg.num_levels):
        h, w = cfg.level_shape(lv)
        levels.append(
            jax.image.resize(levels[-1], (h, w), method="linear", antialias=True)
        )
    return levels
