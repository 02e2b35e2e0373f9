"""Pallas TPU kernel: fused FAST-9/16 corner score + 3x3 NMS, row-banded.

The XLA formulation (`frontend/fast.py`) expresses the 16-offset ring test
as 16 rolled copies plus 16x9 rotated AND-reductions — correct and
fusion-friendly, but each fusion boundary is another HBM round trip over
the full (H, W) image, and a whole-frame fused kernel does not fit VMEM
(measured 16.5-18.6 MB live vs the 16 MB/core budget at 640x480).  So the
kernel processes the image in ROW BANDS:

  * the host zero-pads the image by a 4-row halo (3 for the Bresenham
    ring, 1 for NMS) so every band's DMA window is in bounds and the
    interior offset is STATIC;
  * each grid step DMAs its (band + 8, W) window from HBM into a VMEM
    scratch (`pltpu.make_async_copy`), then computes entirely in VMEM:
    ring comparisons accumulate into ONE packed bitmask plane (bits 0-15
    bright, 16-31 dark) + two SAD score planes; the contiguous-arc-of-9
    test is rotate-AND steps on the bitmask; 3x3 NMS is 8 rolled maxima;
  * shifts use the native `pltpu.roll` (no concat temporaries); roll
    wrap-around only pollutes the halo rows / border columns, both of
    which the global border mask kills — interior rows are exact.

Parity: `ORBextractor::ComputeKeyPointsOctTree` FAST stage
(`src/ORBextractor.cc:766`); score/NMS semantics identical to
`frontend/fast.fast_score` + `nms3x3` (equivalence-tested in
tests/test_ops.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..frontend.fast import _CIRCLE, fast_score, nms3x3

_HALO = 4  # 3 (ring radius) + 1 (NMS)
_BAND = 120  # interior rows per grid step; (BAND+8, W) planes stay small


def _rot16(m: jax.Array, r: int) -> jax.Array:
    """Rotate 16-bit ring masks held in int32 lanes."""
    return ((m >> r) | (m << (16 - r))) & 0xFFFF


def _roll2d(x: jax.Array, dy: int, dx: int, interpret: bool) -> jax.Array:
    """2-D cyclic shift: native `pltpu.roll` on the Mosaic path (one vector
    op, no concat temporaries; jnp.roll's slice+concat pairs bloat VMEM
    liveness and cannot type 0-shifts), jnp.roll in interpreter mode."""
    if interpret:
        if dy:
            x = jnp.roll(x, dy, 0)
        if dx:
            x = jnp.roll(x, dx, 1)
        return x
    from jax.experimental.pallas import tpu as pltpu

    if dy:
        x = pltpu.roll(x, dy % x.shape[0], 0)
    if dx:
        x = pltpu.roll(x, dx % x.shape[1], 1)
    return x


def _band_kernel(
    img_hbm, out_ref, scratch, sem, *, threshold: float, H: int, W: int,
    interpret: bool,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    S = _BAND + 2 * _HALO
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * _BAND, S), :], scratch, sem
    )
    dma.start()
    dma.wait()
    c = scratch[...]
    sh = c.shape
    # ONE packed mask plane (bits 0-15 bright, 16-31 dark).
    mask = jnp.zeros(sh, jnp.int32)
    score_b = jnp.zeros(sh, jnp.float32)
    score_d = jnp.zeros(sh, jnp.float32)
    for k, (dy, dx) in enumerate(_CIRCLE):
        ring = _roll2d(c, -dy, -dx, interpret)
        bright = ring > c + threshold
        dark = ring < c - threshold
        mask = mask | (bright.astype(jnp.int32) << k)
        mask = mask | (dark.astype(jnp.int32) << (16 + k))
        diff = jnp.abs(ring - c) - threshold
        score_b = score_b + jnp.where(bright, diff, 0.0)
        score_d = score_d + jnp.where(dark, diff, 0.0)
    bmask = mask & 0xFFFF
    dmask = (mask >> 16) & 0xFFFF

    def arc9(m):
        # Contiguous cyclic run of >= 9 set bits: AND with rotations 1, 2,
        # 4 leaves bit i set iff bits i..i+7 are set (run >= 8); ANDing
        # with the ORIGINAL mask rotated by 8 appends the 9th bit.
        r = m & _rot16(m, 1)
        r = r & _rot16(r, 2)
        r = r & _rot16(r, 4)
        r = r & _rot16(m, 8)
        return r != 0

    is_corner = arc9(bmask) | arc9(dmask)
    score = jnp.where(is_corner, jnp.maximum(score_b, score_d), 0.0)
    # Border kill in GLOBAL image coordinates (scratch row r is image row
    # i*BAND + r - HALO) — identical to fast_score's border mask, and it
    # also erases everything the cyclic rolls polluted (halo rows, wrap
    # columns, the zero padding).
    yy = i * _BAND + jax.lax.broadcasted_iota(jnp.int32, sh, 0) - _HALO
    xx = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    border = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    score = jnp.where(border, score, 0.0)
    # 3x3 NMS via 8 rolled maxima; interior rows' neighborhoods are exact.
    m = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, _roll2d(score, -dy, -dx, interpret))
    keep = jnp.where(score >= m, score, 0.0)
    out_ref[...] = keep[_HALO : _HALO + _BAND, :]


@partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_nms_pallas(
    img: jax.Array, threshold: float, interpret: bool = False
) -> jax.Array:
    """NMS'd FAST score map via the row-banded fused kernel. img (H, W)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img.shape
    nbands = -(-H // _BAND)
    img_p = jnp.pad(
        img.astype(jnp.float32),
        ((_HALO, nbands * _BAND + _HALO - H), (0, 0)),
    )
    out = pl.pallas_call(
        partial(
            _band_kernel, threshold=float(threshold), H=H, W=W,
            interpret=interpret,
        ),
        grid=(nbands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_BAND, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nbands * _BAND, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_BAND + 2 * _HALO, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p)
    return out[:H]


def fast_score_nms_auto(img: jax.Array, threshold: float) -> jax.Array:
    """Dispatch: XLA formulation by default, Pallas kernel on opt-in.

    MEASURED (v5e, 640x480, two-point method): XLA's own fusion wins this
    stencil on-device — 0.051 ms vs 0.625 ms for the banded kernel (the
    DMA + per-band grid serialize what XLA fuses into a couple of full-
    frame passes).  The kernel still wins per-dispatch WALL time on
    tunneled/remote devices (26.4 vs 30.5 ms incl. dispatch overhead) and
    is kept as an opt-in (QSP_PALLAS_FAST=1) + equivalence-tested
    reference for the packed-bitmask formulation.
    """
    import os

    if (
        os.environ.get("QSP_PALLAS_FAST") == "1"
        and jax.default_backend() == "tpu"
        and img.shape[0] >= 16
    ):
        return fast_score_nms_pallas(img, threshold)
    return nms3x3(fast_score(img, threshold))
