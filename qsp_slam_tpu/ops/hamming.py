"""Pallas TPU kernel: pairwise Hamming distance on bit-packed descriptors.

The matcher's default path computes hamming = (256 - <a, b>)/2 with ±1 int8
descriptors on the MXU (`frontend/matcher.py`) — 256 bytes per descriptor.
This kernel works on the PACKED form (8 x uint32 = 32 bytes/descriptor):
XOR + population-count on the VPU, 8x less HBM traffic, which is what
matters once descriptor tables stop fitting in VMEM (place-recognition
databases, full-frame×full-map searches).

Grid: (A/TA, B/TB) tiles; each program XORs a (TA, 8) x (TB, 8) pair block
broadcast to (TA, TB, 8) in VMEM and reduces the popcounts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TILE_A = 256
TILE_B = 256


def _kernel(a_ref, b_ref, out_ref):
    import jax.lax as lax

    # Accumulate per 32-bit word so the (TA, TB) broadcast keeps TB in the
    # lane dimension (a (TA, TB, 8) layout would waste 15/16 of each lane
    # register on the trailing 8).
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for w in range(8):
        aw = a_ref[:, w][:, None]  # (TA, 1)
        bw = b_ref[:, w][None, :]  # (1, TB)
        x = jnp.bitwise_xor(aw, bw)  # (TA, TB)
        acc = acc + lax.population_count(x).astype(jnp.int32)
    out_ref[...] = acc


def _pad_rows(x: jax.Array, mult: int) -> jax.Array:
    pad = (-x.shape[0]) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


@partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_packed(
    bits_a: jax.Array, bits_b: jax.Array, interpret: bool = False
) -> jax.Array:
    """Pairwise Hamming distances from packed descriptors.

    bits_a (A, 8) uint32, bits_b (B, 8) uint32 -> (A, B) int32.
    """
    from jax.experimental import pallas as pl

    A, B = bits_a.shape[0], bits_b.shape[0]
    a = _pad_rows(bits_a, TILE_A)
    b = _pad_rows(bits_b, TILE_B)
    Ap, Bp = a.shape[0], b.shape[0]
    out = pl.pallas_call(
        _kernel,
        grid=(Ap // TILE_A, Bp // TILE_B),
        in_specs=[
            pl.BlockSpec((TILE_A, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_B, 8), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_A, TILE_B), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Ap, Bp), jnp.int32),
        interpret=interpret,
    )(a, b)
    return out[:A, :B]


def hamming_matrix_auto(bits_a, bits_b, desc_pm_a=None, desc_pm_b=None):
    """Backend-adaptive dispatch: Pallas packed kernel on TPU, the MXU ±1
    matmul elsewhere (CPU tests run the interpreter-free path)."""
    if jax.default_backend() == "tpu":
        return hamming_matrix_packed(bits_a, bits_b)
    if desc_pm_a is not None and desc_pm_b is not None:
        from ..frontend.matcher import hamming_matrix

        return hamming_matrix(desc_pm_a, desc_pm_b)
    return hamming_matrix_packed(bits_a, bits_b, interpret=True)
