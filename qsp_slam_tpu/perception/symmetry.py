"""Reflection-symmetry point-cloud completion.

Parity: `src/symmetry/` (`estimateSymmetry`, `SymmetrySolver.cpp`) — many
household objects are bilaterally symmetric about a vertical plane; the
reference estimates that plane and mirrors the observed (front-only) depth
cloud to complete the object before ellipsoid fitting
(`EllipsoidExtraction.Symmetry.Open`).

TPU-native: candidate symmetry planes are a fixed fan of vertical planes
through the cloud centroid (yaw-sampled); each candidate is scored by
one-sided chamfer consistency (reflected points must land near observed
points) via a batched pairwise distance — argmin replaces the reference's
iterative solver.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SymmetryResult(NamedTuple):
    plane: jax.Array  # (4,) best symmetry plane (camera frame)
    score: jax.Array  # mean chamfer residual (lower = better)
    ok: jax.Array  # bool
    completed: jax.Array  # (2N, 3) original + mirrored points
    completed_ok: jax.Array  # (2N,)


@partial(jax.jit, static_argnames=("num_yaw",))
def estimate_symmetry(
    pts: jax.Array,  # (N, 3) object cloud (camera frame)
    valid: jax.Array,  # (N,)
    up: jax.Array,  # (3,) up direction (from the ground plane)
    num_yaw: int = 24,
    chamfer_tol: float = 0.04,
) -> SymmetryResult:
    up = up / jnp.linalg.norm(up)
    w = valid.astype(pts.dtype)
    ctr = jnp.einsum("n,ni->i", w, pts) / jnp.maximum(jnp.sum(w), 1.0)

    a = jnp.where(
        jnp.abs(up[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
    )
    b1 = a - up * jnp.dot(a, up)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(up, b1)

    yaws = jnp.linspace(0.0, jnp.pi, num_yaw, endpoint=False)

    def score_yaw(yaw):
        n = jnp.cos(yaw) * b1 + jnp.sin(yaw) * b2  # vertical plane normal
        d = -jnp.dot(n, ctr)
        # reflect: p' = p - 2 (n.p + d) n
        s = pts @ n + d
        refl = pts - 2.0 * s[:, None] * n[None, :]
        dist = jnp.linalg.norm(refl[:, None, :] - pts[None, :, :], axis=-1)
        dist = jnp.where(valid[None, :], dist, jnp.inf)
        nn = jnp.min(dist, axis=1)
        cost = jnp.sum(jnp.where(valid, jnp.minimum(nn, 0.2), 0.0)) / jnp.maximum(
            jnp.sum(w), 1.0
        )
        return cost, jnp.concatenate([n, d[None]])

    costs, planes = jax.vmap(score_yaw)(yaws)
    best = jnp.argmin(costs)
    # Fine pass: +-1 coarse step around the winner at 8x resolution.
    step = jnp.pi / num_yaw
    fine = yaws[best] + jnp.linspace(-step, step, 16)
    costs_f, planes_f = jax.vmap(score_yaw)(fine)
    best_f = jnp.argmin(costs_f)
    plane = planes_f[best_f]
    score = costs_f[best_f]
    s = pts @ plane[:3] + plane[3]
    refl = pts - 2.0 * s[:, None] * plane[:3][None, :]
    return SymmetryResult(
        plane=plane,
        score=score,
        ok=score < chamfer_tol,
        completed=jnp.concatenate([pts, refl]),
        completed_ok=jnp.concatenate([valid, valid]),
    )
