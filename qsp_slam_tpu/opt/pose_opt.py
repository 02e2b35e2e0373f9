"""Motion-only pose optimization (points fixed).

Parity: `Optimizer::PoseOptimization` (`src/Optimizer.cc:244-456`): 4 rounds
of 10 LM iterations; Huber kernel in the first 2 rounds, plain least squares
after; outliers re-classified against the 95% chi-square gate between rounds
and excluded from the next round but re-tested every round (an edge can come
back).  The whole schedule is one jitted program; it is also vmap-safe so
RANSAC-style multi-hypothesis refinement can batch over initial poses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics
from . import robust
from .reproj import ReprojEdges, edge_chi2, residuals_and_jacobians


class PoseOptResult(NamedTuple):
    Tcw: jax.Array  # (4, 4)
    inlier: jax.Array  # (E,) bool
    num_inliers: jax.Array  # scalar int
    cost: jax.Array  # scalar


def _residuals_single(Tcw, points, edges: ReprojEdges, intr, baseline_fx):
    Tcw_b = Tcw[None]
    kf0 = jnp.zeros_like(edges.kf_idx)
    return residuals_and_jacobians(
        Tcw_b, points, edges._replace(kf_idx=kf0), intr, baseline_fx
    )


def optimize_pose(
    Tcw: jax.Array,
    points: jax.Array,
    edges: ReprojEdges,
    intr: Intrinsics,
    baseline_fx: float = 0.0,
    rounds: int = 4,
    iters_per_round: int = 10,
    early_exit_rtol: float = 1e-5,
) -> PoseOptResult:
    """LM pose-only optimization against fixed world points.

    `edges.kf_idx` is ignored (single camera); `edges.pt_idx` indexes
    `points` (M, 3).
    """
    delta2 = jnp.where(edges.is_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
    th = delta2  # gate threshold equals the Huber delta^2, as in the reference

    def cost_at(Tcw_, active, use_huber):
        r, _, _, row_mask, _ = _residuals_single(Tcw_, points, edges, intr, baseline_fx)
        row_mask = row_mask * active[:, None]
        chi2 = jnp.sum(r * r * row_mask, axis=-1) * edges.inv_sigma2
        cost_e = jnp.where(use_huber, robust.huber_rho(chi2, delta2), chi2)
        return jnp.sum(jnp.where(active > 0.0, cost_e, 0.0))

    def lm_iter(carry, use_huber, active):
        Tcw_, lmbda, cost = carry
        r, Jc, _, row_mask, _ = _residuals_single(
            Tcw_, points, edges, intr, baseline_fx
        )
        row_mask = row_mask * active[:, None]
        chi2 = edge_chi2(r, row_mask, edges.inv_sigma2)
        w_edge = jnp.where(
            use_huber, robust.huber_weight(chi2, delta2), jnp.ones_like(chi2)
        )
        w_row = row_mask * (edges.inv_sigma2 * w_edge)[:, None]
        JW = Jc * w_row[..., None]  # (E, R, 6)
        H = jnp.einsum("era,erb->ab", JW, Jc)
        eye6 = jnp.eye(6, dtype=r.dtype)
        H = H + lmbda * H * eye6 + 1e-6 * eye6  # multiplicative Marquardt damping
        b = -jnp.einsum("era,er->a", JW, r)
        delta = jnp.linalg.solve(H, b)
        Tcw_try = lie.exp_se3(delta) @ Tcw_
        new_cost = cost_at(Tcw_try, active, use_huber)
        accept = new_cost < cost
        return (
            jnp.where(accept, Tcw_try, Tcw_),
            jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
            jnp.where(accept, new_cost, cost),
        )

    def gate(Tcw_):
        r, _, _, row_mask, depth = _residuals_single(
            Tcw_, points, edges, intr, baseline_fx
        )
        chi2 = edge_chi2(r, row_mask, edges.inv_sigma2)
        return edges.valid & (chi2 <= th) & (depth > 0.0)

    active = edges.valid
    cost = jnp.asarray(0.0, Tcw.dtype)
    for rnd in range(rounds):
        use_huber = rnd < 2
        act_f = active.astype(Tcw.dtype)
        carry = (Tcw, jnp.asarray(1e-3, Tcw.dtype), cost_at(Tcw, act_f, use_huber))

        if early_exit_rtol > 0.0:
            # Dynamic trip count (g2o terminateAction role): a frame that
            # starts at the motion-model prediction usually converges in
            # 2-3 iterations — the rest of the fixed 4x10 schedule is pure
            # per-frame device time.
            def cond(c):
                _, _, _, it, done = c
                return (it < iters_per_round) & ~done

            def wbody(c):
                Tcw_, lmbda, cost_, it, _ = c
                prev = cost_
                Tcw_n, lmbda_n, cost_n = lm_iter(
                    (Tcw_, lmbda, cost_), use_huber, act_f
                )
                conv = (cost_n < prev) & (
                    prev - cost_n <= early_exit_rtol * prev
                )
                return (Tcw_n, lmbda_n, cost_n, it + 1, conv)

            Tcw, _, cost, _, _ = jax.lax.while_loop(
                cond, wbody, carry + (jnp.int32(0), jnp.bool_(False))
            )
        else:
            def body(c, _):
                return lm_iter(c, use_huber, act_f), None

            (Tcw, _, cost), _ = jax.lax.scan(
                body, carry, None, length=iters_per_round
            )
        active = gate(Tcw)

    return PoseOptResult(Tcw, active, jnp.sum(active), cost)
