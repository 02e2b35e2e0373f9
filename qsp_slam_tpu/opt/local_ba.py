"""Local bundle adjustment: LM over cameras + points with Schur reduction.

Mirrors the semantics of `Optimizer::LocalBundleAdjustment`
(`src/Optimizer.cc:458-784`): two stages (5 robust iterations, chi2 outlier
gate, 10 more iterations on inliers), Huber kernel at the 95% chi-square
quantile, anchor (fixed) cameras, depth-positivity gating.  The g2o LM
accept/reject schedule is reproduced with a branch-free jnp.where state
update so the whole optimization is ONE jitted XLA program.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Intrinsics
from . import robust
from .reproj import ReprojEdges, edge_chi2, residuals_and_jacobians
from .schur import build_normal_blocks_fast, point_slot_table, solve_schur

# Max observations-per-point capacity for the scatter-free block build; local
# BA windows rarely exceed the keyframe count per point.
MAX_OBS_PER_POINT = 16


class BAResult(NamedTuple):
    Tcw: jax.Array  # (K, 4, 4)
    points: jax.Array  # (N, 3)
    inlier: jax.Array  # (E,) bool — edges surviving the final chi2 gate
    cost: jax.Array  # scalar robust cost at the solution
    num_inliers: jax.Array  # scalar int


def _total_cost(r, row_mask, inv_sigma2, use_huber, delta2):
    chi2 = jnp.sum(r * r * row_mask, axis=-1) * inv_sigma2
    cost_e = jnp.where(use_huber, robust.huber_rho(chi2, delta2), chi2)
    active = row_mask[..., 0] > 0.0  # row 0 mask == edge validity
    return jnp.sum(jnp.where(active, cost_e, 0.0))


def _lm_stage(
    Tcw,
    points,
    cam_fixed,
    edges: ReprojEdges,
    intr: Intrinsics,
    baseline_fx,
    iters: int,
    use_huber: bool,
    delta2_mono: float = robust.CHI2_MONO,
    delta2_stereo: float = robust.CHI2_STEREO,
    init_lambda: float = 1e-3,  # multiplicative Marquardt damping (see schur.py)
    early_exit_rtol: float = 1e-5,
):
    K = Tcw.shape[0]
    N = points.shape[0]
    delta2 = jnp.where(edges.is_stereo, delta2_stereo, delta2_mono)
    # Edge structure is fixed across LM iterations: build the slot table once
    # so every iteration is scatter-free (schur.build_normal_blocks_fast).
    slot_table = point_slot_table(
        edges.pt_idx, edges.valid, N, min(MAX_OBS_PER_POINT, K)
    )

    def eval_at(Tcw_, points_):
        """ONE fused residual+Jacobian pass -> (cost, normal blocks).

        Retrospective LM (round-4 profile lever): the accept test of step k
        and the block build of step k+1 share this single pass, instead of
        a residual-only cost pass PLUS a residual+Jacobian build pass per
        iteration (the residual path is 76% of iteration device time).
        g2o evaluates the same quantities in its errorOfSolution /
        buildSystem pair; the fusion is behavior-preserving — the iterate
        sequence is bitwise the old schedule's."""
        r, Jc, Jp, row_mask, _ = residuals_and_jacobians(
            Tcw_, points_, edges, intr, baseline_fx
        )
        cost = _total_cost(r, row_mask, edges.inv_sigma2, use_huber, delta2)
        chi2 = edge_chi2(r, row_mask, edges.inv_sigma2)
        w_edge = jnp.where(
            use_huber, robust.huber_weight(chi2, delta2), jnp.ones_like(chi2)
        )
        w_row = row_mask * (edges.inv_sigma2 * w_edge)[:, None]
        blocks = build_normal_blocks_fast(
            r, Jc, Jp, w_row, edges.kf_idx, slot_table, K, cam_fixed,
            low_precision=os.environ.get("QSP_BA_BF16") == "1",
        )
        return cost, blocks

    if iters == 0:
        # Cost-only query (global BA's final report): one residual pass.
        r, _, _, row_mask, _ = residuals_and_jacobians(
            Tcw, points, edges, intr, baseline_fx
        )
        return Tcw, points, _total_cost(
            r, row_mask, edges.inv_sigma2, use_huber, delta2
        )

    def step(acc, prop):
        """Solve-at-end trip: ONE eval of the current proposal, accept test
        against the carried best, then solve the NEXT proposal from the
        accepted state's carried blocks.  Exactly one residual+Jacobian
        pass and one Schur solve per trip — no separate accept-test pass,
        no entry build (the first trip's eval IS the entry evaluation,
        accepted against cost=+inf)."""
        Tcw_a, points_a, blocks_a, lmbda, cost = acc
        Tcw_p, points_p = prop
        new_cost, blocks_p = eval_at(Tcw_p, points_p)
        accept = new_cost < cost
        sel = lambda a, b: jnp.where(accept, a, b)
        Tcw_n = sel(Tcw_p, Tcw_a)
        points_n = sel(points_p, points_a)
        blocks_n = (
            blocks_p if blocks_a is None
            else jax.tree.map(sel, blocks_p, blocks_a)
        )
        cost_n = jnp.where(accept, new_cost, cost)
        lmbda_n = jnp.clip(
            jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6
        )
        delta_c, delta_p = solve_schur(blocks_n, lmbda_n, cam_fixed)
        prop_n = (lie.exp_se3(delta_c) @ Tcw_n, points_n + delta_p)
        # Converged when an ACCEPTED step barely moves the cost: further
        # iterations are pure device time (in steady-state tracking most
        # local-BA windows start near the optimum, so the fixed 5+10
        # schedule mostly burns converged passes).  The first trip (entry
        # evaluation vs +inf) never counts as converged.
        converged = accept & (cost - new_cost <= early_exit_rtol * cost) & \
            jnp.isfinite(cost)
        return (Tcw_n, points_n, blocks_n, lmbda_n, cost_n), prop_n, converged

    lmbda0 = jnp.asarray(init_lambda, Tcw.dtype)
    inf0 = jnp.asarray(jnp.inf, Tcw.dtype)
    # First trip outside the loop: it defines the blocks pytree structure
    # (carry must be structure-stable inside while/scan).
    acc, prop, _ = step((Tcw, points, None, lmbda0, inf0), (Tcw, points))

    if early_exit_rtol > 0.0:
        # Dynamic trip count (the reference's g2o terminateAction role).
        def cond(carry):
            return (carry[-2] < iters) & ~carry[-1]

        def wbody(carry):
            Tcw_a, points_a, blocks_a, lmbda, cost, pT, pp, it, _ = carry
            acc_n, prop_n, conv = step(
                (Tcw_a, points_a, blocks_a, lmbda, cost), (pT, pp)
            )
            return acc_n + prop_n + (it + 1, conv)

        out = jax.lax.while_loop(
            cond, wbody, acc + prop + (jnp.int32(0), jnp.bool_(False))
        )
        return out[0], out[1], out[4]

    def body(carry, _):
        Tcw_a, points_a, blocks_a, lmbda, cost, pT, pp = carry
        acc_n, prop_n, _ = step(
            (Tcw_a, points_a, blocks_a, lmbda, cost), (pT, pp)
        )
        return acc_n + prop_n, None

    (Tcw, points, _, _, cost, _, _), _ = jax.lax.scan(
        body, acc + prop, None, length=iters
    )
    return Tcw, points, cost


def _gate(Tcw, points, edges: ReprojEdges, intr, baseline_fx):
    """Outlier gate: chi2 above the 95% quantile or non-positive depth."""
    r, _, _, row_mask, depth = residuals_and_jacobians(
        Tcw, points, edges, intr, baseline_fx
    )
    chi2 = edge_chi2(r, row_mask, edges.inv_sigma2)
    th = jnp.where(edges.is_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
    return edges.valid & (chi2 <= th) & (depth > 0.0)


def local_bundle_adjustment(
    Tcw: jax.Array,
    points: jax.Array,
    cam_fixed: jax.Array,
    edges: ReprojEdges,
    intr: Intrinsics,
    baseline_fx: float = 0.0,
    iters_robust: int = 5,
    iters_final: int = 10,
) -> BAResult:
    """Two-stage local BA (reference schedule 5 + 10, `Optimizer.cc:566,641`)."""
    Tcw, points, _ = _lm_stage(
        Tcw, points, cam_fixed, edges, intr, baseline_fx, iters_robust, use_huber=True
    )
    inlier1 = _gate(Tcw, points, edges, intr, baseline_fx)
    edges2 = edges._replace(valid=inlier1)
    Tcw, points, cost = _lm_stage(
        Tcw, points, cam_fixed, edges2, intr, baseline_fx, iters_final, use_huber=False
    )
    inlier = _gate(Tcw, points, edges2, intr, baseline_fx)
    return BAResult(Tcw, points, inlier, cost, jnp.sum(inlier))


def global_bundle_adjustment(
    Tcw: jax.Array,
    points: jax.Array,
    edges: ReprojEdges,
    intr: Intrinsics,
    baseline_fx: float = 0.0,
    iters: int = 10,
    fix_first: bool = True,
) -> BAResult:
    """Full-map BA (parity: `Optimizer::BundleAdjustment`, `src/Optimizer.cc:54`).

    Gauge is fixed by anchoring camera 0 (`setFixed(mnId==0)` in the
    reference).  Same dense-Schur core; for maps beyond a few hundred
    keyframes use the sharded PCG path in `parallel/`.
    """
    cam_fixed = jnp.zeros(Tcw.shape[0], bool).at[0].set(fix_first)
    Tcw, points, _ = _lm_stage(
        Tcw, points, cam_fixed, edges, intr, baseline_fx, iters, use_huber=True
    )
    inlier = _gate(Tcw, points, edges, intr, baseline_fx)
    r_cost = _lm_stage(
        Tcw, points, cam_fixed, edges._replace(valid=inlier), intr, baseline_fx,
        0, use_huber=False,
    )[2]
    return BAResult(Tcw, points, inlier, r_cost, jnp.sum(inlier))
