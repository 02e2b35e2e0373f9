"""Ablate local-BA device time on the real TPU: where do the ~34 ms go?"""
import time
import numpy as np
import qsp_slam_tpu  # noqa: F401  (sets matmul precision)
import jax
import jax.numpy as jnp
from jax import lax

from qsp_slam_tpu.data.synthetic import make_ba_problem, ba_edges
from qsp_slam_tpu.opt.reproj import residuals_and_jacobians, edge_chi2
from qsp_slam_tpu.opt import robust
from qsp_slam_tpu.opt.schur import (
    build_normal_blocks_fast, point_slot_table, solve_schur,
    solve_reduced_camera, _inv3x3_spd,
)

prob = make_ba_problem(num_cams=20, num_points=2000, obs_per_point=6,
                       outlier_frac=0.05, seed=0)
K = prob.Tcw_gt.shape[0]
N = prob.points_gt.shape[0]
edges = ba_edges(prob)
intr = prob.intr
cam_fixed = jnp.zeros(K, bool).at[0].set(True)
T0 = jnp.asarray(prob.Tcw_init)
p0 = jnp.asarray(prob.points_init)

slot_table = point_slot_table(edges.pt_idx, edges.valid, N, 16)


def two_point(make_loop, reps=3):
    f1 = jax.jit(make_loop(1))
    f9 = jax.jit(make_loop(9))
    jax.block_until_ready(f1(T0, p0))
    jax.block_until_ready(f9(T0, p0))
    t1s, t9s = [], []
    for _ in range(reps):
        t = time.perf_counter(); jax.block_until_ready(f1(T0, p0))
        t1s.append(time.perf_counter() - t)
        t = time.perf_counter(); jax.block_until_ready(f9(T0, p0))
        t9s.append(time.perf_counter() - t)
    return (np.median(t9s) - np.median(t1s)) / 8.0 * 1e3


# --- A: one full LM iteration (residuals + blocks + solve + retraction +
#        the accept/reject cost re-evaluation pass, matching _lm_stage.step)
def make_full(L):
    def run(T, p):
        def body(i, carry):
            T_, p_ = carry
            r, Jc, Jp, row_mask, _ = residuals_and_jacobians(T_, p_, edges, intr, 0.0)
            chi2 = edge_chi2(r, row_mask, edges.inv_sigma2)
            w_edge = robust.huber_weight(chi2, robust.CHI2_MONO)
            w_row = row_mask * (edges.inv_sigma2 * w_edge)[:, None]
            blocks = build_normal_blocks_fast(r, Jc, Jp, w_row, edges.kf_idx,
                                              slot_table, K, cam_fixed)
            lam = jnp.float32(1e-3) * (1.0 + 0.01 * i)
            dc, dp = solve_schur(blocks, lam, cam_fixed)
            from qsp_slam_tpu.core import lie
            T_n = lie.exp_se3(dc) @ T_
            p_n = p_ + dp
            # accept/reject cost pass (second residuals evaluation), as in
            # production _lm_stage.step (opt/local_ba.py)
            r2, _, _, rm2, _ = residuals_and_jacobians(T_n, p_n, edges, intr, 0.0)
            cost = edge_chi2(r2, rm2, edges.inv_sigma2).sum()
            keep = cost < jnp.inf
            return (jnp.where(keep, T_n, T_), jnp.where(keep, p_n, p_))
        return lax.fori_loop(0, L, body, (T, p))
    return run


# --- B: residuals + blocks only
def make_blocks(L):
    def run(T, p):
        def body(i, acc):
            Ti = T * (1.0 + 1e-9 * i)  # defeat hoisting
            r, Jc, Jp, row_mask, _ = residuals_and_jacobians(Ti, p, edges, intr, 0.0)
            chi2 = edge_chi2(r, row_mask, edges.inv_sigma2)
            w_edge = robust.huber_weight(chi2, robust.CHI2_MONO)
            w_row = row_mask * (edges.inv_sigma2 * w_edge)[:, None]
            blocks = build_normal_blocks_fast(r, Jc, Jp, w_row, edges.kf_idx,
                                              slot_table, K, cam_fixed)
            return acc + blocks.H_cc.sum() + blocks.B_nk.sum() + blocks.H_pp.sum() \
                       + blocks.b_c.sum() + blocks.b_p.sum()
        return lax.fori_loop(0, L, body, jnp.float32(0))
    return run


# precompute blocks once for solve ablations
def get_blocks(T, p):
    r, Jc, Jp, row_mask, _ = residuals_and_jacobians(T, p, edges, intr, 0.0)
    chi2 = edge_chi2(r, row_mask, edges.inv_sigma2)
    w_edge = robust.huber_weight(chi2, robust.CHI2_MONO)
    w_row = row_mask * (edges.inv_sigma2 * w_edge)[:, None]
    return build_normal_blocks_fast(r, Jc, Jp, w_row, edges.kf_idx,
                                    slot_table, K, cam_fixed)


BLOCKS = jax.jit(get_blocks)(T0, p0)
BLOCKS = jax.tree.map(jax.block_until_ready, BLOCKS)


# --- C: solve_schur only (marginalize + reduce + cho + backsub)
def make_solve(L):
    def run(T, p):
        def body(i, acc):
            lam = jnp.float32(1e-3) * (1.0 + 0.01 * i) + acc * 1e-30
            dc, dp = solve_schur(BLOCKS, lam, cam_fixed)
            return acc + dc.sum() + dp.sum()
        return lax.fori_loop(0, L, body, jnp.float32(0))
    return run


# --- D: the reduced-camera dense solve alone (cho_factor 120x120)
Y = _inv3x3_spd(BLOCKS.H_pp, jnp.float32(1e-3))
A = jnp.einsum("nkac,ncd->nkad", BLOCKS.B_nk, Y)
U = jnp.einsum("nkad,nqbd->kaqb", A, BLOCKS.B_nk)
Yb = jnp.einsum("nab,nb->na", Y, BLOCKS.b_p)
RHS = BLOCKS.b_c - jnp.einsum("nkac,nc->ka", BLOCKS.B_nk, Yb)
U, RHS = jax.block_until_ready((U, RHS))


def make_cho(L):
    def run(T, p):
        def body(i, acc):
            lam = jnp.float32(1e-3) * (1.0 + 0.01 * i) + acc * 1e-30
            dc = solve_reduced_camera(BLOCKS.H_cc, U, RHS, lam, cam_fixed)
            return acc + dc.sum()
        return lax.fori_loop(0, L, body, jnp.float32(0))
    return run


print("per-iteration device ms:")
print("  full LM iter      :", round(two_point(make_full), 3))
print("  residuals+blocks  :", round(two_point(make_blocks), 3))
print("  solve_schur       :", round(two_point(make_solve), 3))
print("  reduced cam solve :", round(two_point(make_cho), 3))
