"""Finer ablation of the blocks build: residuals vs gathers vs einsums vs S."""
import time
import numpy as np
import qsp_slam_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from qsp_slam_tpu.data.synthetic import make_ba_problem, ba_edges
from qsp_slam_tpu.opt.reproj import residuals_and_jacobians, edge_chi2
from qsp_slam_tpu.opt import robust
from qsp_slam_tpu.opt.schur import build_normal_blocks_fast, point_slot_table

prob = make_ba_problem(num_cams=20, num_points=2000, obs_per_point=6,
                       outlier_frac=0.05, seed=0)
K = prob.Tcw_gt.shape[0]
N = prob.points_gt.shape[0]
edges = ba_edges(prob)
intr = prob.intr
cam_fixed = jnp.zeros(K, bool).at[0].set(True)
T0 = jnp.asarray(prob.Tcw_init)
p0 = jnp.asarray(prob.points_init)
E = edges.kf_idx.shape[0]
print("E =", E)


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


# (a) residual/Jacobian pass alone (edge-major)
def make_resid(L):
    def run(T, p):
        def body(i, acc):
            Ti = T * (1.0 + 1e-9 * i)
            r, Jc, Jp, row_mask, _ = residuals_and_jacobians(Ti, p, edges, intr, 0.0)
            return acc + r.sum() + Jc.sum() + Jp.sum()
        return lax.fori_loop(0, L, body, jnp.float32(0))
    return run


# (b) blocks with given S
def make_blocks_S(S):
    slot_table = point_slot_table(edges.pt_idx, edges.valid, N, S)
    def make(L):
        def run(T, p):
            def body(i, acc):
                Ti = T * (1.0 + 1e-9 * i)
                r, Jc, Jp, row_mask, _ = residuals_and_jacobians(Ti, p, edges, intr, 0.0)
                chi2 = edge_chi2(r, row_mask, edges.inv_sigma2)
                w_edge = robust.huber_weight(chi2, robust.CHI2_MONO)
                w_row = row_mask * (edges.inv_sigma2 * w_edge)[:, None]
                b = build_normal_blocks_fast(r, Jc, Jp, w_row, edges.kf_idx,
                                             slot_table, K, cam_fixed)
                return acc + b.H_cc.sum() + b.B_nk.sum() + b.H_pp.sum() + b.b_c.sum() + b.b_p.sum()
            return lax.fori_loop(0, L, body, jnp.float32(0))
        return run
    return make


# (c) gathers only (slot layout materialization of r/Jc/Jp)
slot_table16 = point_slot_table(edges.pt_idx, edges.valid, N, 16)
def make_gather(L):
    def run(T, p):
        def body(i, acc):
            Ti = T * (1.0 + 1e-9 * i)
            r, Jc, Jp, row_mask, _ = residuals_and_jacobians(Ti, p, edges, intr, 0.0)
            eid = slot_table16
            mask = (eid >= 0).astype(r.dtype)[..., None]
            eid_c = jnp.clip(eid, 0)
            Jp_g = Jp[eid_c] * mask[..., None]
            Jc_g = Jc[eid_c] * mask[..., None]
            r_g = r[eid_c] * mask
            return acc + Jp_g.sum() + Jc_g.sum() + r_g.sum()
        return lax.fori_loop(0, L, body, jnp.float32(0))
    return run


print("residuals+J edge-major :", round(two_point(make_resid), 3))
print("resid + gathers(S=16)  :", round(two_point(make_gather), 3))
print("resid + blocks  S=16   :", round(two_point(make_blocks_S(16)), 3))
print("resid + blocks  S=8    :", round(two_point(make_blocks_S(8)), 3))
