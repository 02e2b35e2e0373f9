"""Trajectory evaluation: ATE RMSE with SE(3)/Sim(3) (Umeyama) alignment.

Parity: the trajectory half of `src/evo/` (`evo::Evaluate` RMSE computation)
and the standard TUM ATE protocol used by the reference's eval scripts.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform aligning src -> dst ((N,3) each).

    Returns (s, R, t) with dst ~ s R src + t.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def positions_from_Tcw(Tcw: np.ndarray) -> np.ndarray:
    """Camera centers from world->camera poses (K, 4, 4) -> (K, 3)."""
    R = Tcw[:, :3, :3]
    t = Tcw[:, :3, 3]
    return -np.einsum("kji,kj->ki", R, t)


def ate_rmse(
    Tcw_est: np.ndarray, Tcw_gt: np.ndarray, with_scale: bool = False
) -> float:
    """Absolute trajectory error RMSE after alignment (meters)."""
    p_est = positions_from_Tcw(np.asarray(Tcw_est, np.float64))
    p_gt = positions_from_Tcw(np.asarray(Tcw_gt, np.float64))
    s, R, t = umeyama_alignment(p_est, p_gt, with_scale)
    p_al = (s * (R @ p_est.T)).T + t
    return float(np.sqrt(np.mean(np.sum((p_al - p_gt) ** 2, axis=-1))))
