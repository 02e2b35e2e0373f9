"""Object-map evaluation: Hungarian association, 3D IoU, precision/recall.

Parity: `src/evo/` — `evo::Evaluate` with Hungarian matching
(`src/evo/Hungarian.h`), Monte-Carlo IoU (`MonteCarloIoU`,
`src/evo/evo.cpp:52-203`), yaw error, and `StaticResult`
precision/recall/F1 (`src/evo/evo.h:63-86`).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ObjectEvalResult(NamedTuple):
    precision: float
    recall: float
    f1: float
    mean_iou: float  # over matched pairs
    mean_center_err: float
    mean_yaw_err: float
    matches: list  # (est_idx, gt_idx, iou)


def ellipsoid_iou_mc(e_a: np.ndarray, e_b: np.ndarray, samples: int = 8000,
                     seed: int = 0) -> float:
    """Monte-Carlo IoU of two ellipsoids (reference `MonteCarloIoU`)."""
    from ..core import quadric
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    lo = np.minimum(e_a[0:3] - e_a[6:9].max(), e_b[0:3] - e_b[6:9].max())
    hi = np.maximum(e_a[0:3] + e_a[6:9].max(), e_b[0:3] + e_b[6:9].max())
    pts = rng.uniform(lo, hi, size=(samples, 3)).astype(np.float32)

    def inside(e):
        T = np.asarray(quadric.similarity_transform(jnp.asarray(e, jnp.float32)))
        inv = np.linalg.inv(T)
        q = pts @ inv[:3, :3].T + inv[:3, 3]
        return (q * q).sum(-1) <= 1.0

    ia, ib = inside(e_a), inside(e_b)
    inter = (ia & ib).sum()
    union = (ia | ib).sum()
    return float(inter) / max(int(union), 1)


def yaw_error(e_a: np.ndarray, e_b: np.ndarray) -> float:
    """Smallest yaw difference modulo pi/2 (boxes have 4-fold symmetry)."""
    d = abs(e_a[5] - e_b[5]) % (np.pi / 2)
    return float(min(d, np.pi / 2 - d))


def evaluate_objects(
    est: np.ndarray,  # (A, 9) estimated ellipsoids
    est_labels: np.ndarray,
    gt: np.ndarray,  # (B, 9)
    gt_labels: np.ndarray,
    iou_threshold: float = 0.1,
) -> ObjectEvalResult:
    """Hungarian-matched object-map metrics (evo::Evaluate equivalent)."""
    from scipy.optimize import linear_sum_assignment

    A, B = len(est), len(gt)
    if A == 0 or B == 0:
        return ObjectEvalResult(0.0, 0.0, 0.0, 0.0, np.inf, np.inf, [])
    iou = np.zeros((A, B))
    for i in range(A):
        for j in range(B):
            if est_labels[i] == gt_labels[j]:
                iou[i, j] = ellipsoid_iou_mc(est[i], gt[j])
    ri, cj = linear_sum_assignment(-iou)
    matches = [(int(i), int(j), float(iou[i, j])) for i, j in zip(ri, cj)
               if iou[i, j] >= iou_threshold]
    tp = len(matches)
    precision = tp / A
    recall = tp / B
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    if matches:
        mean_iou = float(np.mean([m[2] for m in matches]))
        mean_c = float(
            np.mean([np.linalg.norm(est[i][0:3] - gt[j][0:3]) for i, j, _ in matches])
        )
        mean_y = float(np.mean([yaw_error(est[i], gt[j]) for i, j, _ in matches]))
    else:
        mean_iou, mean_c, mean_y = 0.0, np.inf, np.inf
    return ObjectEvalResult(precision, recall, f1, mean_iou, mean_c, mean_y, matches)
