"""Synthetic scene/measurement generation for tests and benchmarks.

The reference has no automated tests; its implicit fixture is cached-detection
replay (SURVEY.md §4).  We add proper synthetic golden problems: a camera
trajectory orbiting / translating through a point cloud with known ground
truth, projected to pixel measurements with configurable noise and outliers.
Shapes match the real pipeline's capacity-padded SoA layout, so the same BA
code paths run in tests, benches, and the live system.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..core.camera import Intrinsics

TUM_INTR = dict(fx=520.9, fy=521.0, cx=325.1, cy=249.7, width=640, height=480)


class SyntheticBA(NamedTuple):
    Tcw_gt: np.ndarray  # (K, 4, 4)
    points_gt: np.ndarray  # (N, 3)
    Tcw_init: np.ndarray  # (K, 4, 4) perturbed
    points_init: np.ndarray  # (N, 3) perturbed
    kf_idx: np.ndarray  # (E,)
    pt_idx: np.ndarray  # (E,)
    uv: np.ndarray  # (E, 2)
    u_right: np.ndarray  # (E,)
    inv_sigma2: np.ndarray  # (E,)
    valid: np.ndarray  # (E,) bool
    is_outlier: np.ndarray  # (E,) bool — ground-truth outlier labels
    intr: Intrinsics


def _lookat(cpos: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Camera pose looking at `target`, y-DOWN convention (world y is down,
    camera +y aligns with world +y): consistent with `orbit_trajectory` and
    the ground estimator's default `camera_up_hint=(0,-1,0)` — an up-hint
    against a y-up pose silently inverts every "lowest structure" test."""
    z = target - cpos
    z = z / np.linalg.norm(z)
    down = np.array([0.0, 1.0, 0.0])
    x = np.cross(down, z)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    T_wc = np.eye(4)
    T_wc[:3, :3] = np.stack([x, y, z], axis=1)
    T_wc[:3, 3] = cpos
    return np.linalg.inv(T_wc)  # T_cw


def make_ba_problem(
    num_cams: int = 20,
    num_points: int = 2000,
    obs_per_point: int = 6,
    pix_noise: float = 0.5,
    outlier_frac: float = 0.05,
    pose_noise: float = 0.05,
    point_noise: float = 0.05,
    stereo: bool = False,
    baseline: float = 0.08,
    seed: int = 0,
    dtype=np.float32,
) -> SyntheticBA:
    """Build a BAL-style synthetic local-BA problem with known ground truth.

    Cameras sweep an arc around a 4m-radius point cloud; each point is
    observed by `obs_per_point` consecutive cameras (covisibility-like
    structure matching local BA's banded camera-point pattern).
    """
    rng = np.random.default_rng(seed)
    intr = Intrinsics(**{k: dtype(v) for k, v in TUM_INTR.items() if k not in ("width", "height")})
    W, H = TUM_INTR["width"], TUM_INTR["height"]

    points = rng.uniform([-2.5, -1.5, -2.5], [2.5, 1.5, 2.5], size=(num_points, 3))
    angles = np.linspace(-0.45 * np.pi, 0.45 * np.pi, num_cams)
    Tcw = np.stack(
        [
            _lookat(np.array([6.0 * np.sin(a), 0.4 * np.sin(3 * a), -6.0 * np.cos(a)]), np.zeros(3))
            for a in angles
        ]
    )

    # Observations: each point seen by a window of consecutive cameras.
    first = rng.integers(0, max(1, num_cams - obs_per_point + 1), size=num_points)
    kf_idx = (first[:, None] + np.arange(obs_per_point)[None, :]).reshape(-1)
    pt_idx = np.repeat(np.arange(num_points), obs_per_point)
    keep = kf_idx < num_cams
    kf_idx, pt_idx = kf_idx[keep], pt_idx[keep]

    p_c = np.einsum("eij,ej->ei", Tcw[kf_idx, :3, :3], points[pt_idx]) + Tcw[kf_idx, :3, 3]
    z = p_c[:, 2]
    u = float(intr.fx) * p_c[:, 0] / z + float(intr.cx)
    v = float(intr.fy) * p_c[:, 1] / z + float(intr.cy)
    vis = (z > 0.3) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    kf_idx, pt_idx, u, v, z = kf_idx[vis], pt_idx[vis], u[vis], v[vis], z[vis]
    E = len(u)

    uv = np.stack([u, v], axis=-1) + rng.normal(0, pix_noise, size=(E, 2))
    is_outlier = rng.random(E) < outlier_frac
    uv[is_outlier] += rng.uniform(10, 60, size=(is_outlier.sum(), 2)) * rng.choice(
        [-1, 1], size=(is_outlier.sum(), 2)
    )
    if stereo:
        bf = baseline * float(intr.fx)
        u_right = u - bf / z + rng.normal(0, pix_noise, size=E)
    else:
        u_right = np.full(E, -1.0)

    # Perturb initial states (first camera fixed at GT for gauge).
    Tcw_init = Tcw.copy()
    from ..core import lie as _lie
    import jax.numpy as jnp

    xi = rng.normal(0, pose_noise, size=(num_cams, 6)) * np.array([1, 1, 1, 0.3, 0.3, 0.3])
    xi[0] = 0.0
    Tcw_init = np.asarray(_lie.exp_se3(jnp.asarray(xi, dtype=jnp.float32))) @ Tcw_init
    points_init = points + rng.normal(0, point_noise, size=points.shape)

    return SyntheticBA(
        Tcw_gt=Tcw.astype(dtype),
        points_gt=points.astype(dtype),
        Tcw_init=Tcw_init.astype(dtype),
        points_init=points_init.astype(dtype),
        kf_idx=kf_idx.astype(np.int32),
        pt_idx=pt_idx.astype(np.int32),
        uv=uv.astype(dtype),
        u_right=u_right.astype(dtype),
        inv_sigma2=np.ones(E, dtype=dtype),
        valid=np.ones(E, dtype=bool),
        is_outlier=is_outlier,
        intr=intr,
    )


def ba_edges(problem: SyntheticBA):
    """Pack a SyntheticBA's observation table into ReprojEdges."""
    import jax.numpy as jnp

    from ..opt.reproj import ReprojEdges

    return ReprojEdges(
        kf_idx=jnp.asarray(problem.kf_idx),
        pt_idx=jnp.asarray(problem.pt_idx),
        uv=jnp.asarray(problem.uv),
        u_right=jnp.asarray(problem.u_right),
        inv_sigma2=jnp.asarray(problem.inv_sigma2),
        valid=jnp.asarray(problem.valid),
    )
