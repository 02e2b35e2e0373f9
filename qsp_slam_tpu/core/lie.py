"""Lie-group operations for SO(3) / SE(3) / Sim(3).

TPU-native design notes
-----------------------
All functions are pure, shape-polymorphic over leading batch dimensions, and
written with Taylor-guarded small-angle branches so they are safe under
`jax.grad` / `jax.jacfwd` (no NaN gradients at theta == 0).  Rotations are
carried as 3x3 matrices; rigid transforms as (..., 4, 4) homogeneous matrices.

Tangent conventions (documented so every factor in `qsp_slam_tpu.opt` agrees):
  * se(3) tangent xi = [v(3), w(3)]      -- translation first, then rotation.
  * sim(3) tangent xi = [v(3), w(3), s]  -- scale log appended.
  * Perturbations are LEFT-multiplicative: T' = exp(xi) @ T.

Parity notes (behavioral, not code): mirrors the semantics of the reference's
embedded-Python Lie helpers (`reconstruct/loss_utils.py:107-233`, exp_se3 /
exp_sim3 with the same [v, w, s] ordering) and the g2o SE3Quat/Sim3 types used
by `src/Optimizer.cc` / `src/Optimizer_util.cc`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_div(num, den, small):
    """num/den with den replaced by 1 where `small`, for NaN-free autodiff."""
    den_safe = jnp.where(small, jnp.ones_like(den), den)
    return num / den_safe


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator. w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat. W: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _so3_coeffs(theta2):
    """Return (A, B, C) with sin(t)/t, (1-cos t)/t^2, (t-sin t)/t^3, guarded."""
    small = theta2 < _EPS
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    A = jnp.where(small, 1.0 - theta2 / 6.0, _safe_div(sin_t, theta, small))
    B = jnp.where(small, 0.5 - theta2 / 24.0, _safe_div(1.0 - cos_t, theta2, small))
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, _safe_div(theta - sin_t, theta2 * theta, small)
    )
    return A, B, C


def exp_so3(w: jax.Array) -> jax.Array:
    """SO(3) exponential map. w: (..., 3) -> R: (..., 3, 3) (Rodrigues)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _so3_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def log_so3(R: jax.Array) -> jax.Array:
    """SO(3) logarithm. R: (..., 3, 3) -> w: (..., 3).

    Uses the quaternion route (stable near 0 and pi) via the trace formula.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    s2 = jnp.sum(w_skew * w_skew, axis=-1)  # = 4 sin^2(theta)
    # atan2-based theta: finite derivatives at the identity, where
    # d(arccos)/dx blows up — pose-graph edges sit exactly there.
    sin_t = 0.5 * jnp.sqrt(s2 + 1e-24)
    theta = jnp.arctan2(sin_t, cos_t)
    near_0 = theta < 1e-4
    # The pi-branch must engage well before the generic formula degenerates
    # (sin theta in the denominator).
    near_pi = (jnp.pi - theta) < 5e-3
    generic = ~(near_0 | near_pi)
    k_generic = _safe_div(theta, 2.0 * sin_t, ~generic)
    # theta -> 0: w ~ 0.5 * (1 + theta^2/6) * vee(R - R^T); theta^2 ~ s2/4
    # (expressed via s2 so the Taylor term differentiates cleanly at 0).
    k_small = 0.5 + s2 / 48.0
    k = jnp.where(generic, k_generic, k_small)
    w_gen = k[..., None] * w_skew
    # theta -> pi: axis magnitudes from the diagonal of S = R + R^T
    # (S = 2 cos(t) I + 2 (1 - cos t) aa^T), signs from S's dominant column.
    S = R + jnp.swapaxes(R, -1, -2)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    # Guard the denominator for the non-pi case: 3 - trace -> 0 near the
    # identity, and although `where` masks the primal, unguarded NaN/inf
    # tangents would poison autodiff through the other branch.
    denom_pi = jnp.where(near_pi, 3.0 - trace, jnp.ones_like(trace))[..., None]
    axis2 = jnp.clip((diag + (1.0 - trace[..., None])) / denom_pi, 0.0, None)
    axis = jnp.sqrt(axis2 + 1e-24)
    jmax = jnp.argmax(axis2, axis=-1)
    onehot = jax.nn.one_hot(jmax, 3, dtype=R.dtype)
    # M = S - 2 cos(t) I = 2 (1 - cos t) aa^T; its jmax column ∝ axis * axis[jmax].
    M = S - (2.0 * cos_t)[..., None, None] * jnp.eye(3, dtype=R.dtype)
    prods = jnp.einsum("...ij,...j->...i", M, onehot)
    sgn = jnp.where(prods < 0.0, -1.0, 1.0)
    axis_pi = axis * sgn
    nrm = jnp.linalg.norm(axis_pi, axis=-1, keepdims=True)
    axis_pi = axis_pi / jnp.where(nrm == 0.0, 1.0, nrm)
    # Global sign from vee(R - R^T) = 2 sin(t) a (sin t > 0 below pi); at
    # exactly pi the dot is noise-level and either sign is a valid log.
    dotp = jnp.sum(w_skew * axis_pi, axis=-1, keepdims=True)
    axis_pi = axis_pi * jnp.where(dotp < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis_pi
    return jnp.where(near_pi[..., None], w_pi, w_gen)


def left_jacobian_so3(w: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(w): (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _so3_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def inv_left_jacobian_so3(w: jax.Array) -> jax.Array:
    """Inverse SO(3) left Jacobian."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    half = 0.5 * theta
    cot_term = _safe_div(half * jnp.cos(half), jnp.sin(half), small)
    k = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, _safe_div(1.0 - cot_term, theta2, small))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + k[..., None, None] * W2


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def exp_se3(xi: jax.Array) -> jax.Array:
    """SE(3) exponential. xi = [v, w]: (..., 6) -> T: (..., 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:6]
    R = exp_so3(w)
    J = left_jacobian_so3(w)
    t = jnp.einsum("...ij,...j->...i", J, v)
    return rt_to_se3(R, t)


def log_se3(T: jax.Array) -> jax.Array:
    """SE(3) logarithm. T: (..., 4, 4) -> xi = [v, w]: (..., 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    Jinv = inv_left_jacobian_so3(w)
    v = jnp.einsum("...ij,...j->...i", Jinv, t)
    return jnp.concatenate([v, w], axis=-1)


def rt_to_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (..., 4, 4) homogeneous transform from R (..., 3, 3), t (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def inv_se3(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform without generic matrix inversion."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) transform to (..., N, 3) points -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def adjoint_se3(T: jax.Array) -> jax.Array:
    """Adjoint of SE(3) acting on [v, w] tangents: (..., 6, 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = hat(t) @ R
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([zeros, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------


def _sim3_W(w: jax.Array, s: jax.Array) -> jax.Array:
    """The Sim(3) 'W' matrix so that t = W v (analogue of the left Jacobian).

    Same semantics as the reference's closed form
    (`reconstruct/loss_utils.py:188-233`), computed as the matrix series
        W = int_0^1 exp(t (s I + w_hat)) dt = sum_n B^n / (n+1)!,
    B = s I + w_hat (valid because s I commutes with w_hat).  The series is
    branch-free and smooth, which matters twice over: the closed form
    catastrophically cancels in f32 for small |s| (errors ~1e7 x), and its
    `where` guards produce NaN tangents under autodiff.  20 terms give
    ~1e-8 error up to |w| = pi.
    """
    B = hat(w) + s[..., None, None] * jnp.eye(3, dtype=w.dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), B.shape)
    W = eye  # n = 0 term: I / 1!
    term = eye
    for n in range(1, 20):
        term = term @ B / (n + 1)
        W = W + term
    return W


def exp_sim3(xi: jax.Array) -> jax.Array:
    """Sim(3) exponential. xi = [v(3), w(3), s]: (..., 7) -> (..., 4, 4).

    The returned matrix has top-left block exp(s) * R (rotation scaled), as in
    the reference (`reconstruct/loss_utils.py:229-233`).
    """
    v, w, s = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = exp_so3(w)
    Wm = _sim3_W(w, s)
    t = jnp.einsum("...ij,...j->...i", Wm, v)
    sR = jnp.exp(s)[..., None, None] * R
    return rt_to_se3(sR, t)


def log_sim3(T: jax.Array) -> jax.Array:
    """Sim(3) logarithm: (..., 4, 4) with sR top-left -> [v, w, s]: (..., 7)."""
    sR = T[..., :3, :3]
    t = T[..., :3, 3]
    scale = jnp.cbrt(jnp.linalg.det(sR))
    s = jnp.log(scale)
    R = sR / scale[..., None, None]
    w = log_so3(R)
    Wm = _sim3_W(w, s)
    v = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([v, w, s[..., None]], axis=-1)


def sim3_scale(T: jax.Array) -> jax.Array:
    """Extract the scalar scale from a Sim(3) matrix (..., 4, 4) -> (...)."""
    return jnp.cbrt(jnp.linalg.det(T[..., :3, :3]))


def inv_sim3(T: jax.Array) -> jax.Array:
    """Inverse of a similarity transform (sR | t)."""
    sR = T[..., :3, :3]
    t = T[..., :3, 3]
    s2 = jnp.sum(sR[..., 0, :] * sR[..., 0, :], axis=-1)  # s^2 (rows of sR have norm s)
    inv_sR = jnp.swapaxes(sR, -1, -2) / s2[..., None, None]
    return rt_to_se3(inv_sR, -jnp.einsum("...ij,...j->...i", inv_sR, t))


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w convention) — used for IO and trajectory formats.
# ---------------------------------------------------------------------------


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion [x, y, z, w] -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion [x, y, z, w], branch-free.

    Computes all four Shepperd candidates and selects the best-conditioned one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate squared magnitudes (all >= 0 up to numerics).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    # Candidate quaternions (unnormalized), one per dominant component.
    cand_w = jnp.stack([m21 - m12, m02 - m20, m10 - m01, qw2], axis=-1)
    cand_x = jnp.stack([qx2, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    cand_y = jnp.stack([m01 + m10, qy2, m12 + m21, m02 - m20], axis=-1)
    cand_z = jnp.stack([m02 + m20, m12 + m21, qz2, m10 - m01], axis=-1)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4cand, 4)
    onehot = jax.nn.one_hot(best, 4, dtype=R.dtype)
    q = jnp.einsum("...cd,...c->...d", cands, onehot)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0.0, -1.0, 1.0)
