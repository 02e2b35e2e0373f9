"""Joint pose + latent-code Gauss-Newton ("reconstruct_object").

Parity: `Optimizer.reconstruct_object` (`reconstruct/optimizer.py:96-281`) —
per-object GN over Sim3 pose ⊕ 64-d code: SDF surface term + depth-render
term + rotation prior + code L2 + scale damping; dense (7+C)x(7+C) system,
exp_sim3 retraction — and `estimate_pose_cam_obj` (`optimizer.py:47-93`),
the pose-only SE3 variant with inlier re-weighting.

TPU-native: residuals are JAX functions; Jacobians come from FORWARD-mode
autodiff (7+C parameter tangents — far cheaper than per-row VJPs when
residuals outnumber parameters), and the optimizer is pure/jitted — vmap it
over objects and over the 4 flip hypotheses at once (replacing the
reference's serial per-object, per-flip loop, `LocalMapping_util.cc:713`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from .deepsdf import DeepSDFConfig
from . import losses


class ShapeOptConfig(NamedTuple):
    iters: int = 8
    w_sdf: float = 1.0
    w_render: float = 1.0
    w_rot: float = 0.3
    w_code: float = 0.03
    w_scale: float = 10.0
    huber_sdf: float = 0.05
    huber_render: float = 0.15
    lm_lambda0: float = 1e-2
    # Orientation (flip) search: number of up-axis rotation hypotheses per
    # object, optimized in parallel, best robust cost wins (reference
    # `flip_sample_num`, `src/LocalMapping_util.cc:713-760`).
    num_flips: int = 4


class ShapeOptResult(NamedTuple):
    T_oc: jax.Array  # (4, 4) refined camera->object similarity transform
    code: jax.Array  # (C,)
    cost: jax.Array  # final robust cost
    is_good: jax.Array  # bool — converged to a sane solution


def _huber_w(r: jax.Array, delta: float) -> jax.Array:
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


@partial(jax.jit, static_argnames=("dec_cfg", "opt_cfg"))
def reconstruct_object(
    params,
    dec_cfg: DeepSDFConfig,
    T_oc_init: jax.Array,  # (4, 4) initial camera->object (normalized frame)
    code_init: jax.Array,  # (C,)
    pts_cam: jax.Array,  # (P, 3) surface points, camera frame
    pts_valid: jax.Array,  # (P,)
    rays_cam: jax.Array,  # (R, 3) unit-z rays with depth observations
    depth_obs: jax.Array,  # (R,)
    rays_valid: jax.Array,  # (R,)
    opt_cfg: ShapeOptConfig = ShapeOptConfig(),
) -> ShapeOptResult:
    """GN over (sim3 xi ⊕ code) with the reference's term structure."""
    C = code_init.shape[0]
    D = 7 + C

    def residuals(theta, T_base):
        xi, code = theta[:7], theta[7:]
        r_sdf = losses.sdf_residuals(
            params, dec_cfg, xi, code, T_base, pts_cam, pts_valid
        )
        r_ren = losses.render_residuals(
            params, dec_cfg, xi, code, T_base, rays_cam, depth_obs, rays_valid
        )
        return r_sdf, r_ren

    def weighted_system(theta, T_base):
        # J via reverse-mode over the packed (xi, code) vector.
        def f_sdf(t):
            return losses.sdf_residuals(
                params, dec_cfg, t[:7], t[7:], T_base, pts_cam, pts_valid
            )

        def f_ren(t):
            return losses.render_residuals(
                params, dec_cfg, t[:7], t[7:], T_base, rays_cam, depth_obs, rays_valid
            )

        r_sdf = f_sdf(theta)
        r_ren = f_ren(theta)
        J_sdf = jax.jacfwd(f_sdf)(theta)  # (P, D) — forward-mode: D=7+C tangents
        # beat per-row VJPs when residuals outnumber parameters
        J_ren = jax.jacfwd(f_ren)(theta)  # (R, D)

        w_sdf = _huber_w(r_sdf, opt_cfg.huber_sdf) * pts_valid * opt_cfg.w_sdf
        w_ren = _huber_w(r_ren, opt_cfg.huber_render) * rays_valid * opt_cfg.w_render

        H = (
            jnp.einsum("pi,p,pj->ij", J_sdf, w_sdf, J_sdf)
            + jnp.einsum("ri,r,rj->ij", J_ren, w_ren, J_ren)
        )
        g = -(
            jnp.einsum("pi,p->i", J_sdf, w_sdf * r_sdf)
            + jnp.einsum("ri,r->i", J_ren, w_ren * r_ren)
        )
        # Priors: rotation tilt, scale damping, code L2 (diagonal terms).
        prior_diag = jnp.zeros(D)
        prior_diag = prior_diag.at[3:5].set(opt_cfg.w_rot)
        prior_diag = prior_diag.at[6].set(opt_cfg.w_scale)
        prior_diag = prior_diag.at[7:].set(opt_cfg.w_code)
        H = H + jnp.diag(prior_diag)
        g = g - prior_diag * theta
        return H, g

    def cost_at(theta, T_base):
        r_sdf, r_ren = residuals(theta, T_base)
        c_sdf = jnp.sum(
            _huber_w(r_sdf, opt_cfg.huber_sdf) * r_sdf * r_sdf * pts_valid
        )
        c_ren = jnp.sum(
            _huber_w(r_ren, opt_cfg.huber_render) * r_ren * r_ren * rays_valid
        )
        xi, code = theta[:7], theta[7:]
        c_pri = (
            opt_cfg.w_rot * jnp.sum(xi[3:5] ** 2)
            + opt_cfg.w_scale * xi[6] ** 2
            + opt_cfg.w_code * jnp.sum(code * code)
        )
        return opt_cfg.w_sdf * c_sdf + opt_cfg.w_render * c_ren + c_pri

    def body(carry, _):
        T_base, code, lmbda, cost = carry
        theta = jnp.concatenate([jnp.zeros(7), code])
        H, g = weighted_system(theta, T_base)
        eye = jnp.eye(D)
        H_d = H + lmbda * H * eye + 1e-8 * eye
        delta = jnp.linalg.solve(H_d, g)
        T_try = lie.exp_sim3(delta[:7]) @ T_base
        code_try = code + delta[7:]
        c_try = cost_at(jnp.concatenate([jnp.zeros(7), code_try]), T_try)
        accept = c_try < cost
        return (
            jnp.where(accept, T_try, T_base),
            jnp.where(accept, code_try, code),
            jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
            jnp.where(accept, c_try, cost),
        ), None

    theta0 = jnp.concatenate([jnp.zeros(7), code_init])
    cost0 = cost_at(theta0, T_oc_init)
    init = (T_oc_init, code_init, jnp.asarray(opt_cfg.lm_lambda0), cost0)
    (T_oc, code, _, cost), _ = jax.lax.scan(body, init, None, length=opt_cfg.iters)

    n_act = jnp.sum(pts_valid) + jnp.sum(rays_valid)
    is_good = (cost < cost0) & (cost / jnp.maximum(n_act, 1.0) < 0.05) & jnp.all(
        jnp.isfinite(T_oc)
    )
    return ShapeOptResult(T_oc=T_oc, code=code, cost=cost, is_good=is_good)


def _rot_y_h(angle: jax.Array) -> jax.Array:
    """Homogeneous rotation about the object-frame up (y) axis."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray(
        [[c, 0.0, s, 0.0], [0.0, 1.0, 0.0, 0.0],
         [-s, 0.0, c, 0.0], [0.0, 0.0, 0.0, 1.0]]
    )


def flip_hypotheses(T_oc_init: jax.Array, num_flips: int) -> jax.Array:
    """(F, 4, 4) up-axis rotations of the initial object frame — the
    orientation-search hypothesis set (`flip_sample_num`,
    `src/LocalMapping_util.cc:713-760`).  Rotating the OBJECT frame:
    p_o' = R p_o  =>  T_o'c = R_h @ T_oc."""
    F = max(1, num_flips)
    angles = 2.0 * jnp.pi * jnp.arange(F, dtype=jnp.float32) / F
    return jax.vmap(lambda a: _rot_y_h(a) @ T_oc_init)(angles)


@partial(jax.jit, static_argnames=("dec_cfg", "opt_cfg"))
def reconstruct_object_flips(
    params,
    dec_cfg: DeepSDFConfig,
    T_oc_init: jax.Array,
    code_init: jax.Array,
    pts_cam: jax.Array,
    pts_valid: jax.Array,
    rays_cam: jax.Array,
    depth_obs: jax.Array,
    rays_valid: jax.Array,
    opt_cfg: ShapeOptConfig = ShapeOptConfig(),
) -> tuple[ShapeOptResult, jax.Array]:
    """Orientation search: `opt_cfg.num_flips` up-axis rotations of the
    initial object frame are optimized as ONE vmapped batch; the hypothesis
    with the lowest final robust cost (among converged ones) wins.

    Parity: the reference's serial y-flip retry loop until
    `findGoodOrientation` (`src/LocalMapping_util.cc:713-760`,
    `flip_sample_num`=4) — an object initialized with a wrong yaw/flip
    otherwise converges to a mirror-image shape.  Returns (result,
    chosen_flip_index).
    """
    T_hyp = flip_hypotheses(T_oc_init, opt_cfg.num_flips)
    res = jax.vmap(
        lambda T: reconstruct_object(
            params, dec_cfg, T, code_init, pts_cam, pts_valid,
            rays_cam, depth_obs, rays_valid, opt_cfg,
        )
    )(T_hyp)
    costs = jnp.where(res.is_good, res.cost, jnp.inf)
    best = jnp.argmin(costs)
    pick = jnp.where(jnp.any(res.is_good), best, 0).astype(jnp.int32)
    return (
        ShapeOptResult(
            T_oc=res.T_oc[pick],
            code=res.code[pick],
            cost=res.cost[pick],
            is_good=res.is_good[pick],
        ),
        pick,
    )


@partial(jax.jit, static_argnames=("dec_cfg", "iters"))
def estimate_pose_cam_obj(
    params,
    dec_cfg: DeepSDFConfig,
    T_oc_init: jax.Array,
    code: jax.Array,  # fixed shape code
    pts_cam: jax.Array,
    pts_valid: jax.Array,
    iters: int = 5,
    huber: float = 0.05,
) -> tuple[jax.Array, jax.Array]:
    """Pose-only SE3 GN against a FIXED shape (reference `:47-93`).

    Returns (T_oc, final_cost).  Used for re-localizing an already
    reconstructed object in a new keyframe.
    """

    def f(xi, T_base):
        xi7 = jnp.concatenate([xi, jnp.zeros(1)])  # no scale update
        return losses.sdf_residuals(
            params, dec_cfg, xi7, code, T_base, pts_cam, pts_valid
        )

    def body(carry, _):
        T_base, lmbda, cost = carry
        xi0 = jnp.zeros(6)
        r = f(xi0, T_base)
        J = jax.jacfwd(f)(xi0, T_base)  # (P, 6)
        w = _huber_w(r, huber) * pts_valid
        H = jnp.einsum("pi,p,pj->ij", J, w, J)
        g = -jnp.einsum("pi,p->i", J, w * r)
        eye = jnp.eye(6)
        delta = jnp.linalg.solve(H + lmbda * H * eye + 1e-8 * eye, g)
        T_try = lie.exp_se3(delta) @ T_base
        r_try = f(jnp.zeros(6), T_try)
        c_try = jnp.sum(_huber_w(r_try, huber) * r_try * r_try)
        accept = c_try < cost
        return (
            jnp.where(accept, T_try, T_base),
            jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
            jnp.where(accept, c_try, cost),
        ), None

    r0 = f(jnp.zeros(6), T_oc_init)
    cost0 = jnp.sum(_huber_w(r0, huber) * r0 * r0)
    (T_oc, _, cost), _ = jax.lax.scan(
        body, (T_oc_init, jnp.asarray(1e-2), cost0), None, length=iters
    )
    return T_oc, cost
