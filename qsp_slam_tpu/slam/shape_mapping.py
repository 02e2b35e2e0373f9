"""Per-object DeepSDF reconstruction inside the mapping loop.

Parity: `LocalMapping::ProcessDetectedObjects` (`src/LocalMapping_util.cc:
361-871`): at a keyframe cadence, each associated object gathers surface
points + rays from the current depth, initializes its normalized-frame pose
from the ellipsoid (`MapObject::SetPoseByEllipsold`, `src/MapObject.cc:495` —
including the 0.4/0.6-style scale margin), and runs the joint pose+code GN
(`reconstruct_object`).  Where the reference loops objects serially and
retries 4 flips one by one, here ALL due objects (x their flip hypotheses if
enabled) reconstruct in one vmapped call.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie, quadric
from ..core.camera import Intrinsics, backproject, pixel_rays
from ..models.deepsdf import DeepSDFConfig
from ..models.shape_opt import (
    ShapeOptConfig,
    ShapeOptResult,
    reconstruct_object,
)
from .objects import ObjectTable

SCALE_MARGIN = 1.4  # ellipsoid max-half-axis -> unit-sphere scale margin
# (role of the reference's 0.40*s ShapeNet-frame scaling, adapted to the
# unit-sphere normalization of our decoder family)


class ShapeInputs(NamedTuple):
    T_oc_init: jax.Array  # (O, 4, 4)
    pts_cam: jax.Array  # (O, P, 3)
    pts_ok: jax.Array  # (O, P) surface (foreground) points for the SDF term
    rays: jax.Array  # (O, P, 3)
    depth_obs: jax.Array  # (O, P)
    rays_ok: jax.Array  # (O, P) fg+bg rays for the render (free-space) term
    due: jax.Array  # (O,)


@partial(jax.jit, static_argnames=("num_samples",))
def gather_shape_inputs(
    table: ObjectTable,
    Tcw: jax.Array,
    depth: jax.Array,  # (H, W)
    ground_cam: jax.Array,  # (4,)
    intr: Intrinsics,
    key: jax.Array,
    det_masks: jax.Array | None = None,  # (D, H, W) bool instance masks
    det_assoc: jax.Array | None = None,  # (D,) object slot per detection, -1
    num_samples: int = 256,
    recon_every: int = 2,
    min_obs: int = 2,
) -> ShapeInputs:
    """Sample per-object surface points/rays from the current keyframe.

    With instance masks (`det_masks` + the detection->object association),
    bbox samples are separated the way the reference separates them
    (`reconstruct/mono_sequence.py:141-154`): only pixels on THIS object's
    mask become SDF surface points, while every bbox pixel with valid depth
    stays a render-term ray — background rays carve free space instead of
    polluting the surface term.  Without masks both sets fall back to the
    geometric gate alone.
    """
    H, W = depth.shape
    O = table.ellipsoid.shape[0]
    owner = None
    if det_masks is not None and det_assoc is not None:
        # Per-pixel owning object slot (-1 = background / unassociated).
        owner = jnp.full((H, W), -1, jnp.int32)
        for d in range(det_masks.shape[0]):  # D is static, small
            claim = det_masks[d] & (det_assoc[d] >= 0)
            owner = jnp.where(claim, det_assoc[d], owner)
    e_cam = quadric.transform_ellipsoid(table.ellipsoid, Tcw[None])
    bbox = quadric.project_bbox(e_cam, jnp.eye(4, dtype=Tcw.dtype), intr.K)
    front = quadric.check_observability(table.ellipsoid, Tcw[None])
    due = (
        table.valid
        & front
        & (table.obs_count >= min_obs)
        & ((table.obs_count % recon_every) == 0)
    )

    def per_object(o):
        b = bbox[o]
        k = jax.random.fold_in(key, o)
        u = jax.random.uniform(k, (num_samples,), minval=b[0], maxval=b[2])
        v = jax.random.uniform(
            jax.random.fold_in(k, 1), (num_samples,), minval=b[1], maxval=b[3]
        )
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        z = depth[vi, ui]
        uv = jnp.stack([ui, vi], -1).astype(depth.dtype)
        pts = backproject(uv, z, intr)
        gdist = pts @ ground_cam[:3] + ground_cam[3]
        # keep points near the predicted ellipsoid (within 1.5x its radius)
        c_cam = e_cam[o, 0:3]
        rad = jnp.max(e_cam[o, 6:9]) * 1.5
        geom_ok = (
            (z > 0.1)
            & (gdist > 0.03)
            & (jnp.linalg.norm(pts - c_cam, axis=-1) < rad)
        )
        if owner is not None:
            fg = owner[vi, ui] == o
            ok = geom_ok & fg
            # fg + bg rays: any bbox pixel with a real depth reading teaches
            # the render term (bg observations carve free space).
            ray_ok = z > 0.1
        else:
            ok = geom_ok
            ray_ok = geom_ok
        rays = pixel_rays(uv, intr)
        return pts, ok, rays, z, ray_ok

    pts, ok, rays, z, ray_ok = jax.vmap(per_object)(jnp.arange(O))

    # Initial normalized-frame pose from the ellipsoid: unit sphere -> world
    # is sim(R_e, s = SCALE_MARGIN * max_half) at the ellipsoid center.
    R_e = quadric.euler_to_rotmat(table.ellipsoid[:, 3:6])
    s = jnp.max(table.ellipsoid[:, 6:9], axis=-1) * SCALE_MARGIN
    sR = R_e * s[:, None, None]
    T_ow_sim = jax.vmap(lie.inv_sim3)(
        jax.vmap(lie.rt_to_se3)(sR, table.ellipsoid[:, 0:3])
    )  # world -> normalized object
    T_oc = jnp.einsum("oij,jk->oik", T_ow_sim, lie.inv_se3(Tcw))
    return ShapeInputs(
        T_oc_init=T_oc, pts_cam=pts, pts_ok=ok & due[:, None],
        rays=rays, depth_obs=z, rays_ok=ray_ok & due[:, None], due=due,
    )


@partial(jax.jit, static_argnames=("dec_cfg", "opt_cfg"))
def reconstruct_due_objects(
    table: ObjectTable,
    inputs: ShapeInputs,
    params,
    dec_cfg: DeepSDFConfig,
    Tcw: jax.Array,
    opt_cfg: ShapeOptConfig = ShapeOptConfig(),
) -> ObjectTable:
    """vmapped joint pose+code GN over all due objects x their
    `opt_cfg.num_flips` orientation hypotheses in ONE call; the lowest-cost
    converged hypothesis per object is folded back (the reference's serial
    per-object per-flip loop, `src/LocalMapping_util.cc:713-760`).

    The (objects, flips) grid is FLATTENED to one batch axis and evaluated
    in `batch_size=O` chunks via `lax.map` — a nested vmap (objects over a
    flips-vmap around the LM while-loop) produces HLO the TPU compiler
    chokes on, and a single full-width vmap holds F x the round-1 jacfwd
    working set (the decoder tangent batch is ~2.3 GB per O-wide chunk;
    4 flips at once exceeds v5e HBM).  Chunking trades F sequential passes
    for bounded peak memory inside ONE jit."""
    from ..models.shape_opt import flip_hypotheses

    O = table.code.shape[0]
    F = max(1, opt_cfg.num_flips)
    T_hyp = jax.vmap(flip_hypotheses, in_axes=(0, None))(
        inputs.T_oc_init, F
    )  # (O, F, 4, 4)

    def flat(x, reps):
        return jnp.repeat(x, reps, axis=0)

    res_f = jax.lax.map(
        lambda args: reconstruct_object(
            params, dec_cfg, args[0], args[1], args[2], args[3], args[4],
            args[5], args[6], opt_cfg,
        ),
        (
            T_hyp.reshape(O * F, 4, 4),
            flat(table.code, F), flat(inputs.pts_cam, F),
            flat(inputs.pts_ok, F), flat(inputs.rays, F),
            flat(inputs.depth_obs, F), flat(inputs.rays_ok, F),
        ),
        batch_size=O,
    )
    # Per-object best converged hypothesis.
    costs = jnp.where(res_f.is_good, res_f.cost, jnp.inf).reshape(O, F)
    best = jnp.argmin(costs, axis=1)
    pick = jnp.where(
        jnp.any(res_f.is_good.reshape(O, F), axis=1), best, 0
    ).astype(jnp.int32)
    sel = jnp.arange(O) * F + pick
    res = ShapeOptResult(
        T_oc=res_f.T_oc[sel], code=res_f.code[sel],
        cost=res_f.cost[sel], is_good=res_f.is_good[sel],
    )
    good = inputs.due & res.is_good
    T_ow_new = jnp.einsum("oij,jk->oik", res.T_oc, Tcw)  # (cam->obj) @ (w->cam)
    return table._replace(
        code=jnp.where(good[:, None], res.code, table.code),
        Tow_shape=jnp.where(good[:, None, None], T_ow_new, table.Tow_shape),
        shape_ok=table.shape_ok | good,
    )
