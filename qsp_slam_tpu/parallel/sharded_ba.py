"""Distributed bundle adjustment: residual blocks sharded over a device mesh.

The reference is a single-process shared-memory system (SURVEY.md §2.7 — no
distributed capability).  The TPU-native scaling story for this workload is
DATA PARALLELISM OVER RESIDUAL BLOCKS: reprojection edges are sharded across
devices; each device accumulates its partial normal-equation blocks
(H_cc, b_c, H_pp, b_p, B_nk); one `psum` over the mesh reduces them; the
small dense Schur solve runs replicated (identical on every device — no
broadcast needed).  Per LM iteration the only communication is that psum,
which rides ICI.

The same structure extends to multi-host (DCN) by putting hosts on the same
mesh axis via `jax.distributed`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import lie
from ..core.camera import Intrinsics
from ..opt import robust
from ..opt.reproj import ReprojEdges, residuals_and_jacobians
from ..opt.schur import build_normal_blocks, solve_schur, NormalBlocks
from .mesh import make_mesh


def pad_edges_for_mesh(edges: ReprojEdges, num_shards: int) -> ReprojEdges:
    """Pad the edge table so its length divides the mesh axis size."""
    E = edges.kf_idx.shape[0]
    Ep = -(-E // num_shards) * num_shards
    if Ep == E:
        return edges
    pad = Ep - E

    def padf(x, fill=0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    return ReprojEdges(
        kf_idx=padf(edges.kf_idx),
        pt_idx=padf(edges.pt_idx),
        uv=padf(edges.uv),
        u_right=padf(edges.u_right, -1.0),
        inv_sigma2=padf(edges.inv_sigma2),
        valid=padf(edges.valid, False),
    )


def sharded_local_ba(
    mesh: Mesh,
    Tcw: jax.Array,
    points: jax.Array,
    cam_fixed: jax.Array,
    edges: ReprojEdges,
    intr: Intrinsics,
    baseline_fx: float = 0.0,
    iters: int = 10,
    use_huber: bool = True,
    axis: str = "edges",
    pre_padded: bool = False,
):
    """LM bundle adjustment with edges sharded over `mesh[axis]`.

    Returns (Tcw, points, cost).  All state arrays are replicated; only the
    edge table is sharded.  One psum of the normal blocks per iteration.

    `pre_padded=True` skips host-side padding — required when the caller
    already built GLOBAL arrays for a multi-process mesh
    (`parallel/multihost.global_ba_inputs`), where per-process jnp.pad of a
    cross-host array is ill-defined.
    """
    K = Tcw.shape[0]
    N = points.shape[0]
    if not pre_padded:
        edges = pad_edges_for_mesh(edges, mesh.shape[axis])

    rep = P()
    shd = P(axis)
    edge_specs = ReprojEdges(shd, shd, shd, shd, shd, shd)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, edge_specs),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    def run(Tcw0, points0, cam_fixed0, e):
        # Computed inside the shard (not eagerly on the host): the edge table
        # may be a cross-process global array that no one process fully holds.
        d2 = jnp.where(e.is_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
        def cost_at(T, p):
            r, _, _, row_mask, _ = residuals_and_jacobians(T, p, e, intr, baseline_fx)
            chi2 = jnp.sum(r * r * row_mask, axis=-1) * e.inv_sigma2
            c = jnp.where(use_huber, robust.huber_rho(chi2, d2), chi2)
            local = jnp.sum(jnp.where(row_mask[..., 0] > 0, c, 0.0))
            return jax.lax.psum(local, axis)

        def body(carry, _):
            T, p, lmbda, cost = carry
            r, Jc, Jp, row_mask, _ = residuals_and_jacobians(T, p, e, intr, baseline_fx)
            chi2 = jnp.sum(r * r * row_mask, axis=-1) * e.inv_sigma2
            w_edge = jnp.where(
                use_huber, robust.huber_weight(chi2, d2), jnp.ones_like(chi2)
            )
            w_row = row_mask * (e.inv_sigma2 * w_edge)[:, None]
            blocks = build_normal_blocks(
                r, Jc, Jp, w_row, e.kf_idx, e.pt_idx, K, N, cam_fixed0
            )
            blocks = NormalBlocks(*(jax.lax.psum(b, axis) for b in blocks))
            delta_c, delta_p = solve_schur(blocks, lmbda, cam_fixed0)
            T_try = lie.exp_se3(delta_c) @ T
            p_try = p + delta_p
            new_cost = cost_at(T_try, p_try)
            accept = new_cost < cost
            return (
                jnp.where(accept, T_try, T),
                jnp.where(accept, p_try, p),
                jnp.clip(jnp.where(accept, lmbda * 0.33, lmbda * 3.0), 1e-7, 1e6),
                jnp.where(accept, new_cost, cost),
            ), None

        cost0 = cost_at(Tcw0, points0)
        init = (Tcw0, points0, jnp.asarray(1e-3, Tcw0.dtype), cost0)
        (T, p, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
        return T, p, cost

    return run(Tcw, points, cam_fixed, edges)


def make_edge_mesh(num_devices: int | None = None, axis: str = "edges") -> Mesh:
    return make_mesh(num_devices, axis)
