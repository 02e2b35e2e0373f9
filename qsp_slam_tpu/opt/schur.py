"""Schur-complement normal equations for bundle adjustment.

Replaces g2o's sparse-Cholesky BA core (`src/Optimizer.cc`,
`Thirdparty/g2o`) with a TPU-native formulation:

  * per-edge residual/Jacobian blocks live in SoA arrays (E rows),
  * normal-equation blocks form via `segment_sum` (no graph pointers),
  * points are marginalized in closed form (3x3 block inverses),
  * the reduced camera system S is assembled DENSELY (6K x 6K) through a
    point-x-camera incidence tensor — pure matmuls, no scatters, exactly the
    shape the MXU wants.  Local BA has K ~ 10-50 cameras, so dense S is both
    faster and simpler than sparse factorization; the distributed path
    (parallel/) swaps this for matrix-free PCG with psum.

Fixed cameras (the anchor keyframes of `Optimizer::LocalBundleAdjustment`,
`src/Optimizer.cc:458-784`) keep their point contributions but receive no
update: their Jc is zeroed at the source and S gets an identity block.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NormalBlocks(NamedTuple):
    H_cc: jax.Array  # (K, 6, 6) camera diagonal blocks
    b_c: jax.Array  # (K, 6)    camera rhs (-J^T W r)
    H_pp: jax.Array  # (N, 3, 3) point diagonal blocks
    b_p: jax.Array  # (N, 3)    point rhs
    B_nk: jax.Array  # (N, K, 6, 3) camera-point coupling, grouped by point


def build_normal_blocks(
    r: jax.Array,
    Jc: jax.Array,
    Jp: jax.Array,
    w: jax.Array,
    kf_idx: jax.Array,
    pt_idx: jax.Array,
    num_cams: int,
    num_points: int,
    cam_fixed: jax.Array,
) -> NormalBlocks:
    """Accumulate weighted normal-equation blocks from per-edge Jacobians.

    r (E, R), Jc (E, R, 6), Jp (E, R, 3), w (E, R) per-row weights
    (robust weight x information x validity mask).
    """
    free = 1.0 - cam_fixed.astype(r.dtype)
    Jc = Jc * free[kf_idx][:, None, None]

    JcW = Jc * w[..., None]  # (E, R, 6)
    JpW = Jp * w[..., None]
    H_cc_e = jnp.einsum("era,erb->eab", JcW, Jc)  # (E, 6, 6)
    H_pp_e = jnp.einsum("era,erb->eab", JpW, Jp)  # (E, 3, 3)
    B_e = jnp.einsum("era,erb->eab", JcW, Jp)  # (E, 6, 3)
    b_c_e = -jnp.einsum("era,er->ea", JcW, r)  # (E, 6)
    b_p_e = -jnp.einsum("era,er->ea", JpW, r)  # (E, 3)

    H_cc = jax.ops.segment_sum(H_cc_e, kf_idx, num_segments=num_cams)
    b_c = jax.ops.segment_sum(b_c_e, kf_idx, num_segments=num_cams)
    H_pp = jax.ops.segment_sum(H_pp_e, pt_idx, num_segments=num_points)
    b_p = jax.ops.segment_sum(b_p_e, pt_idx, num_segments=num_points)
    # Couplings grouped by (point, camera) — a point sees a camera at most once,
    # so this segment_sum is effectively a layout transform.
    nk = pt_idx * num_cams + kf_idx
    B_nk = jax.ops.segment_sum(B_e, nk, num_segments=num_points * num_cams)
    B_nk = B_nk.reshape(num_points, num_cams, 6, 3)
    return NormalBlocks(H_cc, b_c, H_pp, b_p, B_nk)


def point_slot_table(
    pt_idx: jax.Array, valid: jax.Array, num_points: int, slots: int
) -> jax.Array:
    """Edge list -> per-point edge-slot table (N, S) of edge ids (-1 = empty).

    Built ONCE per BA stage (the edge structure is fixed across LM
    iterations); lets the normal-block build below run scatter-free: TPU
    scatters serialize, gathers and one-hot matmuls pipeline.
    Points with more than `slots` observations silently drop the excess
    (choose `slots` >= the expected max observations per point).
    """
    E = pt_idx.shape[0]
    key = jnp.where(valid, pt_idx, num_points)
    order = jnp.argsort(key)
    sorted_pt = key[order]
    first = jnp.searchsorted(sorted_pt, jnp.arange(num_points + 1))
    pos = jnp.arange(E) - first[jnp.clip(sorted_pt, 0, num_points)]
    ok = (sorted_pt < num_points) & (pos < slots)
    row = jnp.where(ok, sorted_pt, num_points)  # park rejects in a dump row
    col = jnp.clip(pos, 0, slots - 1)
    table = jnp.full((num_points + 1, slots), -1, jnp.int32)
    table = table.at[row, col].set(jnp.where(ok, order.astype(jnp.int32), -1))
    return table[:num_points]


def build_normal_blocks_fast(
    r: jax.Array,
    Jc: jax.Array,
    Jp: jax.Array,
    w: jax.Array,
    kf_idx: jax.Array,
    slot_table: jax.Array,  # (N, S) from point_slot_table
    num_cams: int,
    cam_fixed: jax.Array,
    low_precision: bool = False,
) -> NormalBlocks:
    """Scatter-free normal blocks: gathers + one-hot contractions only.

    Semantics match `build_normal_blocks` given a complete slot table.
    `low_precision` casts the per-edge operands to bfloat16 (block sums
    still accumulate f32 via preferred_element_type) — the round-4 BA
    profile's second lever; see RESULTS for the measurement.
    """
    N, S = slot_table.shape
    free = 1.0 - cam_fixed.astype(r.dtype)
    Jc = Jc * free[kf_idx][:, None, None]
    JcW = Jc * w[..., None]
    JpW = Jp * w[..., None]
    if low_precision:
        bf = jnp.bfloat16
        r, Jc, Jp, JcW, JpW = (
            x.astype(bf) for x in (r, Jc, Jp, JcW, JpW)
        )

    f32 = jnp.float32
    # Camera-side sums via one-hot contraction over the K axis (K is small).
    onehot_k = jax.nn.one_hot(kf_idx, num_cams, dtype=r.dtype)  # (E, K)
    H_cc = jnp.einsum("era,erb,ek->kab", JcW, Jc, onehot_k,
                      preferred_element_type=f32)
    b_c = -jnp.einsum("era,er,ek->ka", JcW, r, onehot_k,
                      preferred_element_type=f32)

    # Point-side sums via the slot table (gather + sum over S).
    eid = slot_table  # (N, S)
    mask = (eid >= 0).astype(r.dtype)[..., None]
    eid_c = jnp.clip(eid, 0)
    Jp_g = Jp[eid_c] * mask[..., None]  # (N, S, R, 3)
    JpW_g = JpW[eid_c] * mask[..., None]
    r_g = r[eid_c] * mask  # (N, S, R)
    JcW_g = JcW[eid_c] * mask[..., None]  # (N, S, R, 6)
    H_pp = jnp.einsum("nsra,nsrb->nab", JpW_g, Jp_g,
                      preferred_element_type=f32)
    b_p = -jnp.einsum("nsra,nsr->na", JpW_g, r_g,
                      preferred_element_type=f32)
    onehot_nk = jax.nn.one_hot(kf_idx[eid_c], num_cams, dtype=r.dtype)  # (N,S,K)
    B_nk = jnp.einsum("nsra,nsrb,nsk->nkab", JcW_g, Jp_g, onehot_nk,
                      preferred_element_type=f32)
    return NormalBlocks(H_cc, b_c, H_pp, b_p, B_nk)


def _inv3x3_spd(A: jax.Array, lm_lambda: jax.Array) -> jax.Array:
    """Batched inverse of Marquardt-damped SPD 3x3 blocks (..., 3, 3).

    Damping is multiplicative on the diagonal (A + lambda diag(A)), matching
    g2o's Levenberg schedule, plus a tiny absolute floor so all-zero blocks
    (capacity padding: points with no valid observations) stay invertible.

    Closed-form adjugate inverse: `jnp.linalg.inv` lowers to a serialized
    batched LU that costs ~2 ms for 2000 blocks on TPU; the cofactor form is
    ~50 VPU flops per block and fuses with its consumers.
    """
    eye = jnp.eye(3, dtype=A.dtype)
    A = A + lm_lambda * A * eye + 1e-6 * eye
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    C00 = e * i - f * h
    C01 = c * h - b * i
    C02 = b * f - c * e
    C10 = f * g - d * i
    C11 = a * i - c * g
    C12 = c * d - a * f
    C20 = d * h - e * g
    C21 = b * g - a * h
    C22 = a * e - b * d
    det = a * C00 + b * C10 + c * C20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([C00, C01, C02], axis=-1),
            jnp.stack([C10, C11, C12], axis=-1),
            jnp.stack([C20, C21, C22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def solve_dense_pose_system(
    S: jax.Array,  # (V, 6, V, 6) damped normal/Schur system over pose vertices
    rhs: jax.Array,  # (V, 6)
    fixed_v: jax.Array,  # (V,) bool
) -> jax.Array:
    """Dense solve over V stacked 6-DoF pose vertices -> delta (V, 6).

    Fixed vertices get identity rows/columns and zero rhs; the system is
    symmetrized (f32 einsum noise) and Jacobi-scaled to unit diagonal so the
    f32 Cholesky survives the ~1e9 raw condition number of vision Hessians.
    Shared by the joint camera-object solver (opt/joint_ba.py) and the
    map-sharded joint global BA (parallel/map_sharded_ba.py).
    """
    V = S.shape[0]
    dtype = S.dtype
    fixed6 = jnp.repeat(fixed_v, 6)
    Sf = S.reshape(V * 6, V * 6)
    Sf = jnp.where(fixed6[:, None] | fixed6[None, :], 0.0, Sf)
    Sf = Sf + jnp.diag(fixed6.astype(dtype))
    rhs = rhs * (1.0 - fixed_v.astype(dtype))[:, None]
    Sf = 0.5 * (Sf + Sf.T)
    d = jnp.diagonal(Sf)
    dinv = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
    S_sc = Sf * dinv[:, None] * dinv[None, :]
    chol, low = jax.scipy.linalg.cho_factor(S_sc, lower=True)
    y = jax.scipy.linalg.cho_solve((chol, low), rhs.reshape(-1) * dinv)
    return (y * dinv).reshape(V, 6)


def solve_reduced_camera(
    H_cc: jax.Array,  # (K, 6, 6) camera diagonal blocks (undamped)
    U: jax.Array,  # (K, 6, K, 6) sum_n B[n,k1] Y_n B[n,k2]^T
    rhs: jax.Array,  # (K, 6)  b_c - sum_n B[n,k] Y_n b_p[n]
    lm_lambda: jax.Array,
    cam_fixed: jax.Array,
) -> jax.Array:
    """Dense solve of the Schur-reduced camera system -> delta_c (K, 6).

    Split out of `solve_schur` so the distributed paths (`parallel/`) can
    psum the U / rhs partials across shards and run this replicated.
    """
    K = H_cc.shape[0]
    dtype = H_cc.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    H_cc_d = H_cc + lm_lambda * H_cc * eye6  # Marquardt damping
    S = -U.reshape(K * 6, K * 6)
    # Add the block-diagonal H_cc.
    idx = jnp.arange(K)
    S = S.reshape(K, 6, K, 6).at[idx, :, idx, :].add(H_cc_d).reshape(K * 6, K * 6)

    # Fixed cameras: identity block, zero rhs (their H/B rows are already 0).
    fixed6 = jnp.repeat(cam_fixed, 6)
    S = jnp.where(fixed6[:, None] | fixed6[None, :], 0.0, S)
    S = S + jnp.diag(fixed6.astype(dtype))
    rhs = rhs * (1.0 - cam_fixed.astype(dtype))[:, None]

    # Symmetrize (f32 einsum noise) and Jacobi-scale to unit diagonal so the
    # f32 Cholesky survives the ~1e9 raw condition number of vision Hessians.
    S = 0.5 * (S + S.T)
    d = jnp.diagonal(S)
    dinv = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
    S_sc = S * dinv[:, None] * dinv[None, :]
    chol, low = jax.scipy.linalg.cho_factor(S_sc, lower=True)
    y = jax.scipy.linalg.cho_solve((chol, low), rhs.reshape(-1) * dinv)
    return (y * dinv).reshape(K, 6)


def solve_schur(
    blocks: NormalBlocks,
    lm_lambda: jax.Array,
    cam_fixed: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Marginalize points, solve the reduced camera system, back-substitute.

    Returns (delta_c (K, 6), delta_p (N, 3)).  `lm_lambda` is the
    Levenberg-Marquardt additive damping applied to both H_cc and H_pp
    diagonals.
    """
    Y = _inv3x3_spd(blocks.H_pp, lm_lambda)  # (N, 3, 3)
    A = jnp.einsum("nkac,ncd->nkad", blocks.B_nk, Y)  # (N, K, 6, 3)
    # U[k1, k2] = sum_n B[n,k1] Y_n B[n,k2]^T
    U = jnp.einsum("nkad,nqbd->kaqb", A, blocks.B_nk)  # (K, 6, K, 6)

    # rhs_schur[k] = b_c[k] - sum_n B[n,k] Y_n b_p[n]
    Yb = jnp.einsum("nab,nb->na", Y, blocks.b_p)  # (N, 3)
    rhs = blocks.b_c - jnp.einsum("nkac,nc->ka", blocks.B_nk, Yb)  # (K, 6)

    delta_c = solve_reduced_camera(blocks.H_cc, U, rhs, lm_lambda, cam_fixed)

    # Back-substitution: delta_p = Y (b_p - sum_k B[n,k]^T delta_c[k])
    Bt_dc = jnp.einsum("nkac,ka->nc", blocks.B_nk, delta_c)  # (N, 3)
    delta_p = jnp.einsum("nab,nb->na", Y, blocks.b_p - Bt_dc)
    return delta_c, delta_p
