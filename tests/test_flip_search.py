"""Flip-orientation search test (VERDICT round-1 Missing #1).

An object whose normalized-frame pose is initialized 180 deg off must
recover the correct orientation through the vmapped flip-hypothesis search
(reference: serial y-flip retries until `findGoodOrientation`,
`src/LocalMapping_util.cc:713-760`).  The fixture decoder is trained on a
single ASYMMETRIC shape (two fused spheres of different radii along x), so
a mirror-image fit cannot cheat its way to low cost.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qsp_slam_tpu  # noqa: F401
from qsp_slam_tpu.core import lie
from qsp_slam_tpu.models.deepsdf import DeepSDFConfig, decode_sdf, init_decoder
from qsp_slam_tpu.models.shape_opt import (
    ShapeOptConfig,
    reconstruct_object,
    reconstruct_object_flips,
)

CFG = DeepSDFConfig(code_dim=8, hidden=64, num_layers=6, latent_in=(3,))

C1 = jnp.asarray([-0.30, 0.0, 0.0])
C2 = jnp.asarray([0.45, 0.0, 0.0])
R1, R2 = 0.45, 0.22


def asym_sdf(p):
    d1 = jnp.linalg.norm(p - C1, axis=-1) - R1
    d2 = jnp.linalg.norm(p - C2, axis=-1) - R2
    return jnp.minimum(d1, d2)


def train_asym_decoder(key, steps=600, batch=512, lr=1e-3):
    import optax

    k_p, k_c, k_t = jax.random.split(key, 3)
    params = init_decoder(k_p, CFG)
    code = 0.01 * jax.random.normal(k_c, (CFG.code_dim,))

    opt = optax.adam(lr)
    state = opt.init((params, code))

    def loss_fn(pc, k):
        params, code = pc
        xyz = jax.random.uniform(k, (batch, 3), minval=-1.0, maxval=1.0)
        gt = jnp.clip(asym_sdf(xyz), -0.3, 0.3)
        pred = decode_sdf(params, CFG, code, xyz)
        return jnp.mean((pred - gt) ** 2) + 1e-4 * jnp.sum(code * code)

    @jax.jit
    def step(pc, state, k):
        l, g = jax.value_and_grad(loss_fn)(pc, k)
        up, state = opt.update(g, state)
        return optax.apply_updates(pc, up), state, l

    pc = (params, code)
    for _ in range(steps):
        k_t, k = jax.random.split(k_t)
        pc, state, _ = step(pc, state, k)
    return pc


def surface_points(key, n=256):
    """Sample the union-of-spheres surface (points inside the other sphere
    are rejected by the |sdf| gate)."""
    k1, k2 = jax.random.split(key)
    d = jax.random.normal(k1, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    half = n // 2
    pts = jnp.concatenate([C1 + R1 * d[:half], C2 + R2 * d[half:]])
    ok = jnp.abs(asym_sdf(pts)) < 1e-3
    return pts, ok


@pytest.fixture(scope="module")
def fixture():
    params, code = train_asym_decoder(jax.random.PRNGKey(3))
    pts_obj, ok = surface_points(jax.random.PRNGKey(4))
    # True camera->object transform: object 2 m in front of the camera.
    T_co = jnp.eye(4).at[2, 3].set(2.0)  # obj -> cam
    T_oc_true = lie.inv_se3(T_co)
    pts_cam = lie.transform_points(T_co, pts_obj)
    return params, code, T_oc_true, pts_cam, ok


def _run(params, T_init, pts_cam, ok, flips):
    R = 8
    rays = jnp.zeros((R, 3))
    zobs = jnp.zeros(R)
    rv = jnp.zeros(R, bool)
    # High w_code: the decoder was trained on ONE shape, but unconstrained
    # code directions can morph a mirror fit; pinning the code makes the
    # orientation carry the geometry (which is what the flip search is for).
    cfg = ShapeOptConfig(iters=12, w_render=0.0, num_flips=flips, w_code=3.0)
    code0 = jnp.zeros(CFG.code_dim)
    if flips == 1:
        res = reconstruct_object(
            params, CFG, T_init, code0, pts_cam, ok, rays, zobs, rv, cfg
        )
        return res, jnp.int32(0)
    return reconstruct_object_flips(
        params, CFG, T_init, code0, pts_cam, ok, rays, zobs, rv, cfg
    )


def _surface_error(params, res, pts_cam, ok):
    p_obj = lie.transform_points(res.T_oc, pts_cam)
    sdf = decode_sdf(params, CFG, res.code, p_obj)
    return float(jnp.median(jnp.abs(jnp.where(ok, sdf, 0.0))))


def _rot_angle_deg(T_a, T_b):
    """Angle between the rotation parts of two similarity transforms."""
    Ra = np.asarray(T_a)[:3, :3]
    Rb = np.asarray(T_b)[:3, :3]
    Ra = Ra / np.cbrt(np.linalg.det(Ra))
    Rb = Rb / np.cbrt(np.linalg.det(Rb))
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


@pytest.mark.slow
class TestFlipSearch:
    def test_180_off_recovers_with_flips(self, fixture):
        params, code, T_oc_true, pts_cam, ok = fixture
        flip180 = jnp.asarray(
            [[-1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, -1.0, 0], [0, 0, 0, 1.0]]
        )
        T_bad = flip180 @ T_oc_true

        res1, _ = _run(params, T_bad, pts_cam, ok, flips=1)
        res4, pick = _run(params, T_bad, pts_cam, ok, flips=4)

        # The flip search must pick the 180-deg hypothesis, fit the surface,
        # and recover the TRUE orientation...
        assert int(pick) == 2, int(pick)
        assert _surface_error(params, res4, pts_cam, ok) < 0.05
        assert _rot_angle_deg(res4.T_oc, T_oc_true) < 30.0
        # ...while the single-hypothesis run stays stuck near the mirror
        # (LM cannot rotate 180 deg out of a local minimum).
        assert _rot_angle_deg(res1.T_oc, T_oc_true) > 120.0
        assert float(res4.cost) < float(res1.cost)

    def test_correct_init_prefers_identity_flip(self, fixture):
        params, code, T_oc_true, pts_cam, ok = fixture
        res4, pick = _run(params, T_oc_true, pts_cam, ok, flips=4)
        assert int(pick) == 0, int(pick)
        assert _surface_error(params, res4, pts_cam, ok) < 0.05
