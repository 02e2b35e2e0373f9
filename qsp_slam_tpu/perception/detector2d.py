"""On-mesh 2D object detector (the reference's Detector2D seam, filled).

Parity: `reconstruct/detector2d.py:65-125` wraps a torch Mask-R-CNN and
emits per-frame {boxes, labels, probs, masks}.  A two-stage detector is the
wrong shape for a TPU SLAM loop (dynamic proposal counts, host NMS), so this
is a CenterNet-style fully-convolutional single shot head instead: one
static-shape forward pass, peak-NMS as a 3x3 max-pool equality, `top_k` to a
fixed detection budget — everything jit-compiled on the mesh, emitting the
same replay dict (`bbox`, `label`, `prob`, `valid`, `mask`) the pipeline's
cached-detection seam consumes.

Trained purely on the synthetic renderer's ground truth (`train_detector`),
the reference's `detect_online: true` mode becomes available without any
torch dependency: pass `detector=(params, cfg)` to `SlamSystem` and track
with `detections=None`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DetectorConfig(NamedTuple):
    num_classes: int = 3
    stride: int = 4  # backbone downsampling factor
    widths: tuple = (16, 32, 48)
    max_det: int = 8
    score_thr: float = 0.3
    input_hw: tuple = (480, 640)


def init_detector(key: jax.Array, cfg: DetectorConfig):
    """He-initialized conv pytree: strided stem + dilated trunk + 1x1 heads.

    Dilations 2/4/8 push the receptive field past ~250 input pixels so a
    stride-4 cell can see a whole object when regressing its size.
    """
    w0, w1, w2 = cfg.widths
    shapes = {
        "c1": (3, 3, 1, w0),
        "c2": (3, 3, w0, w1),
        "c3": (3, 3, w1, w2),
        "c4": (3, 3, w2, w2),  # dilation 2
        "c5": (3, 3, w2, w2),  # dilation 4
        "c6": (3, 3, w2, w2),  # dilation 8
        "hm": (1, 1, w2, cfg.num_classes),
        "sz": (1, 1, w2, 2),
        "off": (1, 1, w2, 2),
        "seg": (1, 1, w2, 1),
    }
    params = {}
    for i, (name, sh) in enumerate(shapes.items()):
        k = jax.random.fold_in(key, i)
        fan_in = sh[0] * sh[1] * sh[2]
        params[name + "_w"] = jax.random.normal(k, sh, jnp.float32) * jnp.sqrt(
            2.0 / fan_in
        )
        params[name + "_b"] = jnp.zeros(sh[-1], jnp.float32)
    # Focal-loss prior: start the heatmap near zero probability.
    params["hm_b"] = jnp.full(cfg.num_classes, -4.0, jnp.float32)
    return params


def _conv(x, w, b, stride=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def forward(params, cfg: DetectorConfig, gray: jax.Array):
    """gray (H, W) -> (hm, sz, off, seg) at stride `cfg.stride`."""
    x = gray[None, :, :, None].astype(jnp.float32) / 255.0 - 0.5
    x = jax.nn.relu(_conv(x, params["c1_w"], params["c1_b"], 2))
    x = jax.nn.relu(_conv(x, params["c2_w"], params["c2_b"], 2))
    x = jax.nn.relu(_conv(x, params["c3_w"], params["c3_b"]))
    x = jax.nn.relu(_conv(x, params["c4_w"], params["c4_b"], dilation=2) + x)
    x = jax.nn.relu(_conv(x, params["c5_w"], params["c5_b"], dilation=4) + x)
    x = jax.nn.relu(_conv(x, params["c6_w"], params["c6_b"], dilation=8) + x)
    hm = _conv(x, params["hm_w"], params["hm_b"])[0]
    sz = _conv(x, params["sz_w"], params["sz_b"])[0]
    off = _conv(x, params["off_w"], params["off_b"])[0]
    seg = _conv(x, params["seg_w"], params["seg_b"])[0, :, :, 0]
    return hm, sz, off, seg


# ---------------------------------------------------------------------------
# Training targets + loss (CenterNet penalty-reduced focal)
# ---------------------------------------------------------------------------

def _targets(cfg: DetectorConfig, bbox, label, valid, instance):
    """Gaussian-splatted heatmap + size/offset at centers + fg seg target."""
    H, W = cfg.input_hw
    s = cfg.stride
    Hs, Ws = H // s, W // s
    ys = jnp.arange(Hs, dtype=jnp.float32)[:, None]
    xs = jnp.arange(Ws, dtype=jnp.float32)[None, :]

    cx = (bbox[:, 0] + bbox[:, 2]) * 0.5 / s
    cy = (bbox[:, 1] + bbox[:, 3]) * 0.5 / s
    bw = jnp.maximum((bbox[:, 2] - bbox[:, 0]) / s, 1e-3)
    bh = jnp.maximum((bbox[:, 3] - bbox[:, 1]) / s, 1e-3)
    sigma = jnp.maximum(jnp.minimum(bw, bh) / 6.0, 1.0)

    def splat(d):
        g = jnp.exp(
            -((xs - cx[d]) ** 2 + (ys - cy[d]) ** 2) / (2.0 * sigma[d] ** 2)
        )
        g = jnp.where(valid[d], g, 0.0)
        return g[:, :, None] * jax.nn.one_hot(label[d], cfg.num_classes)

    hm_t = jnp.max(jax.vmap(splat)(jnp.arange(bbox.shape[0])), axis=0)

    ix = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, Ws - 1)
    iy = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, Hs - 1)
    # The exact center cell must be a full positive (the focal loss's pos set
    # is `hm_t == 1`; a continuous gaussian never hits 1 on the grid).
    hm_t = hm_t.at[iy, ix, label].max(valid.astype(jnp.float32))
    sz_t = jnp.stack([jnp.log(bw), jnp.log(bh)], -1)  # (D, 2)
    off_t = jnp.stack([cx - ix, cy - iy], -1)  # (D, 2)

    seg_t = (
        jnp.mean(
            (instance >= 0)
            .astype(jnp.float32)
            .reshape(Hs, s, Ws, s),
            axis=(1, 3),
        )
        > 0.5
    )
    return hm_t, (iy, ix, sz_t, off_t), seg_t


def detector_loss(params, cfg: DetectorConfig, gray, bbox, label, valid, instance):
    hm, sz, off, seg = forward(params, cfg, gray)
    hm_t, (iy, ix, sz_t, off_t), seg_t = _targets(
        cfg, bbox, label, valid, instance
    )
    p = jnp.clip(jax.nn.sigmoid(hm), 1e-4, 1.0 - 1e-4)
    pos = hm_t > 0.999
    focal_pos = -((1.0 - p) ** 2) * jnp.log(p) * pos
    focal_neg = -((1.0 - hm_t) ** 4) * (p ** 2) * jnp.log(1.0 - p) * (~pos)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    l_hm = (jnp.sum(focal_pos) + jnp.sum(focal_neg)) / n_pos

    w = valid.astype(jnp.float32)
    l_sz = jnp.sum(
        jnp.abs(sz[iy, ix] - sz_t).sum(-1) * w
    ) / jnp.maximum(w.sum(), 1.0)
    l_off = jnp.sum(
        jnp.abs(off[iy, ix] - off_t).sum(-1) * w
    ) / jnp.maximum(w.sum(), 1.0)

    st = seg_t.astype(jnp.float32)
    l_seg = jnp.mean(
        jnp.maximum(seg, 0) - seg * st + jnp.log1p(jnp.exp(-jnp.abs(seg)))
    )
    # Full-weight size term: box extents drive the downstream ellipsoid
    # fits, and at 0.1 the size head under-trains (matched-bbox IoU 0.69 ->
    # 0.75 at weight 1.0 on held-out views, same recall/FP).
    return l_hm + l_sz + l_off + l_seg


# ---------------------------------------------------------------------------
# Decode: peak NMS + top-k -> replay detection dict
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def detect_objects(params, cfg: DetectorConfig, gray: jax.Array) -> dict:
    """One frame -> {bbox, label, prob, valid, mask} (the replay format).

    `gray` may be any integer multiple of `cfg.input_hw` (e.g. a 480x640
    SLAM frame with a detector trained at 240x320): it is mean-pooled down
    for inference and boxes/masks are scaled back to the frame's resolution.
    """
    Hg, Wg = gray.shape
    H, W = cfg.input_hw
    ds = Hg // H
    if ds * H != Hg or ds * W != Wg:
        raise ValueError(f"frame {gray.shape} not a multiple of {cfg.input_hw}")
    if ds > 1:
        gray = jnp.mean(
            gray.astype(jnp.float32).reshape(H, ds, W, ds), axis=(1, 3)
        )
    s = cfg.stride
    hm, sz, off, seg = forward(params, cfg, gray)
    p = jax.nn.sigmoid(hm)
    keep = p == jax.lax.reduce_window(
        p, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME"
    )
    p = jnp.where(keep, p, 0.0)
    Hs, Ws, C = p.shape
    scores, flat = jax.lax.top_k(p.reshape(-1), cfg.max_det)
    cls = (flat % C).astype(jnp.int32)
    cell = flat // C
    iy = (cell // Ws).astype(jnp.int32)
    ix = (cell % Ws).astype(jnp.int32)
    o = off[iy, ix]
    wh = jnp.exp(sz[iy, ix]) * s
    cx = (ix.astype(jnp.float32) + o[:, 0]) * s
    cy = (iy.astype(jnp.float32) + o[:, 1]) * s
    bbox = jnp.stack(
        [
            jnp.clip(cx - wh[:, 0] / 2, 0, W - 1),
            jnp.clip(cy - wh[:, 1] / 2, 0, H - 1),
            jnp.clip(cx + wh[:, 0] / 2, 0, W - 1),
            jnp.clip(cy + wh[:, 1] / 2, 0, H - 1),
        ],
        -1,
    ) * ds
    valid = scores > cfg.score_thr
    fg = jax.image.resize(jax.nn.sigmoid(seg), (Hg, Wg), "nearest") > 0.5
    yy = jnp.arange(Hg, dtype=jnp.float32)[:, None]
    xx = jnp.arange(Wg, dtype=jnp.float32)[None, :]
    inside = (
        (xx >= bbox[:, None, None, 0])
        & (xx <= bbox[:, None, None, 2])
        & (yy >= bbox[:, None, None, 1])
        & (yy <= bbox[:, None, None, 3])
    )
    return {
        "bbox": bbox,
        "label": cls,
        "prob": jnp.where(valid, scores, 0.0),
        "valid": valid,
        "mask": inside & fg[None],
    }


# ---------------------------------------------------------------------------
# Weight persistence (mirrors detector3d's npz treatment; the reference
# loads pretrained checkpoints via `Detector2D.weight_path`,
# `reconstruct/detector2d.py:65-125`)
# ---------------------------------------------------------------------------

def save_detector2d(path: str, params, cfg: DetectorConfig) -> None:
    np.savez(
        path,
        __cfg__=np.asarray(
            [cfg.num_classes, cfg.stride, cfg.widths[0], cfg.widths[1],
             cfg.widths[2], cfg.max_det, cfg.score_thr, cfg.input_hw[0],
             cfg.input_hw[1]],
            np.float64,
        ),
        **{k: np.asarray(v) for k, v in params.items()},
    )


def load_detector2d(path: str):
    z = np.load(path)
    c = z["__cfg__"]
    cfg = DetectorConfig(
        num_classes=int(c[0]), stride=int(c[1]),
        widths=(int(c[2]), int(c[3]), int(c[4])),
        max_det=int(c[5]), score_thr=float(c[6]),
        input_hw=(int(c[7]), int(c[8])),
    )
    params = {k: jnp.asarray(z[k]) for k in z.files if k != "__cfg__"}
    return params, cfg


# ---------------------------------------------------------------------------
# Training on the synthetic renderer's ground truth
# ---------------------------------------------------------------------------

def train_detector(
    key: jax.Array,
    cfg: DetectorConfig = DetectorConfig(),
    steps: int = 600,
    num_objects: int = 4,
    scenes: int = 6,
    lr: float = 1e-3,
    intr=None,
):
    """Train on renderer GT: render + targets + update fused in ONE jit.

    Returns (params, losses).  Scenes rotate every few steps (same array
    shapes -> one compile); poses mix object-aimed look-ats (guaranteed
    positives) with orbit sweeps.  `intr` must match `cfg.input_hw` (defaults
    to the TUM intrinsics at 480x640).
    """
    import optax

    from ..data.render import gt_detections, make_scene, orbit_trajectory, render_scene
    from ..slam.tracking import TrackingConfig

    if intr is None:
        intr = TrackingConfig().intr
    H, W = cfg.input_hw
    params = init_detector(key, cfg)
    opt = optax.adam(
        optax.cosine_decay_schedule(lr, steps, alpha=0.1)
    )
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, scene, T_cw):
        gray, _, inst = render_scene(scene, T_cw, intr, height=H, width=W)
        det = gt_detections(scene, T_cw, intr, width=W, height=H)
        loss, grads = jax.value_and_grad(detector_loss)(
            params, cfg, gray, det["bbox"], det["label"], det["valid"], inst
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    from ..data.synthetic import _lookat

    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    scene_list = [
        make_scene(num_objects=num_objects, seed=100 + i) for i in range(scenes)
    ]
    losses = []
    for i in range(steps):
        scene = scene_list[(i // 4) % scenes]
        if rng.random() < 0.75:
            # Object-aimed pose: guarantees positives in most frames.
            c = np.asarray(scene.ellipsoids[int(rng.integers(num_objects)), :3])
            off = np.array([
                rng.uniform(-2.0, 2.0),
                rng.uniform(-1.8, -0.4),  # above the object (y down)
                rng.uniform(-4.8, -1.2),
            ])
            T_cw = jnp.asarray(
                _lookat(c + off, c + rng.normal(0, 0.15, 3)), jnp.float32
            )
        else:
            traj = orbit_trajectory(
                64, step=0.03, pitch=float(rng.uniform(0.25, 0.45))
            )
            T_cw = jnp.asarray(traj[int(rng.integers(0, 64))])
        params, opt_state, loss = step(params, opt_state, scene, T_cw)
        losses.append(float(loss))
    return params, losses
