"""On-mesh learned 3D object detector (the reference's Detector3D seam).

Parity: `reconstruct/detector3d.py:29-68` wraps an mmdetection3d
PointPillars/SECOND model and returns 7-DoF car boxes from a velodyne scan;
`qsp_slam.cc` feeds those boxes to the object pipeline.  This is the same
capability as one TPU-native program:

- **Pillar encoder**: PointPillars' per-point MLP + per-pillar max-pool,
  organized for the MXU — the point MLP is two (N, C) matmuls, and the pillar
  pooling is ONE scatter-max into a dense BEV canvas instead of the CUDA
  gather-into-(P, N)-pillars layout (packed pillars exist to dodge a dense
  canvas on GPUs; on TPU one scatter per keyframe is cheap and everything
  downstream is convs on a static-shape image).
- **BEV backbone**: strided stem + dilated residual trunk (static shapes,
  XLA-fused convs).
- **CenterPoint-style head**: class heatmap + sub-cell offset + height +
  log-size + yaw on the BEV grid; decode = 3x3 peak-NMS as a max-pool
  equality + `top_k` to a fixed budget.  No anchors, no dynamic-shape NMS.

Everything runs in the camera frame (x right, y down, z forward); the BEV
grid spans (x, z) and yaw rotates about the vertical.  Yaw is regressed as
(sin 2θ, cos 2θ): boxes are π-symmetric and the ellipsoid landmark this
feeds (`core/quadric`) carries no heading sign either.

Trained purely on procedurally generated scans (`train_detector3d`): boxes
on a ground plane + ground returns + non-car clutter (poles/walls) teach
both detection and rejection without any external dataset or torch
dependency.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Detector3DConfig(NamedTuple):
    grid: int = 128           # BEV cells per side (z forward, x lateral)
    cell: float = 0.325       # meters per BEV cell
    x_min: float = -20.8      # lateral extent: [x_min, x_min + grid*cell]
    z_min: float = 0.0        # forward extent: [z_min, z_min + grid*cell]
    y_range: tuple = (-3.0, 2.2)  # vertical gate (camera y, down-positive)
    ground_y: float = 1.65    # ground height below camera (training scenes)
    channels: int = 32        # pillar feature width
    widths: tuple = (32, 48)  # backbone widths after the stride-2 stem
    num_classes: int = 1      # car (reference keeps only label 0)
    max_det: int = 8
    score_thr: float = 0.3


class Boxes3D(NamedTuple):
    """Decoded 7-DoF boxes, camera frame (≙ reference `boxes_3d` tensor)."""

    center: jax.Array  # (D, 3)
    size: jax.Array    # (D, 3) full extents along local (x, y, z) at yaw=0
    yaw: jax.Array     # (D,) rotation about camera y (mod π)
    label: jax.Array   # (D,) int32
    prob: jax.Array    # (D,)
    valid: jax.Array   # (D,) bool


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_detector3d(key: jax.Array, cfg: Detector3DConfig):
    C = cfg.channels
    w0, w1 = cfg.widths
    shapes = {
        "p1": (6, C),          # point MLP (dense)
        "p2": (C, C),
        "c1": (3, 3, C, w0),   # stride-2 stem
        "c2": (3, 3, w0, w1),
        "c3": (3, 3, w1, w1),  # dilation 2
        "c4": (3, 3, w1, w1),  # dilation 4
        "hm": (1, 1, w1, cfg.num_classes),
        "off": (1, 1, w1, 2),  # sub-cell (dx, dz) of the center
        "ycen": (1, 1, w1, 1),
        "sz": (1, 1, w1, 3),   # log full extents
        "yaw": (1, 1, w1, 2),  # (sin 2θ, cos 2θ)
    }
    params = {}
    for i, (name, sh) in enumerate(shapes.items()):
        k = jax.random.fold_in(key, i)
        fan_in = int(np.prod(sh[:-1]))
        params[name + "_w"] = jax.random.normal(k, sh, jnp.float32) * jnp.sqrt(
            2.0 / fan_in
        )
        params[name + "_b"] = jnp.zeros(sh[-1], jnp.float32)
    params["hm_b"] = jnp.full(cfg.num_classes, -4.0, jnp.float32)
    return params


def _conv(x, w, b, stride=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


# ---------------------------------------------------------------------------
# Pillar encoder: point MLP (matmuls) + scatter-max pooling to the canvas
# ---------------------------------------------------------------------------

def pillar_canvas(params, cfg: Detector3DConfig, pts: jax.Array, valid: jax.Array):
    """Points (N, 3) + valid (N,) -> BEV canvas (grid, grid, C).

    Per-point features: offsets to the pillar center, height, and normalized
    absolute position — the PillarFeatureNet input set minus the
    offsets-to-pillar-mean terms (those need a second scatter pass and buy
    little at 0.325 m pillars).  Features are ReLU (≥ 0), so the scatter-max
    identity of an empty pillar is exactly the zero vector.
    """
    G, cell = cfg.grid, cfg.cell
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    fx = (x - cfg.x_min) / cell
    fz = (z - cfg.z_min) / cell
    ix = jnp.floor(fx).astype(jnp.int32)
    iz = jnp.floor(fz).astype(jnp.int32)
    ok = (
        valid
        & (ix >= 0) & (ix < G) & (iz >= 0) & (iz < G)
        & (y > cfg.y_range[0]) & (y < cfg.y_range[1])
    )
    span = G * cell
    feats_in = jnp.stack(
        [
            fx - ix.astype(jnp.float32) - 0.5,       # dx to pillar center
            fz - iz.astype(jnp.float32) - 0.5,       # dz to pillar center
            (cfg.ground_y - y) / 2.0,                # height above ground
            (x - cfg.x_min) / span - 0.5,
            (z - cfg.z_min) / span - 0.5,
            jnp.ones_like(x),
        ],
        axis=-1,
    )
    h = jax.nn.relu(feats_in @ params["p1_w"] + params["p1_b"])
    h = jax.nn.relu(h @ params["p2_w"] + params["p2_b"])
    # Invalid / out-of-range points dump into an extra row that is dropped.
    flat = jnp.where(ok, iz * G + ix, G * G)
    canvas = jnp.zeros((G * G + 1, cfg.channels), jnp.float32)
    canvas = canvas.at[flat].max(h)
    return canvas[: G * G].reshape(G, G, cfg.channels)


def forward(params, cfg: Detector3DConfig, pts, valid):
    """Scan -> (hm, off, ycen, sz, yaw_vec) on the stride-2 BEV grid."""
    x = pillar_canvas(params, cfg, pts, valid)[None]
    x = jax.nn.relu(_conv(x, params["c1_w"], params["c1_b"], stride=2))
    x = jax.nn.relu(_conv(x, params["c2_w"], params["c2_b"]))
    x = jax.nn.relu(_conv(x, params["c3_w"], params["c3_b"], dilation=2) + x)
    x = jax.nn.relu(_conv(x, params["c4_w"], params["c4_b"], dilation=4) + x)
    hm = _conv(x, params["hm_w"], params["hm_b"])[0]
    off = _conv(x, params["off_w"], params["off_b"])[0]
    ycen = _conv(x, params["ycen_w"], params["ycen_b"])[0, :, :, 0]
    sz = _conv(x, params["sz_w"], params["sz_b"])[0]
    yaw = _conv(x, params["yaw_w"], params["yaw_b"])[0]
    return hm, off, ycen, sz, yaw


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def detect_objects_3d(params, cfg: Detector3DConfig, pts, valid) -> Boxes3D:
    """One scan -> fixed-budget 7-DoF boxes (peak NMS + top-k, all on-mesh)."""
    hm, off, ycen, sz, yaw = forward(params, cfg, pts, valid)
    p = jax.nn.sigmoid(hm)
    keep = p == jax.lax.reduce_window(
        p, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME"
    )
    p = jnp.where(keep, p, 0.0)
    Hs, Ws, C = p.shape
    scores, flat = jax.lax.top_k(p.reshape(-1), cfg.max_det)
    cls = (flat % C).astype(jnp.int32)
    cell = flat // C
    iz = (cell // Ws).astype(jnp.int32)
    ix = (cell % Ws).astype(jnp.int32)
    s = 2 * cfg.cell  # head stride in meters
    o = off[iz, ix]
    cx = cfg.x_min + (ix.astype(jnp.float32) + 0.5 + o[:, 0]) * s
    cz = cfg.z_min + (iz.astype(jnp.float32) + 0.5 + o[:, 1]) * s
    cy = cfg.ground_y - ycen[iz, ix] * 2.0
    size = jnp.exp(sz[iz, ix])
    yv = yaw[iz, ix]
    theta = 0.5 * jnp.arctan2(yv[:, 0], yv[:, 1])
    return Boxes3D(
        center=jnp.stack([cx, cy, cz], -1),
        size=size,
        yaw=theta,
        label=cls,
        prob=scores,
        valid=scores > cfg.score_thr,
    )


def boxes_to_ellipsoids(boxes: Boxes3D) -> jax.Array:
    """7-DoF boxes -> camera-frame minimal 9-vectors, **z-up object frame**.

    The engine's object priors assume the landmark's local z-axis is the
    vertical (`opt/quadric_factors.gravity_residual` aligns z with up;
    `support_residual` takes bottom = center − half_z·ẑ), so the box's
    vertical (camera −y, down-positive frame) becomes the object z column:
    R = [x̂_yaw, ẑ×x̂, (0,−1,0)], half-axes ordered (length, width, height)/2.
    The reference seeds object pose from detector boxes the same way
    (`src/Tracking_util.cc` `det->SE3Tco`)."""
    ct, st = jnp.cos(boxes.yaw), jnp.sin(boxes.yaw)
    zero = jnp.zeros_like(ct)
    one = jnp.ones_like(ct)
    x_col = jnp.stack([ct, zero, -st], -1)       # long axis, horizontal
    z_col = jnp.stack([zero, -one, zero], -1)    # up (camera y is down)
    y_col = jnp.cross(z_col, x_col)
    R = jnp.stack([x_col, y_col, z_col], -1)     # columns
    from ..core import quadric as _q

    rpy = _q.rotmat_to_euler(R)
    half = jnp.stack(
        [boxes.size[:, 0], boxes.size[:, 2], boxes.size[:, 1]], -1
    ) * 0.5
    return jnp.concatenate([boxes.center, rpy, half], axis=-1)


# ---------------------------------------------------------------------------
# Training targets + loss
# ---------------------------------------------------------------------------

def _targets(cfg: Detector3DConfig, center, size, yaw, bvalid):
    """Gaussian BEV heatmap + regression targets at center cells."""
    G2 = cfg.grid // 2
    s = 2 * cfg.cell
    zs = jnp.arange(G2, dtype=jnp.float32)[:, None]
    xs = jnp.arange(G2, dtype=jnp.float32)[None, :]
    fx = (center[:, 0] - cfg.x_min) / s - 0.5
    fz = (center[:, 2] - cfg.z_min) / s - 0.5
    bev_w = jnp.maximum(jnp.minimum(size[:, 0], size[:, 2]) / s, 1e-3)
    sigma = jnp.maximum(bev_w / 6.0, 0.8)

    def splat(d):
        g = jnp.exp(-((xs - fx[d]) ** 2 + (zs - fz[d]) ** 2) / (2 * sigma[d] ** 2))
        return jnp.where(bvalid[d], g, 0.0)[:, :, None]

    hm_t = jnp.max(jax.vmap(splat)(jnp.arange(center.shape[0])), axis=0)
    ix = jnp.clip(jnp.round(fx).astype(jnp.int32), 0, G2 - 1)
    iz = jnp.clip(jnp.round(fz).astype(jnp.int32), 0, G2 - 1)
    hm_t = hm_t.at[iz, ix, 0].max(bvalid.astype(jnp.float32))
    off_t = jnp.stack([fx - ix, fz - iz], -1)
    ycen_t = (cfg.ground_y - center[:, 1]) / 2.0
    sz_t = jnp.log(jnp.maximum(size, 1e-3))
    yaw_t = jnp.stack([jnp.sin(2 * yaw), jnp.cos(2 * yaw)], -1)
    return hm_t, (iz, ix, off_t, ycen_t, sz_t, yaw_t)


def detector3d_loss(params, cfg: Detector3DConfig, pts, pvalid,
                    center, size, yaw, bvalid):
    hm, off, ycen, sz, yw = forward(params, cfg, pts, pvalid)
    hm_t, (iz, ix, off_t, ycen_t, sz_t, yaw_t) = _targets(
        cfg, center, size, yaw, bvalid
    )
    p = jnp.clip(jax.nn.sigmoid(hm), 1e-4, 1.0 - 1e-4)
    pos = hm_t > 0.999
    focal_pos = -((1.0 - p) ** 2) * jnp.log(p) * pos
    focal_neg = -((1.0 - hm_t) ** 4) * (p ** 2) * jnp.log(1.0 - p) * (~pos)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    l_hm = (jnp.sum(focal_pos) + jnp.sum(focal_neg)) / n_pos

    w = bvalid.astype(jnp.float32)
    nw = jnp.maximum(w.sum(), 1.0)
    l_off = jnp.sum(jnp.abs(off[iz, ix] - off_t).sum(-1) * w) / nw
    l_y = jnp.sum(jnp.abs(ycen[iz, ix] - ycen_t) * w) / nw
    l_sz = jnp.sum(jnp.abs(sz[iz, ix] - sz_t).sum(-1) * w) / nw
    l_yaw = jnp.sum(jnp.abs(yw[iz, ix] - yaw_t).sum(-1) * w) / nw
    return l_hm + l_off + l_y + l_sz + l_yaw


# ---------------------------------------------------------------------------
# Procedural training scans
# ---------------------------------------------------------------------------

def synth_scan(key: jax.Array, cfg: Detector3DConfig,
               max_boxes: int = 4, pts_per_box: int = 384,
               ground_pts: int = 4096, clutter_pts: int = 1024):
    """One LiDAR-ish scan: cars on the ground + ground returns + non-car
    clutter (poles / wall slabs), fully inside jit.

    Returns (pts (N,3), valid (N,), gt dict {center, size, yaw, valid})."""
    ks = jax.random.split(key, 10)
    B = max_boxes
    cx = jax.random.uniform(ks[0], (B,), minval=cfg.x_min + 4.0,
                            maxval=cfg.x_min + cfg.grid * cfg.cell - 4.0)
    cz = jax.random.uniform(ks[1], (B,), minval=cfg.z_min + 4.0,
                            maxval=cfg.z_min + cfg.grid * cfg.cell - 4.0)
    length = jax.random.uniform(ks[2], (B,), minval=3.2, maxval=4.8)
    width = jax.random.uniform(ks[3], (B,), minval=1.6, maxval=2.0)
    height = jax.random.uniform(ks[4], (B,), minval=1.4, maxval=1.8)
    theta = jax.random.uniform(ks[5], (B,), minval=0.0, maxval=jnp.pi)
    bvalid = jax.random.uniform(ks[6], (B,)) < 0.8
    cy = cfg.ground_y - height / 2.0
    center = jnp.stack([cx, cy, cz], -1)
    size = jnp.stack([length, height, width], -1)  # local x = long axis

    # Box surface points: cube sample projected to its dominant face.
    u = jax.random.uniform(ks[7], (B, pts_per_box, 3), minval=-1.0, maxval=1.0)
    dom = jnp.argmax(jnp.abs(u), axis=-1)
    sign = jnp.sign(jnp.take_along_axis(u, dom[..., None], -1))
    surf = jnp.where(
        jax.nn.one_hot(dom, 3, dtype=bool), sign * jnp.ones_like(u), u
    )
    local = surf * (size[:, None, :] * 0.5)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # Ry(θ) rows (camera frame): local x -> (cosθ, 0, -sinθ).
    px = ct[:, None] * local[:, :, 0] + st[:, None] * local[:, :, 2]
    pz = -st[:, None] * local[:, :, 0] + ct[:, None] * local[:, :, 2]
    box_pts = jnp.stack([px, local[:, :, 1], pz], -1) + center[:, None, :]
    box_pts = box_pts.reshape(-1, 3)
    box_ok = jnp.repeat(bvalid, pts_per_box)

    gx = jax.random.uniform(ks[8], (ground_pts,), minval=cfg.x_min,
                            maxval=cfg.x_min + cfg.grid * cfg.cell)
    gz = jax.random.uniform(
        jax.random.fold_in(ks[8], 1), (ground_pts,), minval=cfg.z_min,
        maxval=cfg.z_min + cfg.grid * cfg.cell,
    )
    gy = cfg.ground_y + 0.03 * jax.random.normal(
        jax.random.fold_in(ks[8], 2), (ground_pts,)
    )
    gnd = jnp.stack([gx, gy, gz], -1)

    # Clutter: thin vertical structures (poles and wall slabs) — occupied
    # space that is NOT car-shaped, teaching the head to reject.
    W = 4
    kc = jax.random.split(ks[9], 8)
    wx = jax.random.uniform(kc[0], (W,), minval=cfg.x_min + 2.0,
                            maxval=cfg.x_min + cfg.grid * cfg.cell - 2.0)
    wz = jax.random.uniform(kc[1], (W,), minval=cfg.z_min + 2.0,
                            maxval=cfg.z_min + cfg.grid * cfg.cell - 2.0)
    is_wall = jax.random.uniform(kc[2], (W,)) < 0.5
    sx = jnp.where(is_wall, jax.random.uniform(kc[3], (W,), minval=6.0,
                                               maxval=10.0), 0.3)
    szc = jnp.where(is_wall, 0.25, 0.3)
    sy = jax.random.uniform(kc[4], (W,), minval=2.2, maxval=3.5)
    cp = clutter_pts // W
    off = jax.random.uniform(kc[5], (W, cp, 3), minval=-0.5, maxval=0.5)
    cl = jnp.stack(
        [
            wx[:, None] + off[:, :, 0] * sx[:, None],
            cfg.ground_y - off[:, :, 1] * sy[:, None] - sy[:, None] * 0.25,
            wz[:, None] + off[:, :, 2] * szc[:, None],
        ],
        -1,
    ).reshape(-1, 3)

    pts = jnp.concatenate([box_pts, gnd, cl], 0)
    noise = 0.02 * jax.random.normal(jax.random.fold_in(key, 99), pts.shape)
    valid = jnp.concatenate(
        [box_ok, jnp.ones(ground_pts, bool), jnp.ones(cl.shape[0], bool)]
    )
    gt = dict(center=center, size=size, yaw=theta, valid=bvalid)
    return pts + noise, valid, gt


def train_detector3d(key: jax.Array, cfg: Detector3DConfig = Detector3DConfig(),
                     steps: int = 800, lr: float = 1e-3):
    """Scene generation + loss + adam update fused in ONE jit per step."""
    import optax

    params = init_detector3d(key, cfg)
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        pts, pvalid, gt = synth_scan(k, cfg)
        loss, grads = jax.value_and_grad(detector3d_loss)(
            params, cfg, pts, pvalid,
            gt["center"], gt["size"], gt["yaw"], gt["valid"],
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
        losses.append(float(loss))
    return params, losses


# ---------------------------------------------------------------------------
# Replay-seam adapter + params persistence
# ---------------------------------------------------------------------------

def lidar_detections_learned(params, cfg: Detector3DConfig, pts_cam, intr,
                             width: int, height: int,
                             budget: int = 32768) -> dict:
    """Scan -> detection-replay dict with learned 3D boxes.

    Beyond the 2D replay keys the dict carries `ellipsoid_cam` (D, 9) and
    `fit_ok` (D,): the SLAM object path initializes landmarks from the
    detector's own 3D geometry instead of re-fitting from sparse keypoints —
    the role the reference's detector boxes play in `Tracking_util.cc`
    (`det->SE3Tco` seeding).  Scans are padded/truncated to `budget` points
    so every frame reuses one jit signature."""
    pts_np = np.zeros((budget, 3), np.float32)
    n = min(len(pts_cam), budget)
    pts_np[:n] = np.asarray(pts_cam, np.float32)[:n]
    pts = jnp.asarray(pts_np)
    boxes = detect_objects_3d(
        params, cfg, pts, jnp.arange(budget) < n
    )
    e_cam = boxes_to_ellipsoids(boxes)

    # Project the 8 box corners to an image bbox.
    corners = jnp.asarray(
        [[sx, sy, sz] for sx in (-0.5, 0.5) for sy in (-0.5, 0.5)
         for sz in (-0.5, 0.5)], jnp.float32,
    )
    ct, st = jnp.cos(boxes.yaw), jnp.sin(boxes.yaw)
    local = corners[None] * boxes.size[:, None, :]
    px = ct[:, None] * local[:, :, 0] + st[:, None] * local[:, :, 2]
    pz = -st[:, None] * local[:, :, 0] + ct[:, None] * local[:, :, 2]
    cam = jnp.stack([px, local[:, :, 1], pz], -1) + boxes.center[:, None, :]
    z = jnp.maximum(cam[:, :, 2], 0.2)
    u = intr.fx * cam[:, :, 0] / z + intr.cx
    v = intr.fy * cam[:, :, 1] / z + intr.cy
    bbox = jnp.stack(
        [
            jnp.clip(u.min(1), 0, width - 1.0),
            jnp.clip(v.min(1), 0, height - 1.0),
            jnp.clip(u.max(1), 0, width - 1.0),
            jnp.clip(v.max(1), 0, height - 1.0),
        ],
        -1,
    )
    zc = jnp.maximum(boxes.center[:, 2], 0.2)
    uc = intr.fx * boxes.center[:, 0] / zc + intr.cx
    vc = intr.fy * boxes.center[:, 1] / zc + intr.cy
    in_view = (
        (boxes.center[:, 2] > 1.0)
        & (uc >= 0) & (uc < width) & (vc >= 0) & (vc < height)
        & (bbox[:, 2] - bbox[:, 0] > 8.0)
        & (bbox[:, 3] - bbox[:, 1] > 6.0)
    )
    valid = boxes.valid & in_view
    return dict(
        bbox=np.asarray(bbox, np.float32),
        label=np.asarray(boxes.label, np.int32),
        prob=np.asarray(jnp.where(valid, boxes.prob, 0.0), np.float32),
        valid=np.asarray(valid, bool),
        ellipsoid_cam=np.asarray(e_cam, np.float32),
        fit_ok=np.asarray(valid, bool),
    )


def save_detector3d(path: str, params, cfg: Detector3DConfig) -> None:
    np.savez(
        path,
        __cfg__=np.asarray(
            [cfg.grid, cfg.cell, cfg.x_min, cfg.z_min, cfg.y_range[0],
             cfg.y_range[1], cfg.ground_y, cfg.channels, cfg.widths[0],
             cfg.widths[1], cfg.num_classes, cfg.max_det, cfg.score_thr],
            np.float64,
        ),
        **{k: np.asarray(v) for k, v in params.items()},
    )


def load_detector3d(path: str):
    z = np.load(path)
    c = z["__cfg__"]
    cfg = Detector3DConfig(
        grid=int(c[0]), cell=float(c[1]), x_min=float(c[2]), z_min=float(c[3]),
        y_range=(float(c[4]), float(c[5])), ground_y=float(c[6]),
        channels=int(c[7]), widths=(int(c[8]), int(c[9])),
        num_classes=int(c[10]), max_det=int(c[11]), score_thr=float(c[12]),
    )
    params = {k: jnp.asarray(z[k]) for k in z.files if k != "__cfg__"}
    return params, cfg
