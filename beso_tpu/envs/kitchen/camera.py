"""Pinhole-camera RGB rendering of the Franka-kitchen scene in pure JAX.

Functional parity target: the reference renders the kitchen through MuJoCo
GL via adept_envs (its vision dataset path consumes those frames —
`beso/envs/franka_kitchen/dataloader.py:94-161`); the kitchen XML is not
vendored, so this renderer ray-casts the SAME documented scene geometry the
surrogate physics and the MuJoCo calibration scenes share
(`beso_tpu/envs/kitchen/geometry.py`) from a fixed MuJoCo-like viewpoint.

TPU-first design (same pattern as envs/block_push/camera.py): the camera is
FIXED, so pixel ray directions are precomputed once as an [H, W, 3] grid;
per-frame rendering is vectorized analytic ray-casting (ray/oriented-box,
ray/cylinder, ray/sphere; nearest-hit occlusion, face shading) — pure VPU
work that vmaps/jits into the training step, so image policies train from
low-dim trajectories with zero host-side image pipeline.

Every task-relevant state is VISIBLE in the render: door/drawer panels ride
their true hinge/slide joints (qpos-driven oriented boxes), burner knob and
light-switch levers ride their arcs (the lever tip position encodes the
joint angle), the light-switch panel brightens as the light turns on, the
kettle body tracks qpos[23:26], and the robot is drawn as fingertip +
wrist spheres from the same FK the physics uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.envs.kitchen import geometry as G
from beso_tpu.envs.kitchen.env import (DEFAULT_KITCHEN_PARAMS,
                                       KITCHEN_BASE_POS, kitchen_handles)
from beso_tpu.envs.kitchen.fk import panda_fk

# fixed viewpoint: in front of the kitchen, looking slightly down at the
# cabinet wall (the adept_envs default camera is a similar 3/4 frontal view)
CAMERA_POS = np.asarray([0.15, -1.15, 1.55], np.float32)
CAMERA_TARGET = np.asarray([-0.05, 0.90, 1.15], np.float32)
IMG_H, IMG_W = 128, 128
FOCAL_SCALE = 0.95            # fx = fy = FOCAL_SCALE * width

_FAR = 1e9
_EDGE = 0.004

# palette
_BG = np.asarray([0.93, 0.93, 0.91])
_WALL = np.asarray([0.82, 0.80, 0.76])
_COUNTER = np.asarray([0.55, 0.45, 0.38])
_PANEL = np.asarray([0.70, 0.70, 0.72])
_MICRO_BODY = np.asarray([0.25, 0.25, 0.28])
_MICRO_DOOR = np.asarray([0.45, 0.45, 0.50])
_SLIDE_DOOR = np.asarray([0.80, 0.60, 0.30])
_HINGE_DOOR = np.asarray([0.75, 0.55, 0.25])
_KNOB = np.asarray([0.85, 0.15, 0.12])
_KNOB2 = np.asarray([0.95, 0.45, 0.10])
_SWITCH = np.asarray([0.20, 0.45, 0.90])
_LIGHT_ON = np.asarray([1.00, 0.95, 0.55])
_KETTLE = np.asarray([0.30, 0.60, 0.30])
_ROBOT = np.asarray([0.12, 0.12, 0.14])
_FINGER = np.asarray([0.55, 0.55, 0.60])


def _look_at(eye, target, up=(0.0, 0.0, 1.0)):
    """Camera rotation whose +z looks from eye toward target (OpenCV-style:
    x right, y down, z forward)."""
    f = np.asarray(target, np.float64) - np.asarray(eye, np.float64)
    f = f / np.linalg.norm(f)
    upv = np.asarray(up, np.float64)
    r = np.cross(f, upv)
    r = r / np.linalg.norm(r)
    d = np.cross(f, r)                      # image-down
    return np.stack([r, d, f], axis=1)      # columns: cam axes in world


@functools.lru_cache(maxsize=4)
def kitchen_ray_grid(h: int = IMG_H, w: int = IMG_W) -> np.ndarray:
    """Precomputed [h, w, 3] world-frame pixel ray directions."""
    R = _look_at(CAMERA_POS, CAMERA_TARGET)
    fx = fy = FOCAL_SCALE * w
    cx, cy = w / 2.0, h / 2.0
    u = np.arange(w) + 0.5
    v = np.arange(h) + 0.5
    uu, vv = np.meshgrid(u, v)
    d_cam = np.stack([(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu)], -1)
    return (d_cam @ R.T).astype(np.float32)


def _ray_box_r(rays, center, Rbox, halfs):
    """Ray / oriented-box intersection (full 3x3 rotation).
    Returns (t_enter [h,w] with _FAR at misses, mask, entry axis [h,w])."""
    o = jnp.asarray(CAMERA_POS) - center
    o_l = Rbox.T @ o                                # [3]
    d_l = jnp.einsum("ij,hwj->hwi", Rbox.T, rays)   # [h, w, 3]
    inv = 1.0 / jnp.where(jnp.abs(d_l) < 1e-9, 1e-9, d_l)
    t1 = (-halfs - o_l) * inv
    t2 = (halfs - o_l) * inv
    t_lo = jnp.minimum(t1, t2)
    t_hi = jnp.maximum(t1, t2)
    t_enter = jnp.max(t_lo, axis=-1)
    t_exit = jnp.min(t_hi, axis=-1)
    hit = (t_exit > t_enter) & (t_enter > 0)
    mask = jnp.clip((t_exit - t_enter) / (_EDGE * 4.0), 0.0, 1.0) * hit
    axis = jnp.argmax(t_lo, axis=-1)
    return jnp.where(hit, t_enter, _FAR), mask, axis


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _ray_sphere(rays, center, radius):
    o = jnp.asarray(CAMERA_POS) - center
    b = 2.0 * jnp.einsum("hwi,i->hw", rays, o)
    a = jnp.sum(rays * rays, axis=-1)
    c = jnp.dot(o, o) - radius * radius
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / (2 * a)
    hit = (disc > 0) & (t > 0)
    mask = jnp.clip(sq / (_EDGE * 40.0), 0.0, 1.0) * hit
    return jnp.where(hit, t, _FAR), mask


def _ray_cyl_z(rays, center, radius, half_h):
    """Vertical cylinder centered at `center` (z extent +-half_h)."""
    o = jnp.asarray(CAMERA_POS) - center
    dx, dy, dz = rays[..., 0], rays[..., 1], rays[..., 2]
    a = dx * dx + dy * dy
    b = 2.0 * (o[0] * dx + o[1] * dy)
    c = o[0] * o[0] + o[1] * o[1] - radius * radius
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_in = (-b - sq) / (2 * a)
    t_out = (-b + sq) / (2 * a)
    inv_z = 1.0 / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    tz1 = (-half_h - o[2]) * inv_z
    tz2 = (half_h - o[2]) * inv_z
    t_enter = jnp.maximum(t_in, jnp.minimum(tz1, tz2))
    t_exit = jnp.minimum(t_out, jnp.maximum(tz1, tz2))
    hit = (disc > 0) & (t_exit > t_enter) & (t_enter > 0)
    mask = hit.astype(jnp.float32)
    return jnp.where(hit, t_enter, _FAR), mask


_SHADE = jnp.asarray([0.80, 0.68, 1.0])   # x-, y-, z-entry face brightness
_EYE3 = jnp.eye(3)


def _static_boxes():
    """(center, R, halfs, color) for the static furniture."""
    eye = np.eye(3, dtype=np.float32)
    return [
        # cabinet-run wall plane (thick slab behind everything)
        ((0.0, 1.00, 1.20), eye, (1.1, 0.03, 0.65), _WALL),
        # knob backsplash panel
        ((0.30, 0.935, 1.17), eye, (0.22, 0.015, 0.28), _PANEL),
        # counter top (the kettle body bottom rests at z ~ 1.56)
        ((0.0, 0.80, 1.54), eye, (1.0, 0.18, 0.02), _COUNTER),
        # microwave body (hinge at x=-0.60; body to the left/behind)
        ((-0.38, 0.88, 0.90), eye, (0.24, 0.12, 0.17), _MICRO_BODY),
        # hinge-cabinet body (door hinge at x=0.15, z=1.40)
        ((0.0, 1.0, 1.40), eye, (0.16, 0.05, 0.18), _MICRO_BODY),
    ]


def render_kitchen_obs_rgb(obs30: jnp.ndarray, h: int = IMG_H,
                           w: int = IMG_W) -> jnp.ndarray:
    """RGB [h, w, 3] float32 in [0,1] from one 30-dim kitchen observation
    (the kitchen_obs layout = qpos[:30]). vmap over batches/windows."""
    rays = jnp.asarray(kitchen_ray_grid(h, w))
    img = jnp.broadcast_to(jnp.asarray(_BG, jnp.float32), (h, w, 3)).astype(
        jnp.float32)
    t_near = jnp.full((h, w), _FAR)

    def add_box(img, t_near, center, Rbox, halfs, color):
        t, m, ax = _ray_box_r(rays, jnp.asarray(center, jnp.float32),
                              jnp.asarray(Rbox, jnp.float32),
                              jnp.asarray(halfs, jnp.float32))
        shade = _SHADE[ax]
        vis = m * (t < t_near)
        col = jnp.asarray(color, jnp.float32)[None, None, :] * shade[..., None]
        img = img * (1 - vis[..., None]) + vis[..., None] * col
        return img, jnp.minimum(t_near, jnp.where(m > 0.5, t, _FAR))

    def add_sphere(img, t_near, center, radius, color):
        t, m = _ray_sphere(rays, jnp.asarray(center, jnp.float32), radius)
        vis = m * (t < t_near)
        col = jnp.asarray(color, jnp.float32)
        img = img * (1 - vis[..., None]) + vis[..., None] * col
        return img, jnp.minimum(t_near, jnp.where(m > 0.5, t, _FAR))

    def add_cyl(img, t_near, center, radius, half_h, color):
        t, m = _ray_cyl_z(rays, jnp.asarray(center, jnp.float32), radius,
                          half_h)
        vis = m * (t < t_near)
        col = jnp.asarray(color, jnp.float32)
        img = img * (1 - vis[..., None]) + vis[..., None] * col
        return img, jnp.minimum(t_near, jnp.where(m > 0.5, t, _FAR))

    # --- static furniture ---------------------------------------------------
    for center, R, halfs, color in _static_boxes():
        img, t_near = add_box(img, t_near, center, R, halfs, color)

    # light indicator: the backsplash strip brightens with the light joint
    on = jnp.clip(obs30[17] / -0.69, 0.0, 1.0)
    strip_col = (1 - on) * jnp.asarray(_PANEL) + on * jnp.asarray(_LIGHT_ON)
    img, t_near = add_box(img, t_near, (0.12, 0.925, 1.30), np.eye(3),
                          (0.05, 0.012, 0.03), strip_col)
    # burner glow patches: real stoves glow as the knob turns — makes the
    # 2-px knob-lever state legible at policy resolutions
    for idx, z, col in ((11, 1.00, _KNOB), (15, 1.10, _KNOB2)):
        glow = jnp.clip(obs30[idx] / -0.9, 0.0, 1.0)
        patch = (1 - glow) * jnp.asarray(_PANEL) + glow * jnp.asarray(col)
        img, t_near = add_box(img, t_near, (0.46, 0.925, z), np.eye(3),
                              (0.035, 0.012, 0.035), patch)

    # --- articulated doors (qpos-driven oriented boxes) ---------------------
    # microwave door: hinge line at x=-0.60, y=0.80; opens toward -y
    q_m = obs30[22]
    Rm = _rot_z(q_m)
    pivot_m = jnp.asarray([-0.60, 0.80, 0.90])
    c_m = pivot_m + Rm @ jnp.asarray([0.21, -0.02, 0.0])
    img, t_near = add_box(img, t_near, c_m, Rm, (0.21, 0.015, 0.16),
                          _MICRO_DOOR)
    # hinge-cabinet door: hinge at x=0.15, y=0.95, z=1.40; opens +1.45
    q_h = obs30[21]
    Rh = _rot_z(q_h)
    pivot_h = jnp.asarray([0.15, 0.95, 1.40])
    c_h = pivot_h + Rh @ jnp.asarray([-0.15, -0.05, 0.0])
    img, t_near = add_box(img, t_near, c_h, Rh, (0.15, 0.015, 0.17),
                          _HINGE_DOOR)
    # slide-cabinet door: translates along +x by q19
    c_s = jnp.asarray([0.47, 0.87, 1.40]) + obs30[19] * jnp.asarray(
        [1.0, 0.0, 0.0])
    img, t_near = add_box(img, t_near, c_s, _EYE3, (0.10, 0.015, 0.15),
                          _SLIDE_DOOR)

    # --- levers (handle positions ride their true arcs) ---------------------
    handles = kitchen_handles(obs30, DEFAULT_KITCHEN_PARAMS)
    img, t_near = add_sphere(img, t_near, handles[0], 0.030, _KNOB)
    img, t_near = add_sphere(img, t_near, handles[1], 0.030, _KNOB2)
    img, t_near = add_sphere(img, t_near, handles[2], 0.032, _SWITCH)
    # slide / hinge / microwave handle bars (vertical cylinders)
    img, t_near = add_cyl(img, t_near, handles[3], 0.012, 0.06, _SLIDE_DOOR * 0.6)
    img, t_near = add_cyl(img, t_near, handles[4], 0.012, 0.08, _HINGE_DOOR * 0.6)
    img, t_near = add_cyl(img, t_near, handles[5], 0.012, 0.06, _MICRO_DOOR * 0.6)

    # --- kettle (free body) --------------------------------------------------
    kpos = obs30[23:26]
    img, t_near = add_cyl(img, t_near, kpos, 0.065, 0.055, _KETTLE)
    img, t_near = add_sphere(img, t_near, kpos + jnp.asarray([0.0, 0.0, 0.09]),
                             0.022, _KETTLE * 0.7)

    # --- robot: fingertip + wrist from the same FK the physics uses ---------
    ee = panda_fk(obs30[:7], KITCHEN_BASE_POS)
    base = jnp.asarray(KITCHEN_BASE_POS)
    wrist = base + 0.75 * (ee - base)
    img, t_near = add_sphere(img, t_near, wrist, 0.045, _ROBOT)
    img, t_near = add_sphere(img, t_near, ee, 0.030, _ROBOT)
    # finger opening is task-relevant (kettle grasp): two pads split by q7/q8
    gap = 0.012 + obs30[7]
    img, t_near = add_sphere(img, t_near, ee + jnp.asarray([gap, 0.0, 0.0]),
                             0.012, _FINGER)
    img, t_near = add_sphere(img, t_near, ee - jnp.asarray([gap, 0.0, 0.0]),
                             0.012, _FINGER)
    return img
