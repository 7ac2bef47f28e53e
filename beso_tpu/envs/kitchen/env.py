"""Batched Franka Kitchen environment in pure JAX.

Functional parity targets:
* observation layout, task table, completion/reward/termination logic of
  `KitchenBase` (`beso/envs/franka_kitchen/kitchen_env.py:10-136`):
  - obs[:30] = [robot qpos(9), object qpos(21)] (the reference keeps the
    first 30 of the 60-dim adept_envs obs, kitchen dataloader.py:18-20),
  - the 7 task elements with their obs indices and goal values
    (OBS_ELEMENT_INDICES / OBS_ELEMENT_GOALS, kitchen_env.py:10-27),
  - completion: ||obs[element_idx] - goal[element_idx]|| < BONUS_THRESH(0.3),
    completed tasks are removed from `tasks_to_complete`, reward = number of
    NEWLY completed tasks this step (kitchen_env.py:87-120),
  - termination when all tasks complete (kitchen_env.py:122-136),
    280-step episode cap via the rollout harness (envs/__init__.py:31-35).

The PHYSICS is a surrogate (v2, round 3): the external MuJoCo `adept_envs`
simulation (Franka arm + articulated furniture) is replaced by a fully
batched JAX model — 9-DoF velocity-integrated arm with Panda FK for the
fingertip, ARC-KINEMATIC articulated objects (handles ride their true
hinge arcs / slide lines; a hooked fingertip drives the joint by its exact
angular advance about the element axis, so straight pulls slip off the arc
— the radial-disengage behavior VERDICT r2 asked for), a gripper-latched
kettle grasp using the two real finger DoFs (qpos[7:9]), and
fingertip/furniture collision against the cabinet face and microwave body.
The articulation geometry lives in `geometry.py` (shared with the MuJoCo
golden calibration scenes) and EVERY interaction constant in
`DEFAULT_KITCHEN_PARAMS` is measured by `scripts/calibrate_kitchen.py`
(per-element arc-drag scenes + a torque-actuated two-finger gripper scene
for the kettle; tests/test_kitchen_fidelity.py pins the shipped values).
`KitchenParams` is a pytree so evaluation can perturb it
(`perturb_kitchen_params`) to measure policy robustness to surrogate
roughness. The task/metric surface is exact (SURVEY.md 7.3#1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from beso_tpu.envs.kitchen.fk import panda_fk

# task table (kitchen_env.py:10-28)
ALL_TASKS = (
    "bottom burner", "top burner", "light switch", "slide cabinet",
    "hinge cabinet", "microwave", "kettle",
)
OBS_ELEMENT_INDICES = {
    "bottom burner": np.array([11, 12]),
    "top burner": np.array([15, 16]),
    "light switch": np.array([17, 18]),
    "slide cabinet": np.array([19]),
    "hinge cabinet": np.array([20, 21]),
    "microwave": np.array([22]),
    "kettle": np.array([23, 24, 25, 26, 27, 28, 29]),
}
OBS_ELEMENT_GOALS = {
    "bottom burner": np.array([-0.88, -0.01]),
    "top burner": np.array([-0.92, -0.01]),
    "light switch": np.array([-0.69, -0.05]),
    "slide cabinet": np.array([0.37]),
    "hinge cabinet": np.array([0.0, 1.45]),
    "microwave": np.array([-0.75]),
    "kettle": np.array([-0.23, 0.75, 1.62, 0.99, 0.0, 0.0, -0.06]),
}
BONUS_THRESH = 0.3

# dense goal vector over the 30-dim obs + per-task boolean masks
_GOAL_VEC = np.zeros(30, np.float32)
_TASK_MASKS = np.zeros((7, 30), np.float32)
for _i, _t in enumerate(ALL_TASKS):
    _GOAL_VEC[OBS_ELEMENT_INDICES[_t]] = OBS_ELEMENT_GOALS[_t]
    _TASK_MASKS[_i, OBS_ELEMENT_INDICES[_t]] = 1.0
GOAL_VEC = jnp.asarray(_GOAL_VEC)
TASK_MASKS = jnp.asarray(_TASK_MASKS)

# D4RL / adept_envs initial configuration (public relay-kitchen init_qpos)
INIT_QPOS = jnp.asarray([
    1.48388023e-01, -1.76848573e+00, 1.84390296e+00, -2.47685760e+00,
    2.60252026e-01, 7.12533105e-01, 1.59515394e+00, 4.79267505e-02,
    3.71350621e-02, -2.66279850e-04, -5.18043486e-05, 3.12877220e-05,
    -4.51199853e-05, -3.90842156e-06, -4.22629655e-05, 6.28065475e-05,
    4.04984708e-05, 4.62730939e-04, -2.26906415e-04, -4.65501369e-04,
    -6.44129196e-03, -1.77048263e-03, 1.08009684e-03, -2.69397440e-01,
    3.50383255e-01, 1.61944683e+00, 1.00618764e+00, 4.06395120e-03,
    -6.62095997e-03, -2.68278933e-04,
])
RESET_NOISE = 0.0  # adept_envs resets deterministically

# Panda joint limits (public spec)
_JOINT_LO = jnp.asarray([-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973, 0.0, 0.0])
_JOINT_HI = jnp.asarray([2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973, 0.04, 0.04])

# control: normalized actions scaled by act_amp, velocity-integrated
ACT_AMP = 2.0
CONTROL_DT = 0.08  # 12.5 Hz relay-kitchen control rate
KITCHEN_BASE_POS = (0.0, 0.3, 0.8)

# articulated-object joint ranges (element ranges from the shared geometry
# table, which also generates the MuJoCo calibration scenes; prevents
# nonphysical overshoot of the surrogate dynamics).
# Layout: object qpos indices 9..29 -> local 0..20.
from beso_tpu.envs.kitchen import geometry as _G

_OBJ_LO = np.full(21, -np.inf, np.float32)
_OBJ_HI = np.full(21, np.inf, np.float32)
for _idx, _lo, _hi in [
    (11, *_G.JOINT_RANGE[0]), (12, *_G.JOINT_RANGE[0]),  # bottom burner
    (15, *_G.JOINT_RANGE[1]), (16, *_G.JOINT_RANGE[1]),  # top burner
    (17, *_G.JOINT_RANGE[2]), (18, *_G.JOINT_RANGE[2]),  # light switch
    (19, *_G.JOINT_RANGE[3]),                            # slide cabinet
    (20, -0.2, 0.2), (21, *_G.JOINT_RANGE[4]),           # hinge cabinet
    (22, *_G.JOINT_RANGE[5]),                            # microwave door
    (25, 1.45, 1.75),                   # kettle stays on the counter (z)
]:
    _OBJ_LO[_idx - 9], _OBJ_HI[_idx - 9] = _lo, _hi
OBJ_LO = jnp.asarray(_OBJ_LO)
OBJ_HI = jnp.asarray(_OBJ_HI)
# primary joint obs-index per element, plus a secondary joint that follows
# at a fixed ratio (ratios derived from the task-table goal values, e.g.
# bottom burner goal (-0.88, -0.01) -> ratio 0.01/0.88)
_PRIMARY = np.asarray([11, 15, 17, 19, 21, 22, 23])
_SECONDARY = np.asarray([12, 16, 18, 19, 20, 22, 23])
PRIMARY = jnp.asarray(_PRIMARY)
SECONDARY_RATIO = jnp.asarray([0.01136, 0.01087, 0.07246, 0.0, 0.0, 0.0, 0.0])


# ---------------------------------------------------------------------------
# physics calibration (v2): arc-kinematic articulation, every constant
# measured in MuJoCo golden scenes of the SAME geometry (geometry.py +
# scripts/calibrate_kitchen.py -> tests/golden/kitchen_mujoco_v2.npz,
# pinned by tests/test_kitchen_fidelity.py)
# ---------------------------------------------------------------------------

@struct.dataclass
class KitchenParams:
    """Surrogate contact/interaction calibration. A pytree of arrays, so it
    can be vmapped/perturbed at eval time without recompilation.

    Articulation model (v2): each element's handle rides its TRUE arc about
    `pivots`/`axes` (rotary) or line (slide); a fingertip within
    `interact_radius` of the handle bar segment drives the joint by
    `drive_eff` x its own ANGULAR ADVANCE about the element axis (exact
    quasi-static hooked-contact law — no small-angle linearization). A
    straight-pulling fingertip departs the arc and disengages radially,
    the slip behavior the round-2 linear law could not express."""

    pivots: jnp.ndarray           # [7, 3] rotation centers / slide origins
    axes: jnp.ndarray             # [7, 3] unit hinge axes / slide directions
    handle0: jnp.ndarray          # [7, 3] handle rest positions (q = 0)
    bar_dirs: jnp.ndarray         # [7, 3] handle bar axes (0 = point handle)
    bar_halflen: jnp.ndarray      # [7] handle bar half lengths
    rotary: jnp.ndarray           # [7] 1.0 = rotary, 0.0 = slide/free
    drive_eff: jnp.ndarray        # [7] measured articulation efficiency
    interact_radius: jnp.ndarray  # [] fingertip-handle engagement distance
    grasp_radius: jnp.ndarray     # [] kettle grasp engage radius
    release_radius: jnp.ndarray   # [] kettle grasp breakaway distance
    grip_close_thresh: jnp.ndarray  # [] mean finger qpos below -> closed
    grip_open_thresh: jnp.ndarray   # [] mean finger qpos above -> open
    kettle_gain: jnp.ndarray      # [] grasped-transport tracking ratio
    kettle_max_speed: jnp.ndarray  # [] max kettle travel per control step
    wall_y: jnp.ndarray           # [] cabinet face plane (fingertip y <=)
    micro_lo: jnp.ndarray         # [3] microwave body AABB
    micro_hi: jnp.ndarray         # [3]


DEFAULT_KITCHEN_PARAMS = KitchenParams(
    pivots=jnp.asarray(_G.PIVOTS),
    axes=jnp.asarray(_G.AXES),
    handle0=jnp.asarray(_G.HANDLE0),
    bar_dirs=jnp.asarray(_G.BAR_DIRS),
    bar_halflen=jnp.asarray(_G.BAR_HALFLEN),
    rotary=jnp.asarray((_G.ELEMENT_KIND == _G.ROTARY).astype(np.float32)),
    # measured by arc-following drags in the per-element golden scenes
    # (calibrate_kitchen.py): STEADY-STATE engaged slope — joint angle per
    # radian of fingertip angular advance once contact is loaded (rad/rad;
    # m/m for the slide). The full-stroke ratios (0.87-0.96) additionally
    # contain the one-time contact-gap take-up, which the surrogate already
    # models as the engagement radius; shipping the full-stroke value as a
    # per-step slip would make the contact gap grow without bound.
    drive_eff=jnp.asarray([0.951, 0.951, 0.948, 1.000, 0.990, 0.996, 0.0]),
    # measured engagement ball: tangential contact gap finger_r + bar_r +
    # 0.002 = 0.034 plus the radial-offset probe onset (~0.01) -> 0.040
    interact_radius=jnp.asarray(0.040),
    # gripper golden scene: lateral closing offset 0.04 still lifts, 0.06
    # fails -> 0.05; yank never broke the grasp, max held hand-kettle gap
    # 0.066 -> breakaway 0.07; fingers closed on the bar sit at half-gap
    # ~ bar_r + contact depth -> 0.020, clear of the bar above 0.032
    grasp_radius=jnp.asarray(0.05),
    release_radius=jnp.asarray(0.07),
    grip_close_thresh=jnp.asarray(0.020),
    grip_open_thresh=jnp.asarray(0.032),
    # grasped transport tracks the hand ~1:1 at every tested speed up to
    # 0.30 m/control-step (tracking 0.99-1.15, pendulum swing included)
    kettle_gain=jnp.asarray(1.0),
    kettle_max_speed=jnp.asarray(0.30),
    wall_y=jnp.asarray(0.95),
    micro_lo=jnp.asarray([-0.60, 0.80, 0.70]),
    micro_hi=jnp.asarray([-0.15, 1.30, 1.10]),
)


def perturb_kitchen_params(params: KitchenParams = DEFAULT_KITCHEN_PARAMS,
                           gain_scale: float = 1.0,
                           radius_scale: float = 1.0,
                           kettle_scale: float = 1.0) -> KitchenParams:
    """Scaled physics for robustness evaluation: train at nominal constants,
    evaluate at +-20% efficiencies/contact radii and report retention
    (VERDICT.md round-1 item 3)."""
    return params.replace(
        drive_eff=params.drive_eff * gain_scale,
        interact_radius=params.interact_radius * radius_scale,
        grasp_radius=params.grasp_radius * radius_scale,
        release_radius=params.release_radius * radius_scale,
        kettle_gain=jnp.clip(params.kettle_gain * kettle_scale, 0.0, 1.0),
        kettle_max_speed=params.kettle_max_speed * kettle_scale,
    )


class KitchenState(NamedTuple):
    qpos: jnp.ndarray              # [..., 30]
    ee_pos: jnp.ndarray            # [..., 3] fingertip
    tasks_to_complete: jnp.ndarray  # [..., 7] bool (True = still open)
    completed: jnp.ndarray         # [..., 7] bool
    completion_order: jnp.ndarray  # [..., 7] int32 step at completion (-1)
    kettle_grasped: jnp.ndarray    # [...] bool latched gripper state
    done: jnp.ndarray              # [...] bool
    steps: jnp.ndarray             # [...] int32


def kitchen_reset(key, task_mask=None) -> KitchenState:
    """Single-env reset (vmap for batches). `task_mask` selects the active
    task elements (default: all 7, the evaluated 'kitchen-all-v0' variant,
    beso/envs/__init__.py:31-35 + v0.py:4-8)."""
    noise = RESET_NOISE * jax.random.normal(key, (30,))
    return kitchen_reset_from_qpos(INIT_QPOS + noise, task_mask)


def kitchen_reset_from_qpos(qpos: jnp.ndarray, task_mask=None) -> KitchenState:
    """Reset from a known configuration — the `_start_from_known` path
    (kitchen_workspace_manager.py:500-525, `all_init_qpos.npy` demos)."""
    open_tasks = (jnp.ones((7,), bool) if task_mask is None
                  else jnp.asarray(task_mask, bool))
    return KitchenState(
        qpos=qpos, ee_pos=panda_fk(qpos[:7], KITCHEN_BASE_POS),
        tasks_to_complete=open_tasks, completed=jnp.zeros((7,), bool),
        completion_order=jnp.full((7,), -1, jnp.int32),
        kettle_grasped=jnp.asarray(False),
        done=jnp.asarray(False), steps=jnp.zeros((), jnp.int32))


def load_init_qpos(data_path):
    """Load demonstration start states (kitchen_workspace_manager.py:500-509)."""
    from pathlib import Path

    return (np.load(Path(data_path) / "all_init_qpos.npy"),
            np.load(Path(data_path) / "all_init_qvel.npy"))


def kitchen_obs(state: KitchenState) -> jnp.ndarray:
    return state.qpos


def _task_distances(qpos: jnp.ndarray) -> jnp.ndarray:
    """||obs[element_idx] - goal[element_idx]|| per task (kitchen_env.py:98-103)."""
    diff = (qpos - GOAL_VEC) * TASK_MASKS
    return jnp.linalg.norm(diff, axis=-1)


def _in_box(p: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return jnp.all((p > lo) & (p < hi))


def _rodrigues(v: jnp.ndarray, axis: jnp.ndarray,
               theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [7,3] about unit axes [7,3] by angles theta [7]."""
    c = jnp.cos(theta)[:, None]
    s = jnp.sin(theta)[:, None]
    dot = jnp.sum(v * axis, axis=-1, keepdims=True)
    return v * c + jnp.cross(axis, v) * s + axis * dot * (1.0 - c)


def kitchen_handles(qpos: jnp.ndarray,
                    params: KitchenParams = DEFAULT_KITCHEN_PARAMS
                    ) -> jnp.ndarray:
    """Current world handle positions [7, 3].

    v2 arc kinematics: rotary handles ride the true circle about their
    pivot/axis by the primary joint angle (Rodrigues rotation of the rest
    offset); the slide handle translates along its axis; the kettle handle
    (row 6) tracks the kettle body qpos[23:26]."""
    q_primary = qpos[PRIMARY]                                     # [7]
    r_vec = params.handle0 - params.pivots
    arc = params.pivots + _rodrigues(r_vec, params.axes, q_primary)
    lin = params.handle0 + params.axes * q_primary[:, None]
    handles = jnp.where(params.rotary[:, None] > 0.5, arc, lin)
    return handles.at[6].set(qpos[23:26])


def handle_tangents(qpos: jnp.ndarray,
                    params: KitchenParams = DEFAULT_KITCHEN_PARAMS
                    ) -> jnp.ndarray:
    """Unit direction of increasing joint value at the CURRENT handle
    position [7, 3] (arc tangent for rotary elements, slide axis for the
    slide) — what the oracle steers along."""
    handles = kitchen_handles(qpos, params)
    rad = handles - params.pivots
    tan = jnp.cross(params.axes, rad)
    tan = tan / jnp.maximum(jnp.linalg.norm(tan, axis=-1, keepdims=True),
                            1e-9)
    return jnp.where(params.rotary[:, None] > 0.5, tan, params.axes)


def _segment_dist(p: jnp.ndarray, centers: jnp.ndarray, bar_dirs: jnp.ndarray,
                  halflen: jnp.ndarray) -> jnp.ndarray:
    """Distance from point p [3] to each handle bar segment [7]."""
    d = p[None, :] - centers                                   # [7,3]
    along = jnp.sum(d * bar_dirs, axis=-1)                     # [7]
    along = jnp.clip(along, -halflen, halflen)
    closest = centers + bar_dirs * along[:, None]
    return jnp.linalg.norm(p[None, :] - closest, axis=-1)


def _angular_advance(p_old: jnp.ndarray, p_new: jnp.ndarray,
                     params: KitchenParams) -> jnp.ndarray:
    """Signed fingertip angle swept about each element's axis [7] — the
    exact quasi-static drive of a hooked handle (the hook constrains the
    bar to the finger's angular coordinate; radial motion slides along
    the hook and does not drive)."""
    u_old = p_old[None, :] - params.pivots
    u_new = p_new[None, :] - params.pivots
    ax = params.axes
    po = u_old - ax * jnp.sum(u_old * ax, axis=-1, keepdims=True)
    pn = u_new - ax * jnp.sum(u_new * ax, axis=-1, keepdims=True)
    cross = jnp.sum(ax * jnp.cross(po, pn), axis=-1)
    dot = jnp.sum(po * pn, axis=-1)
    return jnp.arctan2(cross, jnp.maximum(dot, 1e-12))


def _collides(p: jnp.ndarray, params: KitchenParams) -> jnp.ndarray:
    """Fingertip vs furniture: cabinet face half-space + microwave body AABB
    (the microwave handle sits in front of micro_lo[1])."""
    behind_wall = p[1] > params.wall_y
    in_micro = _in_box(p, params.micro_lo, params.micro_hi)
    return behind_wall | in_micro


def kitchen_step(state: KitchenState, action: jnp.ndarray,
                 params: KitchenParams = DEFAULT_KITCHEN_PARAMS,
                 ) -> Tuple[KitchenState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One 12.5 Hz control step. Returns (state, obs30, reward, done)."""
    a = jnp.clip(action, -1.0, 1.0) * ACT_AMP

    # robot: velocity-integrated joints, clamped to limits
    q_cand = jnp.clip(state.qpos[:9] + a * CONTROL_DT, _JOINT_LO, _JOINT_HI)
    ee_cand = panda_fk(q_cand[:7], KITCHEN_BASE_POS)

    # fingertip/furniture collision: block arm motion that starts OR deepens
    # a penetration (motion that exits the volume is allowed, so the arm
    # never wedges). Finger joints (7:9) always move — they are internal.
    hit_new = _collides(ee_cand, params)
    hit_old = _collides(state.ee_pos, params)
    blocked = hit_new & ~hit_old
    q_rob = jnp.where(blocked, state.qpos[:9], q_cand)
    q_rob = q_rob.at[7:9].set(q_cand[7:9])
    ee_new = jnp.where(blocked, state.ee_pos, ee_cand)
    ee_disp = ee_new - state.ee_pos

    # objects (v2 arc law): a fingertip HOOKED on a handle bar (within
    # interact_radius of the segment at the START of the step — the handle
    # is dragged along WITH the finger during the step) advances the joint
    # by drive_eff x its own angular advance about the element axis (slide:
    # linear advance along the axis). Contact persists only if the finger
    # ends the step within interact_radius of the DRIVEN handle position —
    # a straight-pulling fingertip departs the arc and disengages, the
    # measured slip behavior (calibrate_kitchen.py straight-pull goldens);
    # a yank that outruns the handle drops it with no drive.
    handles = kitchen_handles(state.qpos, params)
    dist_old = _segment_dist(state.ee_pos, handles, params.bar_dirs,
                             params.bar_halflen)
    hooked = dist_old < params.interact_radius
    dphi = _angular_advance(state.ee_pos, ee_new, params)
    dlin = jnp.einsum("td,d->t", params.axes, ee_disp)
    drive_try = jnp.where(params.rotary > 0.5, dphi, dlin) \
        * params.drive_eff * hooked
    # clip to the element joint ranges BEFORE the keep check: near a joint
    # limit the applied drive is clamped (line ~433), so keep/drop must be
    # decided from a handle position the clipped joint can reach (ADVICE r3)
    q_try = jnp.clip(state.qpos[PRIMARY] + drive_try,
                     OBJ_LO[PRIMARY - 9], OBJ_HI[PRIMARY - 9])
    qpos_try = state.qpos
    for t in range(6):
        qpos_try = qpos_try.at[int(_PRIMARY[t])].set(q_try[t])
    handles_end = kitchen_handles(qpos_try, params)
    dist_end = _segment_dist(ee_new, handles_end, params.bar_dirs,
                             params.bar_halflen)
    keep = dist_end < params.interact_radius
    drive = drive_try * keep
    handle_dist = _segment_dist(ee_new, handles, params.bar_dirs,
                                params.bar_halflen)  # kettle grasp metric

    qpos_new = state.qpos.at[:9].set(q_rob)
    # articulated elements (all but kettle); secondary joints follow the
    # primary's motion at a fixed ratio (goal-value ratios of the task table)
    for t in range(6):
        p = int(_PRIMARY[t]) - 9
        s = int(_SECONDARY[t]) - 9
        qpos_new = qpos_new.at[9 + p].add(drive[t])
        if s != p:
            qpos_new = qpos_new.at[9 + s].add(drive[t] * SECONDARY_RATIO[t])

    # ---- kettle: gripper-latched grasp (v1) ----
    # engage: fingertip inside grasp_radius AND fingers closed (the two real
    # finger DoFs qpos[7:9], limits [0, 0.04]); release: fingers opened or
    # the hand torn away beyond release_radius. While grasped the kettle
    # tracks fingertip displacement with slip gain and a speed cap.
    grip = jnp.mean(q_rob[7:9])
    fingers_closed = grip < params.grip_close_thresh
    fingers_open = grip > params.grip_open_thresh
    kettle_dist = handle_dist[6]
    engage = (~state.kettle_grasped & (kettle_dist < params.grasp_radius)
              & fingers_closed)
    release = state.kettle_grasped & (
        fingers_open | (kettle_dist > params.release_radius))
    grasped = (state.kettle_grasped | engage) & ~release

    kettle_disp = ee_disp * params.kettle_gain
    disp_norm = jnp.linalg.norm(kettle_disp)
    kettle_disp = kettle_disp * jnp.minimum(
        1.0, params.kettle_max_speed / jnp.maximum(disp_norm, 1e-9))
    kettle_xyz = state.qpos[23:26] + jnp.where(grasped, 1.0, 0.0) * kettle_disp
    qpos_new = qpos_new.at[23:26].set(kettle_xyz)
    # clamp object joints to their furniture ranges
    qpos_new = qpos_new.at[9:].set(jnp.clip(qpos_new[9:], OBJ_LO, OBJ_HI))

    # ---- completion & reward (kitchen_env.py:87-120) ----
    dists = _task_distances(qpos_new)
    complete_now = dists < BONUS_THRESH
    newly = complete_now & state.tasks_to_complete
    tasks_left = state.tasks_to_complete & ~newly
    completed = state.completed | newly
    order = jnp.where(newly & (state.completion_order < 0),
                      state.steps + 1, state.completion_order)
    reward = jnp.sum(newly.astype(jnp.float32))
    done = state.done | ~jnp.any(tasks_left)

    new_state = KitchenState(
        qpos=qpos_new, ee_pos=ee_new, tasks_to_complete=tasks_left,
        completed=completed, completion_order=order, kettle_grasped=grasped,
        done=done, steps=state.steps + 1)

    # freeze finished envs (fixed-length scan semantics)
    frozen = jax.tree.map(
        lambda new, old: jnp.where(
            jnp.reshape(state.done, state.done.shape + (1,) * (new.ndim - state.done.ndim)),
            old, new),
        new_state, state)
    reward = jnp.where(state.done, 0.0, reward)
    return frozen, kitchen_obs(frozen), reward, frozen.done
