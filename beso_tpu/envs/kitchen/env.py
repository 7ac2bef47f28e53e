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

The PHYSICS is a surrogate (v1): the external MuJoCo `adept_envs` simulation
(Franka arm + articulated furniture) is replaced by a fully batched JAX
model — 9-DoF velocity-integrated arm with Panda FK for the fingertip,
contact-gated articulated objects whose joints are driven by projected
fingertip motion near their handles, a gripper-latched kettle grasp using
the two real finger DoFs (qpos[7:9]), and fingertip/furniture collision
against the cabinet face and microwave body. ALL calibration constants live
in `KitchenParams` (a pytree) so evaluation can perturb them
(`perturb_kitchen_params`) to measure policy robustness to surrogate
roughness; `DEFAULT_KITCHEN_PARAMS` is the nominal training physics.
The task/metric surface is exact (SURVEY.md 7.3#1).
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

# articulated-object joint ranges (plausible furniture limits, goal values
# well inside; prevents nonphysical overshoot of the surrogate dynamics).
# Layout: object qpos indices 9..29 -> local 0..20.
_OBJ_LO = np.full(21, -np.inf, np.float32)
_OBJ_HI = np.full(21, np.inf, np.float32)
for _idx, _lo, _hi in [
    (11, -1.5, 0.1), (12, -1.5, 0.1),   # bottom burner knobs
    (15, -1.5, 0.1), (16, -1.5, 0.1),   # top burner knobs
    (17, -1.0, 0.1), (18, -1.0, 0.1),   # light switch
    (19, -0.1, 0.6),                    # slide cabinet
    (20, -0.2, 0.2), (21, -0.1, 1.7),   # hinge cabinet
    (22, -1.6, 0.1),                    # microwave door
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
# physics calibration (v1): everything tunable lives in one pytree
# ---------------------------------------------------------------------------

@struct.dataclass
class KitchenParams:
    """Surrogate contact/interaction calibration. A pytree of arrays, so it
    can be vmapped/perturbed at eval time without recompilation."""

    handles: jnp.ndarray          # [7, 3] world handle positions
    drive_dirs: jnp.ndarray       # [7, 3] unit fingertip directions that
    #                               advance the element's primary joint
    drive_gain: jnp.ndarray       # [7] joint-per-meter drive gains
    interact_radius: jnp.ndarray  # [] fingertip-handle contact radius
    grasp_radius: jnp.ndarray     # [] kettle grasp engage radius
    release_radius: jnp.ndarray   # [] kettle grasp release distance
    grip_close_thresh: jnp.ndarray  # [] mean finger qpos below -> closed
    grip_open_thresh: jnp.ndarray   # [] mean finger qpos above -> open
    kettle_gain: jnp.ndarray      # [] kettle tracking factor (<=1, slip)
    kettle_max_speed: jnp.ndarray  # [] max kettle travel per control step
    wall_y: jnp.ndarray           # [] cabinet face plane (fingertip y <=)
    micro_lo: jnp.ndarray         # [3] microwave body AABB
    micro_hi: jnp.ndarray         # [3]


# scene layout approximated from the adept_envs franka kitchen: microwave
# front-left, burners/knob panel center, light switch above the knobs,
# cabinets up high, kettle on a burner. The robot base is pedestal-mounted
# (world coords where the kettle sits at z~1.62); all handles are verified
# reachable (tests/test_kitchen_oracle.py).
_HANDLES = np.asarray([
    [0.35, 0.90, 1.00],   # bottom burner knob
    [0.35, 0.90, 1.10],   # top burner knob
    [0.25, 0.90, 1.30],   # light switch
    [0.40, 0.85, 1.40],   # slide cabinet handle
    [-0.15, 0.85, 1.40],  # hinge cabinet handle
    [-0.35, 0.75, 0.90],  # microwave door handle
    [-0.27, 0.35, 1.62],  # kettle handle (dynamic: overridden by qpos[23:26])
], np.float32)
_DRIVE_DIRS = np.asarray([
    [-1.0, 0.0, 0.0],    # knob turn ~ lateral motion
    [-1.0, 0.0, 0.0],
    [-1.0, 0.0, 0.0],
    [1.0, 0.0, 0.0],     # slide opens to +x
    [1.0, -0.2, 0.0],    # hinge swings open outward (away from the face)
    [0.7, 0.7, 0.0],     # microwave: + closes the door; opening (goal -0.75)
    #                      pulls the handle out toward -x/-y, clear of the body
    [0.0, 0.0, 0.0],     # kettle: free body, grasp-tracked
], np.float32)
_DRIVE_DIRS = _DRIVE_DIRS / np.maximum(
    np.linalg.norm(_DRIVE_DIRS, axis=1, keepdims=True), 1e-9)

DEFAULT_KITCHEN_PARAMS = KitchenParams(
    handles=jnp.asarray(_HANDLES),
    drive_dirs=jnp.asarray(_DRIVE_DIRS),
    # gains follow the physical articulation law gain ~ 1/handle_radius,
    # anchored by MuJoCo golden single-element scenes
    # (scripts/calibrate_kitchen.py): a sliding door tracks the fingertip
    # 0.99 m/m (so the slide gain is 1.0, measured directly); rotary
    # elements engage at ~0.85/r rad/m (knob lever r=0.05 -> ~17 measured;
    # the shipped knob/hinge gains assume larger adept_envs-scale handles).
    drive_gain=jnp.asarray([6.0, 6.0, 6.0, 1.0, 8.0, 5.0, 0.0]),
    interact_radius=jnp.asarray(0.15),
    grasp_radius=jnp.asarray(0.12),
    release_radius=jnp.asarray(0.25),
    grip_close_thresh=jnp.asarray(0.025),
    grip_open_thresh=jnp.asarray(0.032),
    kettle_gain=jnp.asarray(1.0),
    kettle_max_speed=jnp.asarray(0.12),
    wall_y=jnp.asarray(0.95),
    micro_lo=jnp.asarray([-0.60, 0.80, 0.70]),
    micro_hi=jnp.asarray([-0.15, 1.30, 1.10]),
)

# backward-compat module constants (oracle/tests reference these names)
HANDLES = DEFAULT_KITCHEN_PARAMS.handles
DRIVE_DIRS = DEFAULT_KITCHEN_PARAMS.drive_dirs
DRIVE_GAIN = DEFAULT_KITCHEN_PARAMS.drive_gain
INTERACT_RADIUS = 0.15


def perturb_kitchen_params(params: KitchenParams = DEFAULT_KITCHEN_PARAMS,
                           gain_scale: float = 1.0,
                           radius_scale: float = 1.0,
                           kettle_scale: float = 1.0) -> KitchenParams:
    """Scaled physics for robustness evaluation: train at nominal constants,
    evaluate at +-20% gains/contact radii and report retention (VERDICT.md
    round-1 item 3)."""
    return params.replace(
        drive_gain=params.drive_gain * gain_scale,
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


def kitchen_handles(qpos: jnp.ndarray,
                    params: KitchenParams = DEFAULT_KITCHEN_PARAMS
                    ) -> jnp.ndarray:
    """Current world handle positions [7, 3].

    Handles are rigidly attached to their doors/knobs: each articulated
    element's handle translates along its drive direction by
    q_primary / drive_gain (the inverse of the contact law, so a fingertip
    in sustained contact keeps the handle under it). The kettle handle (row
    6) tracks the kettle body qpos[23:26]."""
    q_primary = qpos[PRIMARY]                                     # [7]
    excursion = q_primary / jnp.maximum(params.drive_gain, 1e-9)  # [7]
    handles = params.handles + params.drive_dirs * excursion[:, None]
    return handles.at[6].set(qpos[23:26])


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

    # objects: fingertip near a handle drives the element's primary joint by
    # the projected fingertip displacement; handles move WITH their doors
    # (kitchen_handles), so sustained contact is possible along the stroke
    handles = kitchen_handles(state.qpos, params)
    handle_dist = jnp.linalg.norm(ee_new[None, :] - handles, axis=-1)  # [7]
    near = handle_dist < params.interact_radius
    drive = jnp.einsum("td,d->t", params.drive_dirs, ee_disp) \
        * params.drive_gain * near

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
