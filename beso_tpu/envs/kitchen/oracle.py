"""Scripted kitchen demonstrator: differential-IK task executor.

NEW capability (the reference has no kitchen oracle — its relay-kitchen data
came from human teleoperation): a jit-able phase machine that walks a task
sequence, steering the Panda fingertip to each object handle with
damped-least-squares differential IK (jacobian of beso_tpu.envs.kitchen.fk)
and then driving the object joint toward its goal value. Used to synthesize
kitchen demonstrations (obs 30 / act 9 / onehot 7 labels, the relay-kitchen
format) for end-to-end training validation, since the public dataset is not
vendored.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.data.trajectories import TrajectoryData
from beso_tpu.envs.kitchen.env import (ACT_AMP, CONTROL_DT, DRIVE_DIRS,
                                       GOAL_VEC, HANDLES, INTERACT_RADIUS,
                                       PRIMARY, KitchenState, kitchen_obs,
                                       kitchen_reset, kitchen_step)
from beso_tpu.envs.kitchen.fk import panda_fk

REACH_SPEED = 0.08      # m per control step while approaching
MANIP_SPEED = 0.05      # m per control step while manipulating


TASK_BUDGET = 70  # steps before the oracle gives up on a stuck task


class KitchenOracleCarry(NamedTuple):
    task_ptr: jnp.ndarray    # [] int32 index into the task sequence
    task_steps: jnp.ndarray  # [] int32 steps spent on the current task


def sample_task_sequence(key, n_tasks: int = 4) -> jnp.ndarray:
    """Random task sequence [4] over the 7 elements, -1 padded."""
    perm = jax.random.permutation(key, 7)
    seq = perm[:n_tasks].astype(jnp.int32)
    return jnp.pad(seq, (0, 4 - n_tasks), constant_values=-1)


def oracle_reset() -> KitchenOracleCarry:
    return KitchenOracleCarry(task_ptr=jnp.zeros((), jnp.int32),
                              task_steps=jnp.zeros((), jnp.int32))


def kitchen_oracle_policy(state: KitchenState, carry: KitchenOracleCarry,
                          task_seq: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, KitchenOracleCarry]:
    """One scripted step for a SINGLE env (vmap for batches)."""
    ptr = jnp.minimum(carry.task_ptr, 3)
    task = jnp.maximum(task_seq[ptr], 0)
    active = (task_seq[ptr] >= 0) & (carry.task_ptr < 4)

    ee = state.ee_pos
    handles = HANDLES.at[6].set(state.qpos[23:26])  # kettle handle tracks it
    handle = handles[task]
    near = jnp.linalg.norm(ee - handle) < INTERACT_RADIUS * 0.7

    # desired fingertip displacement
    reach_vec = handle - ee
    reach_d = jnp.linalg.norm(reach_vec)
    reach_dx = reach_vec / jnp.maximum(reach_d, 1e-9) * jnp.minimum(
        reach_d, REACH_SPEED)
    # manipulation: drive the fingertip along +-drive_dir so the primary
    # joint moves TOWARD its goal value; the kettle (task 6) tracks its goal
    # position directly
    q_primary = state.qpos[PRIMARY[task]]
    goal_primary = GOAL_VEC[PRIMARY[task]]
    sign = jnp.sign(goal_primary - q_primary)
    manip_dx = DRIVE_DIRS[task] * sign * MANIP_SPEED
    kettle_vec = GOAL_VEC[23:26] - state.qpos[23:26]
    kettle_dx = kettle_vec / jnp.maximum(jnp.linalg.norm(kettle_vec), 1e-9) \
        * jnp.minimum(jnp.linalg.norm(kettle_vec), MANIP_SPEED)
    manip_dx = jnp.where(task == 6, kettle_dx, manip_dx)

    dx = jnp.where(near, manip_dx, reach_dx)
    dx = jnp.where(active, dx, jnp.zeros(3))

    # differential IK: joint velocities from the fingertip jacobian
    from beso_tpu.envs.kitchen.env import KITCHEN_BASE_POS
    J = jax.jacfwd(lambda q: panda_fk(q, KITCHEN_BASE_POS))(state.qpos[:7])
    H = J @ J.T + 1e-4 * jnp.eye(3)
    dq = J.T @ jnp.linalg.solve(H, dx)
    action7 = dq / (ACT_AMP * CONTROL_DT)
    action = jnp.clip(jnp.concatenate([action7, jnp.zeros(2)]), -1.0, 1.0)

    task_done = state.completed[task] & active
    timed_out = carry.task_steps >= TASK_BUDGET
    advance = task_done | (timed_out & active)
    ptr_next = jnp.where(advance, carry.task_ptr + 1, carry.task_ptr)
    steps_next = jnp.where(advance, 0, carry.task_steps + 1)
    return action, KitchenOracleCarry(task_ptr=ptr_next, task_steps=steps_next)


def rollout_kitchen_oracle(key, n_steps: int = 280, n_tasks: int = 4,
                           action_noise: float = 0.0):
    """Single oracle episode: (obs [T,30], act [T,9], completed [7],
    completion_order [7]). `action_noise` jitters the executed+recorded
    actions so demos cover recovery states (see block_push oracle)."""
    k_seq, k_noise = jax.random.split(key)
    task_seq = sample_task_sequence(k_seq, n_tasks)
    env = kitchen_reset(key)
    carry = oracle_reset()

    def body(c, k):
        env, oc = c
        obs = kitchen_obs(env)
        action, oc = kitchen_oracle_policy(env, oc, task_seq)
        if action_noise > 0:
            action = jnp.clip(action + jax.random.normal(k, (9,)) * action_noise,
                              -1.0, 1.0)
        env, _, _, _ = kitchen_step(env, action)
        return (env, oc), (obs, action)

    (env, _), (obs, act) = jax.lax.scan(body, (env, carry),
                                        jax.random.split(k_noise, n_steps))
    return obs, act, env.completed, env.completion_order


def generate_kitchen_demonstrations(key, n_episodes: int = 64,
                                    n_steps: int = 280, n_tasks: int = 4,
                                    action_noise: float = 0.02
                                    ) -> TrajectoryData:
    """Relay-kitchen-format demos: onehot label row at each completion frame."""
    keys = jax.random.split(key, n_episodes)
    obs, act, completed, order = jax.vmap(
        lambda k: rollout_kitchen_oracle(k, n_steps, n_tasks, action_noise))(keys)
    obs, act = np.asarray(obs), np.asarray(act)
    completed, order = np.asarray(completed), np.asarray(order)
    onehot = np.zeros((n_episodes, n_steps, 7), np.float32)
    last_completion = np.zeros(n_episodes, np.int64)
    for i in range(n_episodes):
        for t in range(7):
            if completed[i, t] and 0 < order[i, t] <= n_steps:
                onehot[i, order[i, t] - 1, t] = 1.0
                last_completion[i] = max(last_completion[i], order[i, t] - 1)
    # truncate idle tails (see block_push oracle: idle-dominated demos teach
    # the policy to stand still)
    lengths = np.where(last_completion > 0,
                       np.minimum(last_completion + 10, n_steps),
                       n_steps).astype(np.int32)
    return TrajectoryData(observations=obs, actions=act, lengths=lengths,
                          onehot_goals=onehot)
