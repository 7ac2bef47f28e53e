"""Scripted kitchen demonstrator: differential-IK task executor.

NEW capability (the reference has no kitchen oracle — its relay-kitchen data
came from human teleoperation): a jit-able phase machine that walks a task
sequence, steering the Panda fingertip to each object handle with
damped-least-squares differential IK (jacobian of beso_tpu.envs.kitchen.fk)
and then driving the object joint toward its goal value. The kettle task
operates the real finger DoFs: open on approach, close inside the grasp
radius, carry, release at the goal (see KitchenParams in envs/kitchen/env).
Used to synthesize kitchen demonstrations (obs 30 / act 9 / onehot 7 labels,
the relay-kitchen format) for end-to-end training validation, since the
public dataset is not vendored.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.data.trajectories import TrajectoryData
from beso_tpu.envs.kitchen.env import (ACT_AMP, CONTROL_DT,
                                       DEFAULT_KITCHEN_PARAMS, GOAL_VEC,
                                       KITCHEN_BASE_POS, PRIMARY,
                                       KitchenParams, KitchenState,
                                       handle_tangents, kitchen_handles,
                                       kitchen_obs, kitchen_reset,
                                       kitchen_step)
from beso_tpu.envs.kitchen.fk import panda_fk

REACH_SPEED = 0.08      # m per control step while approaching
MANIP_SPEED = 0.05      # m per control step while manipulating
CORR_BLEND = 1.0        # fraction of off-arc error corrected per step

TASK_BUDGET = 70  # steps before the oracle gives up on a stuck task


class KitchenOracleCarry(NamedTuple):
    task_ptr: jnp.ndarray    # [] int32 index into the task sequence
    task_steps: jnp.ndarray  # [] int32 steps spent on the current task
    # latch: the play-style detour (visit another element first) is done
    detour_done: jnp.ndarray = jnp.zeros((), bool)


class KitchenOracleStyle(NamedTuple):
    """Per-episode execution style (round 4, VERDICT r3 #2): human play
    data wanders between elements, varies speed and pauses; zeros/ones =
    the clean scripted demonstrator. `detour_task` routes the first reach
    via ANOTHER element's handle — goal-ambiguous motion mass that dilutes
    the conditional score, the precondition for CFG lambda > 1 gains."""

    speed_mult: jnp.ndarray = jnp.ones(())
    detour_task: jnp.ndarray = jnp.zeros((), jnp.int32)
    detour_gate: jnp.ndarray = jnp.zeros(())
    wander_steps: jnp.ndarray = jnp.zeros((), jnp.int32)
    wander_dir: jnp.ndarray = jnp.zeros((3,))
    pause_prob: jnp.ndarray = jnp.zeros(())


CLEAN_STYLE = KitchenOracleStyle()


def sample_kitchen_style(key, play_style: bool = False) -> KitchenOracleStyle:
    if not play_style:
        return CLEAN_STYLE
    ks, kd, kg, kw, kv, kp = jax.random.split(key, 6)
    wd = jax.random.normal(kv, (3,))
    return KitchenOracleStyle(
        speed_mult=jax.random.uniform(ks, minval=0.6, maxval=1.3),
        detour_task=jax.random.randint(kd, (), 0, 7),
        detour_gate=jax.random.bernoulli(kg, 0.5).astype(jnp.float32),
        wander_steps=jax.random.randint(kw, (), 0, 25),
        wander_dir=wd / jnp.maximum(jnp.linalg.norm(wd), 1e-9),
        pause_prob=jax.random.uniform(kp, minval=0.0, maxval=0.12),
    )


def sample_task_sequence(key, n_tasks: int = 4,
                         kettle_boost: float = 0.0) -> jnp.ndarray:
    """Random task sequence [4] over the 7 elements, -1 padded.

    `kettle_boost`: probability of forcing the kettle (task 6, the
    measured hardest element — tight 0.05 m grasp radius) to LEAD the
    sequence — a data-curriculum knob that raises kettle practice frames
    without changing the demo format."""
    k_perm, k_boost = jax.random.split(key)
    perm = jax.random.permutation(k_perm, 7)
    if kettle_boost > 0.0:
        force = jax.random.bernoulli(k_boost, kettle_boost)
        kettle_pos = jnp.argmax(perm == 6)
        swapped = perm.at[kettle_pos].set(perm[0]).at[0].set(6)
        perm = jnp.where(force, swapped, perm)
    seq = perm[:n_tasks].astype(jnp.int32)
    return jnp.pad(seq, (0, 4 - n_tasks), constant_values=-1)


def oracle_reset() -> KitchenOracleCarry:
    return KitchenOracleCarry(task_ptr=jnp.zeros((), jnp.int32),
                              task_steps=jnp.zeros((), jnp.int32))


def kitchen_oracle_policy(state: KitchenState, carry: KitchenOracleCarry,
                          task_seq: jnp.ndarray,
                          params: KitchenParams = DEFAULT_KITCHEN_PARAMS,
                          style: KitchenOracleStyle = CLEAN_STYLE,
                          ) -> Tuple[jnp.ndarray, KitchenOracleCarry]:
    """One scripted step for a SINGLE env (vmap for batches)."""
    ptr = jnp.minimum(carry.task_ptr, 3)
    task = jnp.maximum(task_seq[ptr], 0)
    active = (task_seq[ptr] >= 0) & (carry.task_ptr < 4)
    is_kettle = task == 6

    ee = state.ee_pos
    handles = kitchen_handles(state.qpos, params)  # handles ride their doors
    handle = handles[task]
    # play-style detour: before the first task, swing by another element's
    # handle (latched once visited) — goal-agnostic play-like motion
    detour_pt = handles[style.detour_task] + jnp.asarray([0.0, -0.06, 0.04])
    at_detour = jnp.linalg.norm(detour_pt - ee) < 0.06
    detour_done = (carry.detour_done | at_detour | (style.detour_gate < 0.5)
                   | (carry.task_ptr > 0))
    via_detour = ~detour_done
    handle = jnp.where(via_detour, detour_pt, handle)
    dist = jnp.linalg.norm(ee - handle)
    # manipulate as soon as the fingertip is hooked (inside the engagement
    # radius) — a tighter switch threshold would flip back to 'reach' when
    # the handle trails by the contact lag, and a hooked fingertip moving
    # BACK toward the handle drags the door shut (angular-advance law)
    near = (dist < jnp.where(is_kettle, params.grasp_radius * 0.7,
                             params.interact_radius)) & detour_done

    # desired fingertip displacement while approaching
    reach_vec = handle - ee
    reach_d = jnp.linalg.norm(reach_vec)
    reach_dx = reach_vec / jnp.maximum(reach_d, 1e-9) * jnp.minimum(
        reach_d, REACH_SPEED * style.speed_mult)

    # manipulation (v2 arc law): advance along the handle's CURRENT arc
    # tangent toward the goal joint value, fully correcting any off-arc
    # error each step so the fingertip stays hooked inside the tight
    # measured interact_radius. Speed tapers with the remaining joint
    # distance (drive = eff x angular advance, so the arc step that lands
    # exactly on the goal is |goal-q|/eff x r) and is capped at a fraction
    # of the handle radius so small knobs are swept in a few engaged steps
    # instead of one disengaging flick.
    q_primary = state.qpos[PRIMARY[task]]
    goal_primary = GOAL_VEC[PRIMARY[task]]
    sign = jnp.sign(goal_primary - q_primary)
    tangent = handle_tangents(state.qpos, params)[task]
    rad_vec = handle - params.pivots[task]
    ax = params.axes[task]
    r_arc = jnp.linalg.norm(rad_vec - ax * jnp.sum(rad_vec * ax))
    is_rotary = params.rotary[task] > 0.5
    eff = jnp.maximum(params.drive_eff[task], 1e-3)
    need = jnp.abs(goal_primary - q_primary) / eff
    need_lin = jnp.where(is_rotary, need * r_arc, need)
    speed = jnp.minimum(MANIP_SPEED,
                        jnp.where(is_rotary, 0.6 * r_arc, MANIP_SPEED))
    step_len = jnp.minimum(speed, need_lin)
    perp_err = reach_vec - tangent * jnp.sum(tangent * reach_vec)
    manip_dx = tangent * sign * step_len + CORR_BLEND * perp_err

    # kettle: once grasped, carry it straight to its goal position
    kettle_vec = GOAL_VEC[23:26] - state.qpos[23:26]
    kettle_d = jnp.linalg.norm(kettle_vec)
    kettle_dx = kettle_vec / jnp.maximum(kettle_d, 1e-9) * jnp.minimum(
        kettle_d, MANIP_SPEED)
    # until the grasp latches, hold still at the handle (close the fingers)
    kettle_dx = jnp.where(state.kettle_grasped, kettle_dx, 0.0)
    manip_dx = jnp.where(is_kettle, kettle_dx, manip_dx)

    dx = jnp.where(near | (is_kettle & state.kettle_grasped), manip_dx, reach_dx)
    # play-style wandering prefix: undirected fingertip drift before work
    wandering = (carry.task_ptr == 0) & (carry.task_steps < style.wander_steps)
    dx = jnp.where(wandering, 0.04 * style.wander_dir, dx)
    dx = jnp.where(active, dx, jnp.zeros(3))

    # differential IK: joint velocities from the fingertip jacobian
    J = jax.jacfwd(lambda q: panda_fk(q, KITCHEN_BASE_POS))(state.qpos[:7])
    H = J @ J.T + 1e-4 * jnp.eye(3)
    dq = J.T @ jnp.linalg.solve(H, dx)
    action7 = dq / (ACT_AMP * CONTROL_DT)

    # fingers: close at the kettle handle (until done carrying), open
    # everywhere else so no accidental grasp happens in transit
    kettle_done = state.completed[6]
    close = is_kettle & near & ~kettle_done & active
    finger_act = jnp.where(close, -1.0, 1.0)
    action = jnp.clip(jnp.concatenate([action7, jnp.full((2,), finger_act)]),
                      -1.0, 1.0)

    task_done = state.completed[task] & active
    timed_out = carry.task_steps >= TASK_BUDGET
    advance = task_done | (timed_out & active)
    ptr_next = jnp.where(advance, carry.task_ptr + 1, carry.task_ptr)
    steps_next = jnp.where(advance, 0, carry.task_steps + 1)
    return action, KitchenOracleCarry(task_ptr=ptr_next,
                                      task_steps=steps_next,
                                      detour_done=detour_done)


def rollout_kitchen_oracle(key, n_steps: int = 280, n_tasks: int = 4,
                           action_noise: float = 0.0,
                           params: KitchenParams = DEFAULT_KITCHEN_PARAMS,
                           play_style: bool = False,
                           kettle_boost: float = 0.0):
    """Single oracle episode: (obs [T,30], act [T,9], completed [7],
    completion_order [7], task_seq [4]). `action_noise` jitters the
    executed+recorded actions so demos cover recovery states; `play_style`
    draws per-episode execution styles (detour via another element,
    speed, wandering prefix, pauses) — see KitchenOracleStyle."""
    k_seq, k_noise, k_style = jax.random.split(key, 3)
    task_seq = sample_task_sequence(k_seq, n_tasks, kettle_boost)
    style = sample_kitchen_style(k_style, play_style=play_style)
    env = kitchen_reset(key)
    carry = oracle_reset()

    def body(c, k):
        env, oc = c
        obs = kitchen_obs(env)
        action, oc = kitchen_oracle_policy(env, oc, task_seq, params, style)
        if play_style:
            paused = jax.random.bernoulli(jax.random.fold_in(k, 1),
                                          style.pause_prob)
            action = jnp.where(paused, jnp.zeros(9), action)
        if action_noise > 0:
            action = jnp.clip(action + jax.random.normal(k, (9,)) * action_noise,
                              -1.0, 1.0)
        env, _, _, _ = kitchen_step(env, action, params)
        return (env, oc), (obs, action)

    (env, _), (obs, act) = jax.lax.scan(body, (env, carry),
                                        jax.random.split(k_noise, n_steps))
    return obs, act, env.completed, env.completion_order, task_seq


def generate_kitchen_demonstrations(key, n_episodes: int = 64,
                                    n_steps: int = 280, n_tasks: int = 4,
                                    action_noise: float = 0.02,
                                    params: KitchenParams = DEFAULT_KITCHEN_PARAMS,
                                    play_style: bool = False,
                                    kettle_boost: float = 0.0,
                                    ) -> TrajectoryData:
    """Relay-kitchen-format demos: onehot label row at each completion frame.
    `play_style=True` adds human-play-like execution diversity;
    `kettle_boost` leads sequences with the kettle at that probability."""
    keys = jax.random.split(key, n_episodes)
    obs, act, completed, order, _ = jax.vmap(
        lambda k: rollout_kitchen_oracle(k, n_steps, n_tasks, action_noise,
                                         params, play_style,
                                         kettle_boost))(keys)
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
