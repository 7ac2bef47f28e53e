"""Scripted multimodal push oracle + demonstration generator.

Functional parity target: `MultimodalOrientedPushOracle`
(`beso/envs/block_pushing/oracles/multimodal_push_oracle.py:29-186`) — the
scripted demonstrator that produced the public training data. In the
reference repo the oracles are DEAD code with broken imports
(oriented_push_oracle.py:18-23, SURVEY.md 2.8); here the oracle is a pure
jit-able phase machine so demonstrations for OUR batched sim can be
synthesized on-device (the public dataset blobs are not vendored):

* per episode a random block order and block->target assignment is drawn
  (multimodal_push_oracle.py:137-147) — this is the multimodality,
* per block: move to a pre-push pose behind the block (relative to its
  target), then push through the block toward the target until it enters
  (phase machine of oriented_push_oracle.py:29-258),
* actions are velocity-capped delta-xy like the recorded data.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.data.trajectories import TrajectoryData
from beso_tpu.envs.block_push.env import (GOAL_DIST_TOLERANCE, BlockPushState,
                                          block_push_obs, block_push_reset,
                                          block_push_step)

PRE_PUSH_OFFSET = 0.07
CONTACT_OFFSET = 0.034   # block half + effector radius - small press-in
PUSH_ADVANCE = 0.012
REACH_SPEED = 0.05
PUSH_SPEED = 0.02
REACH_TOL = 0.015
LOST_CONTACT_DIST = 0.09


class OracleCarry(NamedTuple):
    cur_idx: jnp.ndarray   # [] int32: 0 = first block, 1 = second, 2 = done
    phase: jnp.ndarray     # [] int32: 0 = reach pre-push, 1 = push


class OracleParams(NamedTuple):
    block_order: jnp.ndarray   # [2] int32 permutation of blocks
    target_assign: jnp.ndarray  # [2] int32: target for block_order[i]


def sample_oracle_params(key) -> OracleParams:
    """Random order + assignment (multimodal_push_oracle.py:137-147)."""
    k1, k2 = jax.random.split(key)
    first = jax.random.bernoulli(k1).astype(jnp.int32)
    order = jnp.stack([first, 1 - first])
    t_first = jax.random.bernoulli(k2).astype(jnp.int32)
    assign = jnp.stack([t_first, 1 - t_first])
    return OracleParams(block_order=order, target_assign=assign)


def oracle_reset() -> OracleCarry:
    return OracleCarry(cur_idx=jnp.zeros((), jnp.int32),
                       phase=jnp.zeros((), jnp.int32))


def oracle_policy(state: BlockPushState, carry: OracleCarry,
                  params: OracleParams) -> Tuple[jnp.ndarray, OracleCarry]:
    """One scripted control step for a SINGLE env (vmap for batches)."""
    idx = jnp.minimum(carry.cur_idx, 1)
    block = params.block_order[idx]
    target = params.target_assign[idx]
    bpos = state.block_pos[block]
    tpos = state.target_pos[target]
    # steer relative to the commanded effector TARGET: the env integrates
    # actions into effector_target, which the arm then tracks
    eff = state.effector_target

    to_target = tpos - bpos
    dir_bt = to_target / jnp.maximum(jnp.linalg.norm(to_target), 1e-9)
    pre_push = bpos - dir_bt * PRE_PUSH_OFFSET
    contact = bpos - dir_bt * CONTACT_OFFSET

    def capped(vec, speed):
        d = jnp.linalg.norm(vec)
        return vec / jnp.maximum(d, 1e-9) * jnp.minimum(d, speed)

    # phase 0: reach the pre-push pose behind the block
    reach_vec = pre_push - eff
    reach_dist = jnp.linalg.norm(reach_vec)
    reach_act = capped(reach_vec, REACH_SPEED)

    # phase 1: stay glued to the contact point and advance into the block;
    # throttle down near the target so the block settles inside the zone
    d_bt = jnp.linalg.norm(to_target)
    speed = PUSH_SPEED * jnp.clip(d_bt / 0.08, 0.25, 1.0)
    push_aim = contact + dir_bt * PUSH_ADVANCE
    push_act = capped(push_aim - eff, speed)

    in_phase1 = carry.phase == 1
    action = jnp.where(in_phase1, push_act, reach_act)

    # transitions
    block_done = jnp.linalg.norm(bpos - tpos) < GOAL_DIST_TOLERANCE * 0.9
    lost = jnp.linalg.norm(contact - eff) > LOST_CONTACT_DIST
    phase = jnp.where(carry.phase == 0,
                      jnp.where(reach_dist < REACH_TOL, 1, 0),
                      jnp.where(lost, 0, 1))
    next_idx = jnp.where(block_done, carry.cur_idx + 1, carry.cur_idx)
    phase = jnp.where(block_done, 0, phase)
    all_done = next_idx >= 2
    action = jnp.where(all_done, jnp.zeros(2), action)
    return action, OracleCarry(cur_idx=next_idx, phase=phase)


def rollout_oracle(key, n_steps: int = 200, action_noise: float = 0.0):
    """Single-episode oracle rollout. Returns (obs [T,16], act [T,2],
    completed [4] bool, completion_steps [4]).

    `action_noise` adds gaussian jitter to the executed (and recorded)
    actions — like human play data, noisy demos visit off-trajectory states
    and teach the policy recovery behavior, which a perfectly clean scripted
    demonstrator cannot (closed-loop BC brittleness)."""
    k_env, k_par, k_noise = jax.random.split(key, 3)
    env = block_push_reset(k_env)
    params = sample_oracle_params(k_par)
    carry = oracle_reset()

    def body(c, k):
        env, oc = c
        obs = block_push_obs(env)
        action, oc = oracle_policy(env, oc, params)
        if action_noise > 0:
            action = action + jax.random.normal(k, (2,)) * action_noise
        env, _, reward, done = block_push_step(env, action)
        return (env, oc), (obs, action)

    (env, _), (obs, act) = jax.lax.scan(body, (env, carry),
                                        jax.random.split(k_noise, n_steps))
    return obs, act, env.completed, env.in_target


def generate_demonstrations(key, n_episodes: int = 64, n_steps: int = 120,
                            action_noise: float = 0.004) -> TrajectoryData:
    """Vectorized demo synthesis: TrajectoryData with onehot task goals in the
    dataset's format (onehot row set at the first completion frame)."""
    keys = jax.random.split(key, n_episodes)
    obs, act, completed, _ = jax.vmap(
        lambda k: rollout_oracle(k, n_steps, action_noise))(keys)
    obs, act = np.asarray(obs), np.asarray(act)

    # derive per-frame onehot completion labels from block/target proximity
    onehot = np.zeros((n_episodes, n_steps, 4), np.float32)
    blocks = np.stack([obs[..., 0:2], obs[..., 3:5]], axis=2)   # [N,T,2,2]
    targets = np.stack([obs[..., 10:12], obs[..., 13:15]], axis=2)
    dist = np.linalg.norm(blocks[:, :, :, None] - targets[:, :, None], axis=-1)
    inside = dist < GOAL_DIST_TOLERANCE   # [N, T, block, target]
    last_completion = np.zeros(n_episodes, np.int64)
    for b in range(2):
        for t in range(2):
            first = np.argmax(inside[:, :, b, t], axis=1)
            has = inside[:, :, b, t].any(axis=1)
            for i in range(n_episodes):
                if has[i]:
                    onehot[i, first[i], 2 * b + t] = 1.0
                    last_completion[i] = max(last_completion[i], first[i])
    # truncate each demo shortly after its last completion: the oracle idles
    # (zero actions) once done, and idle-dominated data teaches the policy to
    # stand still (the real teleop demos end at task completion too)
    tail = 5
    lengths = np.where(last_completion > 0,
                       np.minimum(last_completion + tail, n_steps),
                       n_steps).astype(np.int32)
    return TrajectoryData(observations=obs, actions=act, lengths=lengths,
                          onehot_goals=onehot)
