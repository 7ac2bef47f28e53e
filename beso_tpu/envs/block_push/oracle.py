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
    # latch: the play-style detour waypoint has been visited (or skipped)
    detour_done: jnp.ndarray = jnp.zeros((), bool)


class OracleParams(NamedTuple):
    block_order: jnp.ndarray   # [2] int32 permutation of blocks
    target_assign: jnp.ndarray  # [2] int32: target for block_order[i]
    # --- play-style fields (round 4, VERDICT r3 #2) ---------------------
    # Execution-style multimodality mimicking human play data (the public
    # BESO datasets are teleoperated play, `multimodal_push_oracle.py`'s
    # randomization covers only task order/assignment): per-episode draws
    # of approach angle, speed profile, a reach detour waypoint, a
    # goal-agnostic wandering prefix and stop-and-go pauses. Zeros =
    # the clean scripted demonstrator (backward compatible).
    approach_bias: jnp.ndarray = jnp.zeros(())   # rad: pre-push pose swung
    speed_mult: jnp.ndarray = jnp.ones(())       # reach/push speed scale
    detour: jnp.ndarray = jnp.zeros((2,))        # waypoint for the reach
    detour_gate: jnp.ndarray = jnp.zeros(())     # 1.0 = route via detour
    wander_steps: jnp.ndarray = jnp.zeros((), jnp.int32)  # undirected prefix
    pause_prob: jnp.ndarray = jnp.zeros(())      # per-step stop-and-go prob


def sample_oracle_params(key, play_style: bool = False) -> OracleParams:
    """Random order + assignment (multimodal_push_oracle.py:137-147).

    `play_style=True` additionally draws the execution-style fields —
    demos then exhibit human-play-like diversity in HOW each task is
    executed, not only WHICH task comes first."""
    k1, k2, ka, ks, kd, kg, kw, kp = jax.random.split(key, 8)
    first = jax.random.bernoulli(k1).astype(jnp.int32)
    order = jnp.stack([first, 1 - first])
    t_first = jax.random.bernoulli(k2).astype(jnp.int32)
    assign = jnp.stack([t_first, 1 - t_first])
    if not play_style:
        return OracleParams(block_order=order, target_assign=assign)
    return OracleParams(
        block_order=order, target_assign=assign,
        approach_bias=jax.random.uniform(ka, minval=-0.7, maxval=0.7),
        speed_mult=jax.random.uniform(ks, minval=0.6, maxval=1.4),
        detour=jnp.stack([
            jax.random.uniform(kd, minval=0.25, maxval=0.6),
            jax.random.uniform(jax.random.fold_in(kd, 1),
                               minval=-0.35, maxval=0.1)]),
        detour_gate=jax.random.bernoulli(kg, 0.5).astype(jnp.float32),
        wander_steps=jax.random.randint(kw, (), 0, 20),
        pause_prob=jax.random.uniform(kp, minval=0.0, maxval=0.15),
    )


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
    # play style: the pre-push pose is swung around the block by the
    # per-episode approach bias — approaches come in from varied angles
    # and correct during the push (overshoot-and-correct execution)
    ca, sa = jnp.cos(params.approach_bias), jnp.sin(params.approach_bias)
    dir_pre = jnp.stack([ca * dir_bt[0] - sa * dir_bt[1],
                         sa * dir_bt[0] + ca * dir_bt[1]])
    pre_push = bpos - dir_pre * PRE_PUSH_OFFSET
    contact = bpos - dir_bt * CONTACT_OFFSET

    def capped(vec, speed):
        d = jnp.linalg.norm(vec)
        return vec / jnp.maximum(d, 1e-9) * jnp.minimum(d, speed)

    # phase 0: reach the pre-push pose behind the block, optionally via a
    # per-episode detour waypoint (play-style path multimodality); the
    # detour latches done once visited so the oracle cannot oscillate back
    at_detour = jnp.linalg.norm(params.detour - eff) < REACH_TOL * 2
    detour_done = carry.detour_done | at_detour | (params.detour_gate < 0.5)
    via_detour = ~detour_done & (carry.cur_idx == 0)
    reach_goal = jnp.where(via_detour, params.detour, pre_push)
    reach_vec = reach_goal - eff
    reach_dist = jnp.linalg.norm(pre_push - eff)
    reach_act = capped(reach_vec, REACH_SPEED * params.speed_mult)

    # phase 1: stay glued to the contact point and advance into the block;
    # throttle down near the target so the block settles inside the zone
    d_bt = jnp.linalg.norm(to_target)
    speed = PUSH_SPEED * params.speed_mult * jnp.clip(d_bt / 0.08, 0.25, 1.0)
    push_aim = contact + dir_bt * PUSH_ADVANCE
    push_act = capped(push_aim - eff, speed)

    in_phase1 = carry.phase == 1
    action = jnp.where(in_phase1, push_act, reach_act)

    # transitions (the reach->push switch waits for the detour latch)
    block_done = jnp.linalg.norm(bpos - tpos) < GOAL_DIST_TOLERANCE * 0.9
    lost = jnp.linalg.norm(contact - eff) > LOST_CONTACT_DIST
    phase = jnp.where(carry.phase == 0,
                      jnp.where((reach_dist < REACH_TOL) & detour_done, 1, 0),
                      jnp.where(lost, 0, 1))
    next_idx = jnp.where(block_done, carry.cur_idx + 1, carry.cur_idx)
    phase = jnp.where(block_done, 0, phase)
    all_done = next_idx >= 2
    action = jnp.where(all_done, jnp.zeros(2), action)
    return action, OracleCarry(cur_idx=next_idx, phase=phase,
                               detour_done=detour_done)


def rollout_oracle(key, n_steps: int = 200, action_noise: float = 0.0,
                   play_style: bool = False):
    """Single-episode oracle rollout. Returns (obs [T,16], act [T,2],
    completed [4] bool, completion_steps [4]).

    `action_noise` adds gaussian jitter to the executed (and recorded)
    actions — like human play data, noisy demos visit off-trajectory states
    and teach the policy recovery behavior, which a perfectly clean scripted
    demonstrator cannot (closed-loop BC brittleness).

    `play_style` draws per-episode execution-style parameters (approach
    angle, speed, detours) and adds a goal-agnostic WANDERING prefix plus
    stop-and-go pauses — the human-play ingredients (VERDICT r3 #2) that
    make classifier-free guidance sharpening meaningful: wandering puts
    goal-ambiguous behavior mass under every goal label, which dilutes the
    conditional score and is exactly what lambda > 1 amplifies away."""
    k_env, k_par, k_noise, k_wd = jax.random.split(key, 4)
    env = block_push_reset(k_env)
    params = sample_oracle_params(k_par, play_style=play_style)
    carry = oracle_reset()

    def body(c, sk):
        env, oc, step = c
        k, kw, kp = jax.random.split(sk, 3)
        obs = block_push_obs(env)
        action, oc = oracle_policy(env, oc, params)
        if play_style:
            # wandering prefix: a smooth random drift of the effector
            # target, goal-agnostic by construction
            wander_dir = jax.random.normal(k_wd, (2,)) + \
                0.6 * jax.random.normal(kw, (2,))
            wander_act = 0.02 * wander_dir / jnp.maximum(
                jnp.linalg.norm(wander_dir), 1e-9)
            action = jnp.where(step < params.wander_steps, wander_act,
                               action)
            # stop-and-go pauses
            paused = jax.random.bernoulli(kp, params.pause_prob)
            action = jnp.where(paused, jnp.zeros(2), action)
        if action_noise > 0:
            action = action + jax.random.normal(k, (2,)) * action_noise
        env, _, reward, done = block_push_step(env, action)
        return (env, oc, step + 1), (obs, action)

    (env, _, _), (obs, act) = jax.lax.scan(
        body, (env, carry, jnp.zeros((), jnp.int32)),
        jax.random.split(k_noise, n_steps))
    return obs, act, env.completed, env.in_target


def generate_demonstrations(key, n_episodes: int = 64, n_steps: int = 120,
                            action_noise: float = 0.004,
                            play_style: bool = False) -> TrajectoryData:
    """Vectorized demo synthesis: TrajectoryData with onehot task goals in the
    dataset's format (onehot row set at the first completion frame).
    `play_style=True` adds human-play-like execution diversity (see
    rollout_oracle)."""
    keys = jax.random.split(key, n_episodes)
    obs, act, completed, _ = jax.vmap(
        lambda k: rollout_oracle(k, n_steps, action_noise, play_style))(keys)
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
