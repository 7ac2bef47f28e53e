"""Fused evaluation rollouts: denoise loop + env physics in ONE jit'd scan.

This replaces the reference's host-side evaluation stack
(`beso/workspaces/kitchen_workspace_manager.py:213-316`,
`beso/workspaces/block_push_workspace.py:90-216`):

reference (per episode, sequential):      here (all episodes at once):
  python for-loop over 100 episodes        vmap over B parallel envs
  python for-loop over 280 env steps       lax.scan over T steps
  3 sampler NFE at batch 1 on GPU          3 NFE at batch B (one MXU matmul)
  MuJoCo/Bullet C physics + 2x PCIe/step   JAX physics, fully device-resident

Success metrics follow the reference protocol exactly:
* kitchen: result = |completed tasks ∩ expected tasks| where the expected
  set comes from the onehot labels of the goal trajectory
  (kitchen_workspace_manager.py:527-578); success-rate-at-k histograms
  (compute_performance, :455-471).
* block push: result = |completed ∩ expected| / 2 in {0, 0.5, 1}
  (block_push_workspace.py:218-240); reward accumulates env reward.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.agents.policy import PolicyConfig, policy_predict, policy_reset
from beso_tpu.envs.block_push.env import (block_push_obs, block_push_reset,
                                          block_push_step)
from beso_tpu.envs.kitchen.env import kitchen_obs, kitchen_reset, kitchen_step
from beso_tpu.models.scaler import Scaler


class RolloutMetrics(NamedTuple):
    rewards: jnp.ndarray      # [B] total env reward per episode
    results: jnp.ndarray      # [B] conditional success metric
    completed: jnp.ndarray    # [B, n_tasks] bool
    env_steps: jnp.ndarray    # [] total env steps executed (B * T)
    completion_order: jnp.ndarray  # [B, n_tasks] int32 completion step, -1 if
    #                                never completed (feeds the kitchen
    #                                trajectory census + task-transition tree,
    #                                kitchen_workspace_manager.py:564-570)


def average_success_metric(results: np.ndarray) -> float:
    """Fraction of fully successful episodes — tf_agents AverageSuccessMetric
    equivalent (beso/envs/block_pushing/metrics.py:27-60, unused dead code in
    the reference because tf_agents was not installed)."""
    return float((np.asarray(results) >= 1.0).mean())


def average_final_goal_distance(goal_distances: np.ndarray) -> float:
    """Mean final goal distance — tf_agents AverageFinalGoalDistance
    equivalent (metrics.py:63-95)."""
    return float(np.asarray(goal_distances).mean())


def success_rate_histogram(n_completed: np.ndarray, max_k: int = 5) -> dict:
    """success_rate_k = fraction of episodes with >= k completions
    (kitchen_workspace_manager.py:553-563,455-471)."""
    n = np.asarray(n_completed)
    return {f"success_rate_{k}": float((n >= k).mean()) for k in range(1, max_k + 1)}


def _run_rollout(reset_fn, step_fn, obs_fn, n_tasks, completed_of,
                 denoise_fn, scaler: Scaler, cfg: PolicyConfig,
                 goals, expected: jnp.ndarray, key,
                 n_steps: int, obs_slice: Optional[int],
                 result_divisor: float, order_of=None,
                 reset_batch=None, denoise_factory=None) -> RolloutMetrics:
    B = expected.shape[0]
    k_reset, k_roll = jax.random.split(key)
    if reset_batch is not None:  # e.g. known-start kitchen evaluation
        env_state = reset_batch(k_reset)
    else:
        env_state = jax.vmap(reset_fn)(jax.random.split(k_reset, B))
    obs0_full = jax.vmap(obs_fn)(env_state)
    if callable(goals):
        goals = goals(obs0_full)  # live-state-dependent goals (flip fix)
    if denoise_factory is not None:
        # per-episode specialized engine (e.g. the prefix-KV cache,
        # models/cached.py) — built here, after goals are materialized,
        # inside the rollout's jit region so the cache lives on device
        denoise_fn = denoise_factory(goals)
    obs0 = obs0_full[:, :obs_slice] if obs_slice is not None else obs0_full
    pstate = policy_reset(B, cfg)

    def body(carry, step_key):
        env_state, pstate, obs, total_reward = carry
        action, pstate = policy_predict(denoise_fn, scaler, pstate, obs,
                                        goals, step_key, cfg)
        env_state, obs_full, reward, done = jax.vmap(step_fn)(env_state, action)
        obs_new = obs_full[:, :obs_slice] if obs_slice is not None else obs_full
        return (env_state, pstate, obs_new, total_reward + reward), None

    step_keys = jax.random.split(k_roll, n_steps)
    (env_state, _, _, total_reward), _ = jax.lax.scan(
        body, (env_state, pstate, obs0, jnp.zeros((B,))), step_keys)

    completed = completed_of(env_state)
    results = jnp.sum(completed & expected.astype(bool), axis=-1) / result_divisor
    order = (order_of(env_state) if order_of is not None
             else jnp.full(completed.shape, -1, jnp.int32))
    return RolloutMetrics(rewards=total_reward, results=results,
                          completed=completed,
                          env_steps=jnp.asarray(B * n_steps),
                          completion_order=order)


def rollout_kitchen(denoise_fn, scaler: Scaler, cfg: PolicyConfig,
                    goals: jnp.ndarray,      # [B, G, 30] dataset-tail goals
                    expected: jnp.ndarray,   # [B, 7] expected-task masks
                    key, n_steps: int = 280,
                    physics_params=None,
                    init_qpos: Optional[jnp.ndarray] = None,
                    denoise_factory=None) -> RolloutMetrics:
    """Batched multigoal kitchen evaluation
    (kitchen_workspace_manager.py:213-316: 100 episodes x 280 steps).

    `physics_params`: optional KitchenParams override — evaluate under
    perturbed surrogate physics (robustness protocol, envs/kitchen/env.py).
    `init_qpos`: optional [B, 30] known start states, one per episode — the
    reference's `_start_from_known` path
    (kitchen_workspace_manager.py:500-525)."""
    from beso_tpu.envs.kitchen.env import (DEFAULT_KITCHEN_PARAMS,
                                           kitchen_reset_from_qpos)

    params = (physics_params if physics_params is not None
              else DEFAULT_KITCHEN_PARAMS)
    reset_fn, reset_batch = kitchen_reset, None
    if init_qpos is not None:
        init_qpos = jnp.asarray(init_qpos)
        assert init_qpos.shape[0] == expected.shape[0], \
            "init_qpos must provide one start state per episode"

        def reset_batch(key):  # deterministic per-episode known starts
            del key
            return jax.vmap(kitchen_reset_from_qpos)(init_qpos)

    step_fn = lambda s, a: kitchen_step(s, a, params)  # noqa: E731
    return _run_rollout(
        reset_fn, step_fn, kitchen_obs, 7,
        lambda s: s.completed, denoise_fn, scaler, cfg, goals, expected, key,
        n_steps, obs_slice=30, result_divisor=1.0,
        order_of=lambda s: s.completion_order, reset_batch=reset_batch,
        denoise_factory=denoise_factory)


def rollout_block_push(denoise_fn, scaler: Scaler, cfg: PolicyConfig,
                       goal_frames: jnp.ndarray,  # [B, 16] dataset final frames
                       expected: jnp.ndarray,     # [B, 4]
                       key, n_steps: int = 300,
                       goal_seq_len: int = 1,
                       reduce_obs_dim: bool = True,
                       mask_targets: bool = False,
                       denoise_factory=None) -> RolloutMetrics:
    """Batched block-push evaluation (block_push_workspace.py:90-216:
    100 episodes x 300 steps; result = |completed ∩ expected| / 2).

    The flip-fixed goal (envs/block_push/goals.py) is built from the live
    reset observations inside the rollout."""
    from beso_tpu.envs.block_push.goals import build_block_push_goals

    def goals_builder(obs0_full):
        return build_block_push_goals(obs0_full, goal_frames, goal_seq_len,
                                      zero_goals=True,
                                      reduce_obs_dim=reduce_obs_dim)

    def step_masked(state, action):
        s, o, r, d = block_push_step(state, action)
        if mask_targets and not reduce_obs_dim:
            o = o.at[..., 10:].set(0.0)
        return s, o, r, d

    return _run_rollout(
        block_push_reset, step_masked, block_push_obs, 4,
        lambda s: s.completed, denoise_fn, scaler, cfg, goals_builder,
        expected, key, n_steps,
        obs_slice=10 if reduce_obs_dim else None, result_divisor=2.0,
        denoise_factory=denoise_factory)
