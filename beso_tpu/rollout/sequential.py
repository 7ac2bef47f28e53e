"""Sequential-goal kitchen evaluation as a masked fixed-length scan.

Functional parity target: `test_agent_on_sequential_tasks`
(`kitchen_workspace_manager.py:318-423`): each episode walks 4 dataset
sub-goals; sub-goal k gets a step budget of
(timeframe_k - timeframe_{k-1} + 50) (k < 4) and the episode advances to the
next sub-goal as soon as the current goal task is completed or the budget is
exhausted; the final sub-goal runs until done or the 280-step cap.

TPU-first design: the data-dependent while/break structure becomes a carried
(stage, stage_steps) per env inside the single fused scan — SURVEY.md 7.3#3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.agents.policy import PolicyConfig, policy_predict, policy_reset
from beso_tpu.envs.kitchen.env import kitchen_obs, kitchen_reset, kitchen_step
from beso_tpu.models.scaler import Scaler
from beso_tpu.rollout.rollout import RolloutMetrics


def rollout_kitchen_sequential(denoise_fn, scaler: Scaler, cfg: PolicyConfig,
                               goals: jnp.ndarray,      # [B, 4, G, 30]
                               timeframes: jnp.ndarray,  # [B, 4]
                               task_ids: jnp.ndarray,    # [B, 4]
                               expected: jnp.ndarray,    # [B, 7]
                               key, n_steps: int = 280,
                               physics_params=None,
                               budget_margin: int = 50) -> RolloutMetrics:
    from beso_tpu.envs.kitchen.env import DEFAULT_KITCHEN_PARAMS

    params = (physics_params if physics_params is not None
              else DEFAULT_KITCHEN_PARAMS)
    B = goals.shape[0]
    k_reset, k_roll = jax.random.split(key)
    env_state = jax.vmap(kitchen_reset)(jax.random.split(k_reset, B))
    obs0 = jax.vmap(kitchen_obs)(env_state)[:, :30]
    pstate = policy_reset(B, cfg)

    # per-stage budgets (kitchen_workspace_manager.py:360-367):
    # stage k<3: tf[k] - tf[k-1] + margin (tf[-1] := 0; the reference's
    # margin is 50 — `budget_margin` sweeps it, VERDICT r2 #7);
    # stage 3: the episode cap
    prev_tf = jnp.concatenate([jnp.zeros((B, 1), timeframes.dtype),
                               timeframes[:, :2]], axis=1)
    budgets = jnp.concatenate([
        timeframes[:, :3] - prev_tf + budget_margin,
        jnp.full((B, 1), n_steps, timeframes.dtype)], axis=1)  # [B, 4]

    def body(carry, step_key):
        env_state, pstate, obs, stage, stage_steps, total_reward = carry
        goal = jnp.take_along_axis(
            goals, stage[:, None, None, None], axis=1)[:, 0]   # [B, G, 30]
        action, pstate = policy_predict(denoise_fn, scaler, pstate, obs,
                                        goal, step_key, cfg)
        env_state, obs_full, reward, done = jax.vmap(
            lambda e, a: kitchen_step(e, a, params))(env_state, action)
        stage_steps = stage_steps + 1
        cur_task = jnp.take_along_axis(task_ids, stage[:, None], axis=1)[:, 0]
        task_done = jnp.take_along_axis(
            env_state.completed, cur_task[:, None], axis=1)[:, 0]
        budget = jnp.take_along_axis(budgets, stage[:, None], axis=1)[:, 0]
        advance = ((task_done | (stage_steps >= budget)) & (stage < 3))
        stage = jnp.where(advance, stage + 1, stage)
        stage_steps = jnp.where(advance, 0, stage_steps)
        return (env_state, pstate, obs_full[:, :30], stage, stage_steps,
                total_reward + reward), None

    carry0 = (env_state, pstate, obs0, jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), jnp.int32), jnp.zeros((B,)))
    (env_state, _, _, _, _, total_reward), _ = jax.lax.scan(
        body, carry0, jax.random.split(k_roll, n_steps))

    completed = env_state.completed
    results = jnp.sum(completed & expected.astype(bool), axis=-1)
    return RolloutMetrics(rewards=total_reward, results=results,
                          completed=completed,
                          env_steps=jnp.asarray(B * n_steps),
                          completion_order=env_state.completion_order)
