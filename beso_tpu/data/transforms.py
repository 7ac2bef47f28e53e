"""Observation/goal masking transforms for block push.

Functional parity target: `blockpush_mask_targets` (`beso/envs/utils.py:13-77`),
4 variants by (mask_targets, reduce_obs_dim): optionally zero obs[..., 10:]
(target poses), and zero the non-block goal dims — [2, 5, 6, 7, 8, 9] for
10-dim goals, plus [10..15] for full 16-dim goals.
"""

from __future__ import annotations

import jax.numpy as jnp

_GOAL_ZERO_10 = (2, 5, 6, 7, 8, 9)
_GOAL_ZERO_16 = (2, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def zero_goal_dims(goal: jnp.ndarray) -> jnp.ndarray:
    """Zero the non-block-position goal dims by trailing dimension size."""
    dims = _GOAL_ZERO_10 if goal.shape[-1] <= 10 else _GOAL_ZERO_16
    return goal.at[..., jnp.asarray(dims)].set(0.0)


def blockpush_mask_targets(mask_targets: bool = False,
                           reduce_obs_dim: bool = False):
    """Batch-dict transform factory (envs/utils.py:13-77)."""

    def transform(batch: dict) -> dict:
        batch = dict(batch)
        if mask_targets:
            obs = batch["observation"]
            batch["observation"] = obs.at[..., 10:].set(0.0)
        if "goal_observation" in batch:
            batch["goal_observation"] = zero_goal_dims(batch["goal_observation"])
        return batch

    return transform
