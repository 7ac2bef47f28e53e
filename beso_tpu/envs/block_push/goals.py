"""Block-push evaluation goal functions.

Functional parity target: `beso/envs/block_pushing/data/goals.py:18-116`:

* future: the goal is the FINAL frame of train trajectory
  `train_idx[goal_idx]`, repeated `goal_seq_len` times, with
  - the FLIP FIX (goals.py:64-78): the two target zones spawn in mirrored
    configurations; if the replayed trajectory's target-0 position differs
    from the live env's target-0 by > 0.2, the block columns
    ([0,1] <-> [3,4]) are swapped so the goal matches the live layout,
  - non-block dims zeroed ([2,5,6,7,8,9,10..15], goals.py:79-80),
* onehot: the next incomplete task of the demonstrated order, with
  proximity-based completion removal (goals.py:84-114),
* expected tasks: the set of onehot-labeled tasks (block_push_workspace.py:
  218-240), result = |completed ∩ expected| / 2.

The goal-idx wrap happens at >= 950 (block_push_workspace.py:121-124).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from beso_tpu.data.trajectories import TrajectoryData, get_split_idx

_BLOCK0 = (0, 1)
_BLOCK1 = (3, 4)
_TARGET0 = (10, 11)
_ZERO_DIMS = (2, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _wrap_goal_idx(goal_idx: int) -> int:
    return goal_idx - 950 if goal_idx >= 950 else goal_idx


def block_push_goal_frames(data: TrajectoryData, eval_n_times: int, seed: int,
                           train_fraction: float = 0.95
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Final-frame goal table + expected masks.

    Returns (frames [N, 16], expected [N, 4] bool).
    """
    assert data.onehot_goals is not None
    train_idx, _ = get_split_idx(data.num_trajectories, seed, train_fraction)
    frames = np.zeros((eval_n_times, data.obs_dim), np.float32)
    expected = np.zeros((eval_n_times, 4), bool)
    for i in range(eval_n_times):
        traj = train_idx[_wrap_goal_idx(i) % len(train_idx)]
        T = int(data.lengths[traj])
        frames[i] = data.observations[traj, T - 1]
        expected[i] = data.onehot_goals[traj, :T].max(0) > 0.5
    return frames, expected


def build_block_push_goals(obs0: jnp.ndarray, goal_frames: jnp.ndarray,
                           goal_seq_len: int, zero_goals: bool = True,
                           reduce_obs_dim: bool = True) -> jnp.ndarray:
    """Apply the flip fix against the live reset obs and assemble the goal.

    obs0: [B, 16] live observations after reset (UNmasked).
    goal_frames: [B, 16] dataset final frames.
    Returns [B, G, 10] (reduced) or [B, G, 16].
    """
    tgt0_state = obs0[:, jnp.asarray(_TARGET0)]
    tgt0_goal = goal_frames[:, jnp.asarray(_TARGET0)]
    flipped = jnp.linalg.norm(tgt0_goal - tgt0_state, axis=-1) > 0.2  # [B]

    g = goal_frames
    b0 = g[:, jnp.asarray(_BLOCK0)]
    b1 = g[:, jnp.asarray(_BLOCK1)]
    g_sw = g.at[:, jnp.asarray(_BLOCK0)].set(b1).at[:, jnp.asarray(_BLOCK1)].set(b0)
    g = jnp.where(flipped[:, None], g_sw, g)
    if zero_goals:
        g = g.at[:, jnp.asarray(_ZERO_DIMS)].set(0.0)
    g = jnp.repeat(g[:, None, :], goal_seq_len, axis=1)
    if reduce_obs_dim:
        g = g[..., :10]
    return g


def block_push_onehot_goal(state_obs: jnp.ndarray,
                           demo_order: jnp.ndarray) -> jnp.ndarray:
    """Next-incomplete-task onehot (goals.py:84-114), jit-able.

    state_obs: [B, 16] live obs; demo_order: [B, 4] task ids in demonstrated
    order, padded with -1. A task is 'done' when its block is within 0.05 of
    its target; the goal is the first not-done task, else the last.
    """
    B = state_obs.shape[0]
    blocks = jnp.stack([state_obs[:, jnp.asarray(_BLOCK0)],
                        state_obs[:, jnp.asarray(_BLOCK1)]], axis=1)   # [B,2,2]
    targets = jnp.stack([state_obs[:, jnp.asarray((10, 11))],
                         state_obs[:, jnp.asarray((13, 14))]], axis=1)  # [B,2,2]
    # dist[b, t] -> task 2*b + t done if < 0.05
    dist = jnp.linalg.norm(blocks[:, :, None, :] - targets[:, None, :, :], axis=-1)
    done = (dist < 0.05).reshape(B, 4)  # index 2*b + t
    order_valid = demo_order >= 0
    order_clipped = jnp.maximum(demo_order, 0)
    task_done = jnp.take_along_axis(done, order_clipped, axis=1)
    open_and_valid = order_valid & ~task_done
    has_open = jnp.any(open_and_valid, axis=1)
    first_open = jnp.argmax(open_and_valid, axis=1)
    last_valid = jnp.sum(order_valid, axis=1) - 1
    pick = jnp.where(has_open, first_open, last_valid)
    task = jnp.take_along_axis(order_clipped, pick[:, None], axis=1)[:, 0]
    return jnp.eye(4)[task]


def demo_task_order(data: TrajectoryData, eval_n_times: int, seed: int,
                    train_fraction: float = 0.95) -> np.ndarray:
    """Demonstrated task order per episode [N, 4], -1 padded
    (goals.py:87-92)."""
    assert data.onehot_goals is not None
    train_idx, _ = get_split_idx(data.num_trajectories, seed, train_fraction)
    out = np.full((eval_n_times, 4), -1, np.int32)
    for i in range(eval_n_times):
        traj = train_idx[_wrap_goal_idx(i) % len(train_idx)]
        T = int(data.lengths[traj])
        onehot = data.onehot_goals[traj, :T]
        mask = onehot.max(0) > 0.5
        first_frame = onehot.argmax(0)
        tasks = sorted([(first_frame[t], t) for t in range(4) if mask[t]])
        for j, (_, t) in enumerate(tasks):
            out[i, j] = t
    return out
