"""Kitchen evaluation goal functions (dataset-derived).

Functional parity target: `beso/envs/franka_kitchen/goals.py:31-133` and the
expected-task oracle of `kitchen_workspace_manager.py:527-578`:

* multigoal/future: the goal for episode `goal_idx` is the last
  `goal_seq_len` observations of TRAIN trajectory `train_idx[goal_idx]`
  (goals.py:87-93); indices wrap (>536 in the workspace loop,
  kitchen_workspace_manager.py:252-253).
* expected tasks: the per-trajectory onehot label maxima (which of the 7
  tasks the demonstrator completed) — success counts
  |completed ∩ expected|.
* sequential: the k-th sub-goal window, its timeframe, and its task name
  derived from the onehot ordering (goals.py:95-121).
* onehot: the per-frame 7-dim onehot label (goals.py:123-130).

All functions are host-side precomputation returning dense arrays consumed
by the fused rollout (the reference re-loads the dataset inside closures).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from beso_tpu.data.trajectories import TrajectoryData, get_split_idx

ALL_TASKS = np.array(
    ["bottom burner", "top burner", "light switch", "slide cabinet",
     "hinge cabinet", "microwave", "kettle"], dtype="<U13")


def _wrap_goal_idx(goal_idx: int) -> int:
    """Workspace-loop wrap (kitchen_workspace_manager.py:252-253)."""
    return goal_idx - 536 if goal_idx > 536 else goal_idx


def multigoal_kitchen_goals(data: TrajectoryData, goal_seq_len: int,
                            eval_n_times: int, seed: int,
                            train_fraction: float = 0.95
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Goals + expected-task masks for the multigoal protocol.

    Returns (goals [N, G, 30], expected [N, 7] bool).
    """
    assert data.onehot_goals is not None
    train_idx, _ = get_split_idx(data.num_trajectories, seed, train_fraction)
    goals = np.zeros((eval_n_times, goal_seq_len, data.obs_dim), np.float32)
    expected = np.zeros((eval_n_times, 7), bool)
    for i in range(eval_n_times):
        gi = _wrap_goal_idx(i)
        traj = train_idx[gi % len(train_idx)]
        T = int(data.lengths[traj])
        goals[i] = data.observations[traj, T - goal_seq_len:T]
        expected[i] = data.onehot_goals[traj, :T].max(0) > 0.5
    return goals, expected


def sequential_kitchen_goals(data: TrajectoryData, goal_seq_len: int,
                             eval_n_times: int, seed: int,
                             train_fraction: float = 0.95):
    """Per-episode sequence of 4 sub-goals (goals.py:95-121).

    Returns (goals [N, 4, G, 30], timeframes [N, 4] int, task_ids [N, 4] int,
    expected [N, 7] bool). Sub-goal k (1-indexed in the reference) maps to
    row k-1. task_ids index ALL_TASKS.
    """
    assert data.onehot_goals is not None
    train_idx, _ = get_split_idx(data.num_trajectories, seed, train_fraction)
    N, G = eval_n_times, goal_seq_len
    goals = np.zeros((N, 4, G, data.obs_dim), np.float32)
    timeframes = np.zeros((N, 4), np.int32)
    task_ids = np.zeros((N, 4), np.int32)
    expected = np.zeros((N, 7), bool)
    for i in range(N):
        gi = _wrap_goal_idx(i)
        traj = train_idx[gi % len(train_idx)]
        T = int(data.lengths[traj])
        onehot = data.onehot_goals[traj, :T]
        expected_mask = onehot.max(0) > 0.5
        expected[i] = expected_mask
        order = np.sort(onehot.argmax(0)[expected_mask])  # completion frames
        for goal_number in range(1, 5):
            if goal_number == 4:
                # final sub-goal: trajectory tail, timeframe pinned to 280,
                # task read near the last labeled frame (goals.py:113-116)
                goals[i, 3] = data.observations[traj, T - G:T]
                timeframes[i, 3] = 280
                gidx = order[-1] if len(order) else T - 1
                frame = min(gidx + 5, T - 1)
                lab = onehot[frame] > 0.5
                task_ids[i, 3] = int(np.argmax(lab)) if lab.any() else 0
            else:
                gidx = int(order[goal_number]) if len(order) > goal_number else int(order[-1])
                end = min(gidx + G, T)
                win = data.observations[traj, gidx:end]
                goals[i, goal_number - 1, :len(win)] = win
                timeframes[i, goal_number - 1] = gidx
                frame = min(gidx - 1, T - 1)
                lab = onehot[frame] > 0.5
                task_ids[i, goal_number - 1] = int(np.argmax(lab)) if lab.any() else 0
    return goals, timeframes, task_ids, expected


def onehot_kitchen_goals(data: TrajectoryData, eval_n_times: int, seed: int,
                         train_fraction: float = 0.95):
    """Per-frame onehot goal table [N, Tmax, 7] + expected masks
    (goals.py:123-130): the goal at env step n is row min(n, T-1)."""
    assert data.onehot_goals is not None
    train_idx, _ = get_split_idx(data.num_trajectories, seed, train_fraction)
    Tmax = data.observations.shape[1]
    table = np.zeros((eval_n_times, Tmax, 7), np.float32)
    expected = np.zeros((eval_n_times, 7), bool)
    for i in range(eval_n_times):
        traj = train_idx[_wrap_goal_idx(i) % len(train_idx)]
        T = int(data.lengths[traj])
        table[i, :T] = data.onehot_goals[traj, :T]
        table[i, T:] = data.onehot_goals[traj, T - 1]
        expected[i] = data.onehot_goals[traj, :T].max(0) > 0.5
    return table, expected
