"""Schematic kitchen renderer: task-progress dashboard frames.

The reference renders MuJoCo RGB rollout videos
(kitchen_workspace_manager.py:263-266, 309-314). Without the MuJoCo scene,
this renders an honest schematic per frame: one horizontal progress bar per
task element (|obs - goal| vs the 0.3 completion threshold) plus the
fingertip position — enough to see WHAT the policy is doing and when tasks
complete.
"""

from __future__ import annotations

import numpy as np

from beso_tpu.envs.kitchen.env import (ALL_TASKS, BONUS_THRESH, GOAL_VEC,
                                       TASK_MASKS, KitchenState)


def render_frame(state: KitchenState, size: int = 320) -> np.ndarray:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    qpos = np.asarray(state.qpos)
    dists = np.linalg.norm((qpos - np.asarray(GOAL_VEC)) * np.asarray(TASK_MASKS),
                           axis=-1)
    # progress: 1 at goal, 0 at (or beyond) 3x the threshold
    progress = np.clip(1.0 - dists / (3 * BONUS_THRESH), 0, 1)
    done = dists < BONUS_THRESH

    fig, ax = plt.subplots(figsize=(size / 100, size / 100), dpi=100)
    y = np.arange(7)
    colors = ["tab:green" if d else "tab:blue" for d in done]
    ax.barh(y, progress, color=colors)
    ax.axvline(1.0 - 1 / 3, color="k", ls="--", lw=1)  # completion line
    ax.set_yticks(y, [t.replace(" ", "\n") for t in ALL_TASKS], fontsize=6)
    ax.set_xlim(0, 1.05)
    ax.set_xlabel("task progress", fontsize=7)
    ee = np.asarray(state.ee_pos)
    ax.set_title(f"ee=({ee[0]:+.2f},{ee[1]:+.2f},{ee[2]:+.2f})  "
                 f"done={int(done.sum())}/7", fontsize=8)
    fig.tight_layout()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf
