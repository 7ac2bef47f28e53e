"""Top-down 2D renderer + video writer for the block-push env.

Functional parity target: the reference's RGB rendering + rollout videos
(`block_pushing.py:604-679` GL camera render; `kitchen_workspace_manager.py:
309-314` imageio 30fps videos). The Bullet GL camera is replaced by a
matplotlib top-down schematic of the planar scene — blocks as oriented
squares, target zones as circles, effector as a dot.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from beso_tpu.envs.block_push.env import (BLOCK_HALF, EFFECTOR_RADIUS,
                                          GOAL_DIST_TOLERANCE,
                                          WORKSPACE_BOUNDS, BlockPushState)


def render_frame(state: BlockPushState, env_index: Optional[int] = None,
                 size: int = 256) -> np.ndarray:
    """Render one env's state to an RGB uint8 array [size, size, 3]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, Rectangle
    from matplotlib.transforms import Affine2D

    s = state if env_index is None else jax_tree_index(state, env_index)
    fig, ax = plt.subplots(figsize=(size / 100, size / 100), dpi=100)
    lo, hi = np.asarray(WORKSPACE_BOUNDS)
    ax.set_xlim(lo[0] - 0.05, hi[0] + 0.05)
    ax.set_ylim(lo[1] - 0.05, hi[1] + 0.05)
    ax.set_aspect("equal")
    ax.axis("off")

    colors = ["tab:red", "tab:green"]
    for t in range(2):
        ax.add_patch(Circle(np.asarray(s.target_pos)[t], GOAL_DIST_TOLERANCE,
                            fill=False, color=colors[t], lw=2))
    for b in range(2):
        pos = np.asarray(s.block_pos)[b]
        yaw = float(np.asarray(s.block_yaw)[b])
        rect = Rectangle(pos - BLOCK_HALF, 2 * BLOCK_HALF, 2 * BLOCK_HALF,
                         color=colors[b], alpha=0.8)
        rect.set_transform(Affine2D().rotate_around(*pos, yaw) + ax.transData)
        ax.add_patch(rect)
    ax.add_patch(Circle(np.asarray(s.effector), EFFECTOR_RADIUS, color="k"))

    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def jax_tree_index(tree, i: int):
    import jax

    return jax.tree.map(lambda x: x[i], tree)


def save_video(frames: List[np.ndarray], path, fps: int = 30) -> None:
    """Write frames to an mp4/gif (kitchen_workspace_manager.py:309-314)."""
    import imageio

    imageio.mimsave(path, frames, fps=fps)


def render_single_frame(state, env_index: Optional[int] = None,
                        size: int = 256, task: str = "PUSH") -> np.ndarray:
    """Render a SingleBlockPushState (PUSH/REACH/INSERT variants) to RGB.

    Backs the *Rgb env ids of the registry (reference GL camera render,
    block_pushing.py:604-679). INSERT draws the slot opening as a wedge."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, Rectangle, Wedge
    from matplotlib.transforms import Affine2D

    s = state if env_index is None else jax_tree_index(state, env_index)
    fig, ax = plt.subplots(figsize=(size / 100, size / 100), dpi=100)
    lo, hi = np.asarray(WORKSPACE_BOUNDS)
    ax.set_xlim(lo[0] - 0.05, hi[0] + 0.05)
    ax.set_ylim(lo[1] - 0.05, hi[1] + 0.05)
    ax.set_aspect("equal")
    ax.axis("off")

    tpos = np.asarray(s.target_pos)
    if task == "INSERT":
        from beso_tpu.envs.block_push.single import (SLOT_HALF_ANGLE,
                                                     SLOT_RADIUS)
        yaw = float(np.asarray(s.target_yaw))
        deg = np.degrees
        ax.add_patch(Wedge(tpos, SLOT_RADIUS,
                           deg(yaw + SLOT_HALF_ANGLE),
                           deg(yaw - SLOT_HALF_ANGLE) + 360,
                           color="tab:gray", alpha=0.5))
    ax.add_patch(Circle(tpos, GOAL_DIST_TOLERANCE, fill=False,
                        color="tab:green", lw=2))
    if task == "REACH":
        ax.add_patch(Circle(np.asarray(s.reach_target), GOAL_DIST_TOLERANCE,
                            fill=False, color="tab:blue", lw=2))
    pos = np.asarray(s.block_pos)
    yaw_b = float(np.asarray(s.block_yaw))
    rect = Rectangle(pos - BLOCK_HALF, 2 * BLOCK_HALF, 2 * BLOCK_HALF,
                     color="tab:red", alpha=0.8)
    rect.set_transform(Affine2D().rotate_around(*pos, yaw_b) + ax.transData)
    ax.add_patch(rect)
    ax.add_patch(Circle(np.asarray(s.effector), EFFECTOR_RADIUS, color="k"))

    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf
