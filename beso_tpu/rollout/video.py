"""Rollout video recording for the block-push env.

Functional parity target: the reference's `store_video` paths
(kitchen_workspace_manager.py:243-314, block_push_workspace.py:107-188 —
env.render('rgb_array') frames -> imageio 30 fps). The fused device rollout
doesn't materialize frames, so recording runs a small host-side episode loop
with the 2D schematic renderer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.agents.policy import PolicyConfig, policy_predict, policy_reset
from beso_tpu.envs.block_push.env import (block_push_obs, block_push_reset,
                                          block_push_step)
from beso_tpu.envs.block_push.goals import build_block_push_goals
from beso_tpu.envs.block_push.render import render_frame, save_video


def record_block_push_video(denoise_fn, scaler, cfg: PolicyConfig,
                            goal_frame: np.ndarray, key, video_path,
                            n_steps: int = 150, fps: int = 30,
                            reduce_obs_dim: bool = True) -> list:
    """Roll one episode and write an mp4/gif. Returns the frame list."""
    k_env, k_roll = jax.random.split(key)
    env = block_push_reset(k_env)
    obs16 = block_push_obs(env)[None]
    goal = build_block_push_goals(obs16, jnp.asarray(goal_frame)[None], 1,
                                  zero_goals=True,
                                  reduce_obs_dim=reduce_obs_dim)
    pstate = policy_reset(1, cfg)

    @jax.jit
    def step(env, pstate, obs16, k):
        obs = obs16[:, :10] if reduce_obs_dim else obs16
        action, pstate = policy_predict(denoise_fn, scaler, pstate, obs,
                                        goal, k, cfg)
        env, o, r, d = block_push_step(env, action[0])
        return env, pstate, o[None], d

    frames = [render_frame(env)]
    for t in range(n_steps):
        env, pstate, obs16, done = step(env, pstate, obs16,
                                        jax.random.fold_in(k_roll, t))
        frames.append(render_frame(env))
        if bool(done):
            break
    if video_path is not None:
        save_video(frames, video_path, fps=fps)
    return frames
