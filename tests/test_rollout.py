"""Fused rollout integration tests: tiny model, batched envs, one jit scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.agents.policy import PolicyConfig
from beso_tpu.data.trajectories import synthetic_kitchen_data, synthetic_push_data
from beso_tpu.envs.block_push.goals import block_push_goal_frames
from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals
from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_minmax_scaler, fit_scaler
from beso_tpu.rollout import (
    rollout_block_push,
    rollout_kitchen,
    success_rate_histogram,
)


def make_denoiser(obs_dim, act_dim, window, goal_len, key):
    model = DiffusionGPT(state_dim=obs_dim, action_dim=act_dim, embed_dim=32,
                         n_layers=1, n_heads=2, goal_seq_len=goal_len,
                         obs_seq_len=window)
    den = GCDenoiser(model, sigma_data=0.5)
    s = jnp.zeros((2, window, obs_dim))
    a = jnp.zeros((2, window, act_dim))
    g = jnp.zeros((2, goal_len, obs_dim))
    params = den.init(key, s, a, g, jnp.ones((2,)) * 0.5)
    return den, params


class TestKitchenRollout:
    def test_end_to_end(self):
        B, W, G = 8, 4, 2
        data = synthetic_kitchen_data(n_traj=16, t_max=50)
        scaler = fit_scaler(data.all_observations(), data.all_actions())
        den, params = make_denoiser(30, 9, W, G, jax.random.PRNGKey(0))
        goals, expected = multigoal_kitchen_goals(data, G, B, seed=42)
        cfg = PolicyConfig(window_size=W, obs_dim=30, action_dim=9,
                           num_sampling_steps=3, sigma_min=0.005)

        def denoise(s, a, g, sig):
            return den.apply(params, s, a, g, sig)

        metrics = jax.jit(
            lambda k: rollout_kitchen(denoise, scaler, cfg,
                                      jnp.asarray(goals),
                                      jnp.asarray(expected), k, n_steps=10)
        )(jax.random.PRNGKey(1))
        assert metrics.rewards.shape == (B,)
        assert metrics.results.shape == (B,)
        assert metrics.completed.shape == (B, 7)
        assert int(metrics.env_steps) == B * 10
        assert np.isfinite(np.asarray(metrics.rewards)).all()

    def test_success_histogram(self):
        hist = success_rate_histogram(np.array([0, 1, 2, 5, 3]))
        assert hist["success_rate_1"] == pytest.approx(4 / 5)
        assert hist["success_rate_5"] == pytest.approx(1 / 5)


class TestBlockPushRollout:
    def test_end_to_end(self):
        B, W, G = 8, 5, 1
        data = synthetic_push_data(n_traj=16, t_max=40)
        scaler = fit_minmax_scaler(data.all_observations()[:, :10],
                                   data.all_actions())
        den, params = make_denoiser(10, 2, W, G, jax.random.PRNGKey(0))
        frames, expected = block_push_goal_frames(data, B, seed=6)
        cfg = PolicyConfig(window_size=W, obs_dim=10, action_dim=2,
                           num_sampling_steps=3, sigma_min=0.05)

        def denoise(s, a, g, sig):
            return den.apply(params, s, a, g, sig)

        metrics = jax.jit(
            lambda k: rollout_block_push(denoise, scaler, cfg,
                                         jnp.asarray(frames),
                                         jnp.asarray(expected), k,
                                         n_steps=10, goal_seq_len=G)
        )(jax.random.PRNGKey(1))
        assert metrics.rewards.shape == (B,)
        assert metrics.results.shape == (B,)
        assert (np.asarray(metrics.results) <= 1.0).all()

    def test_cfg_variant(self):
        B, W, G = 4, 5, 1
        data = synthetic_push_data(n_traj=16, t_max=40)
        scaler = fit_minmax_scaler(data.all_observations()[:, :10],
                                   data.all_actions())
        den, params = make_denoiser(10, 2, W, G, jax.random.PRNGKey(0))
        frames, expected = block_push_goal_frames(data, B, seed=6)
        cfg = PolicyConfig(window_size=W, obs_dim=10, action_dim=2,
                           num_sampling_steps=3, sigma_min=0.05,
                           cond_lambda=2.0)

        def denoise(s, a, g, sig):
            return den.apply(params, s, a, g, sig)

        metrics = rollout_block_push(denoise, scaler, cfg,
                                     jnp.asarray(frames),
                                     jnp.asarray(expected),
                                     jax.random.PRNGKey(1), n_steps=5,
                                     goal_seq_len=G)
        assert np.isfinite(np.asarray(metrics.rewards)).all()
