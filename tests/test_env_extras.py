"""Tests for single-block env variants, state serialization, and rendering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.envs.block_push.env import block_push_reset, block_push_step
from beso_tpu.envs.block_push.single import (
    denormalize_action,
    normalized_obs,
    single_block_push_obs,
    single_block_push_reset,
    single_block_push_step,
)
from beso_tpu.envs.state_io import load_env_state, save_env_state


class TestSingleBlockPush:
    def test_reset_and_obs(self):
        s = single_block_push_reset(jax.random.PRNGKey(0))
        obs = single_block_push_obs(s)
        assert obs.shape == (10,)
        assert 0.3 <= float(s.block_pos[0]) <= 0.5
        assert 0.05 <= float(s.target_pos[1]) <= 0.35

    def test_reward_is_best_fraction(self):
        s = single_block_push_reset(jax.random.PRNGKey(1))
        s1, _, r1, d1 = single_block_push_step(s, jnp.zeros(2))
        assert 0.0 <= float(r1) < 1.0 and not bool(d1)
        # teleport the block to the target -> reward 1, done
        s2 = s1._replace(block_pos=s1.target_pos)
        s3, _, r2, d2 = single_block_push_step(s2, jnp.zeros(2))
        assert float(r2) == 1.0 and bool(d2)

    def test_reach_variant(self):
        s = single_block_push_reset(jax.random.PRNGKey(2), task="REACH")
        # reach target sits 5cm before the block on the block->target line
        d = float(jnp.linalg.norm(s.reach_target - s.block_pos))
        assert abs(d - 0.05) < 1e-5
        s2, _, r, done = single_block_push_step(s, jnp.zeros(2), task="REACH")
        assert np.isfinite(float(r))

    def test_normalized_wrapper(self):
        s = single_block_push_reset(jax.random.PRNGKey(3))
        obs_n = np.asarray(normalized_obs(s))
        assert obs_n.shape == (10,)
        assert (np.abs(obs_n) <= 1.5).all()
        # denormalize maps [-1,1]^2 onto [ACTION_MIN, ACTION_MAX]
        from beso_tpu.envs.block_push.single import ACTION_MAX, ACTION_MIN
        np.testing.assert_allclose(
            np.asarray(denormalize_action(jnp.ones(2))),
            np.asarray(ACTION_MAX), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(denormalize_action(-jnp.ones(2))),
            np.asarray(ACTION_MIN), rtol=1e-6)

    def test_vmappable(self):
        keys = jax.random.split(jax.random.PRNGKey(4), 8)
        states = jax.vmap(single_block_push_reset)(keys)
        s2, obs, r, d = jax.vmap(single_block_push_step)(
            states, jnp.zeros((8, 2)))
        assert obs.shape == (8, 10)


class TestStateIO:
    def test_roundtrip(self, tmp_path):
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        states = jax.vmap(block_push_reset)(keys)
        states, _, _, _ = jax.vmap(block_push_step)(states, jnp.ones((4, 2)) * 0.01)
        path = tmp_path / "state.npz"
        save_env_state(states, path)
        restored = load_env_state(states, path)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                     states, restored)


class TestRender:
    def test_render_frame(self):
        from beso_tpu.envs.block_push.render import render_frame

        s = block_push_reset(jax.random.PRNGKey(0))
        frame = render_frame(s)
        assert frame.ndim == 3 and frame.shape[-1] == 3
        assert frame.dtype == np.uint8
        # scene is not blank
        assert frame.std() > 1.0
