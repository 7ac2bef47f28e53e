"""Scripted-oracle tests: success in the JAX sim + demo-data generation."""

import jax
import pytest
import numpy as np

from beso_tpu.envs.block_push.oracle import (
    generate_demonstrations,
    oracle_policy,
    oracle_reset,
    rollout_oracle,
    sample_oracle_params,
)


class TestOracle:
    @pytest.mark.slow
    def test_high_success_rate(self):
        """The scripted pusher must solve both blocks in most episodes —
        this is the end-to-end validation that the quasi-static physics is
        pushable the way Bullet's scene is."""
        keys = jax.random.split(jax.random.PRNGKey(0), 16)
        _, _, completed, _ = jax.vmap(lambda k: rollout_oracle(k, 250))(keys)
        success = (np.asarray(completed).sum(1) >= 2).mean()
        assert success >= 0.9, f"oracle success {success}"

    def test_multimodality(self):
        """Different param draws must yield different task orders."""
        keys = jax.random.split(jax.random.PRNGKey(1), 32)
        params = jax.vmap(sample_oracle_params)(keys)
        orders = np.asarray(params.block_order)[:, 0]
        assigns = np.asarray(params.target_assign)[:, 0]
        assert 0 < orders.mean() < 1
        assert 0 < assigns.mean() < 1

    @pytest.mark.slow
    def test_demo_dataset_format(self):
        data = generate_demonstrations(jax.random.PRNGKey(2), n_episodes=8,
                                       n_steps=200)
        assert data.observations.shape == (8, 200, 16)
        assert data.actions.shape == (8, 200, 2)
        assert data.onehot_goals.shape == (8, 200, 4)
        # most demos complete 2 tasks -> 2 onehot labels per episode
        labels_per_ep = data.onehot_goals.sum((1, 2))
        assert labels_per_ep.mean() >= 1.5
        # actions respect the env's action cap
        assert np.abs(data.actions).max() <= 0.1 + 1e-6
