"""Kitchen scripted-oracle tests: task completion + demo generation."""

import jax
import numpy as np

from beso_tpu.envs.kitchen.oracle import (
    generate_kitchen_demonstrations,
    rollout_kitchen_oracle,
    sample_task_sequence,
)


class TestKitchenOracle:
    def test_completes_most_tasks(self):
        """The differential-IK demonstrator must finish most of its 4-task
        sequences — the solvability proof for the surrogate kitchen physics."""
        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        _, _, completed, _ = jax.vmap(
            lambda k: rollout_kitchen_oracle(k, 280, 4))(keys)
        mean_done = np.asarray(completed).sum(1).mean()
        assert mean_done >= 2.0, f"oracle completes only {mean_done}/4 tasks"

    def test_task_sequences_are_diverse(self):
        keys = jax.random.split(jax.random.PRNGKey(1), 16)
        seqs = np.asarray(jax.vmap(sample_task_sequence)(keys))
        assert len({tuple(s) for s in seqs}) > 4  # multimodal demos

    def test_demo_format(self):
        data = generate_kitchen_demonstrations(jax.random.PRNGKey(2),
                                               n_episodes=4, n_steps=120)
        assert data.observations.shape == (4, 120, 30)
        assert data.actions.shape == (4, 120, 9)
        assert data.onehot_goals.shape == (4, 120, 7)
        assert np.abs(data.actions).max() <= 1.0 + 1e-6
        # every completed task leaves exactly one onehot label
        assert data.onehot_goals.sum() >= 4  # >= 1 completions per episode
