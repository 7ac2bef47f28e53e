"""Kitchen scripted-oracle tests: task completion + demo generation."""

import jax
import numpy as np

from beso_tpu.envs.kitchen.oracle import (
    generate_kitchen_demonstrations,
    rollout_kitchen_oracle,
    sample_task_sequence,
)


class TestKitchenOracle:
    def test_completes_assigned_tasks(self):
        """The differential-IK demonstrator must finish (nearly) all of its
        assigned 4-task sequences — the solvability proof for the surrogate
        kitchen physics (VERDICT round-1 target: >= 3.8/4)."""
        keys = jax.random.split(jax.random.PRNGKey(0), 16)
        _, _, completed, _, seqs = jax.vmap(
            lambda k: rollout_kitchen_oracle(k, 280, 4))(keys)
        completed, seqs = np.asarray(completed), np.asarray(seqs)
        assigned = np.array([
            sum(completed[i, t] for t in seqs[i] if t >= 0)
            for i in range(len(keys))])
        assert assigned.mean() >= 3.8, \
            f"oracle completes only {assigned.mean():.2f}/4 assigned tasks"

    def test_completes_under_perturbed_physics(self):
        """Oracle success must survive +-20% gain/radius perturbation — the
        surrogate is not knife-edge calibrated."""
        from beso_tpu.envs.kitchen.env import perturb_kitchen_params

        keys = jax.random.split(jax.random.PRNGKey(3), 8)
        for gs, rs in [(0.8, 1.0), (1.2, 1.0), (1.0, 0.8), (1.0, 1.2)]:
            params = perturb_kitchen_params(gain_scale=gs, radius_scale=rs)
            _, _, completed, _, seqs = jax.vmap(
                lambda k: rollout_kitchen_oracle(k, 280, 4, 0.0, params))(keys)
            completed, seqs = np.asarray(completed), np.asarray(seqs)
            assigned = np.array([
                sum(completed[i, t] for t in seqs[i] if t >= 0)
                for i in range(len(keys))])
            assert assigned.mean() >= 3.5, (gs, rs, assigned.mean())

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
