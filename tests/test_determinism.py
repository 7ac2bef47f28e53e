"""Determinism guarantees: identical keys -> identical results everywhere.

The reference had unseeded nondeterminism holes (np.random in dataloader
workers, random target flips — SURVEY.md 5.2); here every random draw flows
from an explicit key, so whole pipelines must be bit-reproducible."""

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.agents.policy import PolicyConfig
from beso_tpu.data import SlicedDataset, synthetic_push_data
from beso_tpu.envs.block_push.goals import block_push_goal_frames
from beso_tpu.envs.block_push.oracle import rollout_oracle
from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_minmax_scaler
from beso_tpu.rollout import rollout_block_push


def test_rollout_bitwise_reproducible():
    data = synthetic_push_data(8, 40)
    scaler = fit_minmax_scaler(data.all_observations()[:, :10],
                               data.all_actions())
    model = DiffusionGPT(state_dim=10, action_dim=2, embed_dim=24, n_layers=1,
                         n_heads=2, goal_seq_len=1, obs_seq_len=5)
    den = GCDenoiser(model, 0.5)
    params = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 10)),
                      jnp.zeros((1, 5, 2)), jnp.zeros((1, 1, 10)),
                      jnp.full((1,), 0.5))
    frames, expected = block_push_goal_frames(data, 4, seed=6)
    cfg = PolicyConfig(window_size=5, obs_dim=10, action_dim=2,
                       sigma_min=0.05, num_sampling_steps=2,
                       sampler_type="euler_ancestral")  # stochastic sampler

    def run(k):
        return rollout_block_push(
            lambda s, a, g, sig: den.apply(params, s, a, g, sig), scaler,
            cfg, jnp.asarray(frames), jnp.asarray(expected), k, n_steps=5)

    m1 = jax.jit(run)(jax.random.PRNGKey(7))
    m2 = jax.jit(run)(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(m1.rewards), np.asarray(m2.rewards))
    np.testing.assert_array_equal(np.asarray(m1.completed), np.asarray(m2.completed))


def test_oracle_and_batch_sampling_reproducible():
    o1 = rollout_oracle(jax.random.PRNGKey(3), 40, action_noise=0.004)
    o2 = rollout_oracle(jax.random.PRNGKey(3), 40, action_noise=0.004)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))

    data = synthetic_push_data(8, 40)
    ds = SlicedDataset(data, window=5, future_conditional=True, future_seq_len=1)
    b1 = ds.sample_batch(jax.random.PRNGKey(5), 16)
    b2 = ds.sample_batch(jax.random.PRNGKey(5), 16)
    np.testing.assert_array_equal(np.asarray(b1["goal_observation"]),
                                  np.asarray(b2["goal_observation"]))
