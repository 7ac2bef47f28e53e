"""Prefix-KV cached inference engine parity + gating tests.

models/cached.py re-partitions the DiffusionGPT forward so the
[sigma, goal] prefix tokens' per-layer K/V are computed once per episode.
These tests pin: exact numerical parity with the flax full forward, exact
rollout-metric equivalence when wired through `denoise_factory`, CFG batch
stacking, and the sampler gating.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.agents.policy import PolicyConfig
from beso_tpu.core.schedules import get_noise_schedule
from beso_tpu.models import DiffusionGPT, GCDenoiser
from beso_tpu.models.cached import (CACHED_SAFE_SAMPLERS,
                                    make_cached_denoise_fn,
                                    make_rollout_denoise_factory)

KITCHEN = dict(state_dim=30, action_dim=9, embed_dim=72, n_layers=2,
               n_heads=6, goal_seq_len=2, obs_seq_len=4)


def _setup(B=8, key=0, **kw):
    cfgkw = dict(KITCHEN)
    cfgkw.update(kw)
    model = DiffusionGPT(**cfgkw)
    den = GCDenoiser(model, sigma_data=0.5)
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    s = jax.random.normal(ks[0], (B, cfgkw["obs_seq_len"], cfgkw["state_dim"]))
    a = jax.random.normal(ks[1], (B, cfgkw["obs_seq_len"], cfgkw["action_dim"]))
    g = jax.random.normal(ks[2], (B, cfgkw["goal_seq_len"], cfgkw["state_dim"]))
    params = den.init(ks[4], s, a, g, jnp.full((B,), 0.5))
    return model, den, params, s, a, g


class TestCachedParity:
    def test_matches_flax_on_every_grid_sigma(self):
        _, den, params, s, a, g = _setup()
        sigmas = get_noise_schedule(3, 0.005, 1.0, 5.0, "exponential")[:-1]
        dn = make_cached_denoise_fn(den, params, g, sigmas)
        for sg in np.asarray(sigmas):
            sig = jnp.full((8,), float(sg))
            ref = den.apply(params, s, a, g, sig)
            out = dn(s, a, g, sig)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5, rtol=1e-4)

    def test_goal_unconditioned_model(self):
        _, den, params, s, a, g = _setup(key=1, goal_conditioned=False)
        sigmas = jnp.asarray([1.0, 0.1])
        dn = make_cached_denoise_fn(den, params, g, sigmas)
        sig = jnp.full((8,), 0.1)
        np.testing.assert_allclose(
            np.asarray(dn(s, a, g, sig)),
            np.asarray(den.apply(params, s, a, g, sig)),
            atol=1e-5, rtol=1e-4)

    def test_sigma_index_lookup_is_nearest(self):
        """A slightly perturbed grid sigma still hits the right cache row."""
        _, den, params, s, a, g = _setup(key=2)
        sigmas = jnp.asarray([1.0, 0.18, 0.032])
        dn = make_cached_denoise_fn(den, params, g, sigmas)
        out_exact = dn(s, a, g, jnp.full((8,), 0.18))
        out_near = dn(s, a, g, jnp.full((8,), 0.18 * (1 + 1e-6)))
        np.testing.assert_allclose(np.asarray(out_near),
                                   np.asarray(out_exact), atol=1e-4)


class TestRolloutFactory:
    def _rollout_pair(self, cond_lambda=1.0):
        from beso_tpu.data import synthetic_kitchen_data
        from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals
        from beso_tpu.models import fit_scaler
        from beso_tpu.rollout import rollout_kitchen

        model, den, params, *_ = _setup(B=4)
        data = synthetic_kitchen_data(n_traj=4, t_max=30)
        scaler = fit_scaler(data.all_observations(), data.all_actions())
        goals, expected = multigoal_kitchen_goals(data, 2, 4, seed=0)
        goals, expected = jnp.asarray(goals), jnp.asarray(expected)
        cfg = PolicyConfig(window_size=4, obs_dim=30, action_dim=9,
                           num_sampling_steps=2, sigma_min=0.005,
                           cond_lambda=cond_lambda)

        def dn(s, a, g, sig):
            return den.apply(params, s, a, g, sig)

        key = jax.random.PRNGKey(3)
        ref = rollout_kitchen(dn, scaler, cfg, goals, expected, key,
                              n_steps=4)
        factory = make_rollout_denoise_factory(den, params, scaler, cfg)
        out = rollout_kitchen(dn, scaler, cfg, goals, expected, key,
                              n_steps=4, denoise_factory=factory)
        return ref, out

    def test_rollout_metrics_identical(self):
        ref, out = self._rollout_pair()
        np.testing.assert_allclose(np.asarray(out.rewards),
                                   np.asarray(ref.rewards), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.completed),
                                      np.asarray(ref.completed))

    def test_rollout_with_cfg_identical(self):
        """cond_lambda != 1: the cache must line up with cfg_denoise_fn's
        [cond, uncond] batch stacking."""
        ref, out = self._rollout_pair(cond_lambda=1.5)
        np.testing.assert_allclose(np.asarray(out.rewards),
                                   np.asarray(ref.rewards), atol=1e-4)

    def test_gating(self):
        model, den, params, *_ = _setup()
        from beso_tpu.models import fit_scaler
        from beso_tpu.data import synthetic_kitchen_data

        data = synthetic_kitchen_data(n_traj=2, t_max=20)
        scaler = fit_scaler(data.all_observations(), data.all_actions())
        base = dict(window_size=4, obs_dim=30, action_dim=9)
        with pytest.raises(ValueError, match="grid-sigma"):
            make_rollout_denoise_factory(
                den, params, scaler,
                PolicyConfig(sampler_type="euler_ancestral", **base))
        with pytest.raises(ValueError, match="s_churn"):
            make_rollout_denoise_factory(
                den, params, scaler,
                PolicyConfig(sampler_type="euler", s_churn=0.5, **base))
        with pytest.raises(ValueError, match="single action"):
            make_rollout_denoise_factory(
                den, params, scaler,
                PolicyConfig(n_action_samples=4, **base))
        assert "ddim" in CACHED_SAFE_SAMPLERS


class TestAgentEngineSelection:
    def _agent(self, **cfg_kw):
        from beso_tpu.agents.beso_agent import BesoAgent, BesoAgentConfig
        from beso_tpu.data import synthetic_kitchen_data
        from beso_tpu.models import fit_scaler

        data = synthetic_kitchen_data(n_traj=2, t_max=20)
        scaler = fit_scaler(data.all_observations(), data.all_actions())
        cfg = BesoAgentConfig(hidden_dim=36, n_layers=1, n_heads=3,
                              max_train_steps=1, **cfg_kw)
        agent = BesoAgent(cfg, scaler)
        batch = {
            "observation": jnp.zeros((2, cfg.window_size, cfg.obs_dim)),
            "action": jnp.zeros((2, cfg.window_size, cfg.action_dim)),
            "goal_observation": jnp.zeros((2, cfg.goal_seq_len, cfg.obs_dim)),
        }
        agent.init(jax.random.PRNGKey(0), batch)
        return agent

    def test_auto_uses_cached_for_ddim(self):
        agent = self._agent()
        assert agent.make_denoise_factory(agent.policy_config()) is not None

    def test_auto_falls_back_for_ancestral(self):
        agent = self._agent(sampler_type="euler_ancestral")
        assert agent.make_denoise_factory(agent.policy_config()) is None

    def test_full_disables(self):
        agent = self._agent(inference_engine="full")
        assert agent.make_denoise_factory(agent.policy_config()) is None

    def test_cached_raises_when_ineligible(self):
        agent = self._agent(sampler_type="euler_ancestral",
                            inference_engine="cached")
        with pytest.raises(ValueError):
            agent.make_denoise_factory(agent.policy_config())
