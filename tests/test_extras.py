"""Tests for embeddings, encoders, env registry, tf-metrics equivalents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.agents.encoders import NoEncoder
from beso_tpu.envs.registry import make, registered_ids
from beso_tpu.models.embeddings import make_time_embedding
from beso_tpu.rollout.rollout import (
    average_final_goal_distance,
    average_success_metric,
)


class TestEmbeddings:
    @pytest.mark.parametrize("kind", ["GaussianFourier", "Sinusoidal",
                                      "FourierFeatures", "Linear", "MLP"])
    def test_all_types(self, kind):
        mod = make_time_embedding(kind, 32)
        t = jnp.linspace(0.1, 1.0, 4)
        variables = mod.init(jax.random.PRNGKey(0), t)
        out = mod.apply(variables, t)
        assert out.shape == (4, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_time_embedding("nope", 8)

    def test_gpt_with_sinusoidal_sigma(self):
        from beso_tpu.models import DiffusionGPT

        model = DiffusionGPT(state_dim=4, action_dim=2, embed_dim=16,
                             n_layers=1, n_heads=2, goal_seq_len=1,
                             obs_seq_len=2, sigma_embedding="Sinusoidal")
        s, a = jnp.zeros((2, 2, 4)), jnp.zeros((2, 2, 2))
        g, sig = jnp.zeros((2, 1, 4)), jnp.full((2,), 0.5)
        params = model.init(jax.random.PRNGKey(0), s, a, g, sig)
        assert model.apply(params, s, a, g, sig).shape == (2, 2, 2)


class TestEncoders:
    def test_no_encoder(self):
        enc = NoEncoder()
        batch = {"observation": jnp.ones((2, 3)),
                 "goal_observation": jnp.zeros((2, 3))}
        s, g = enc(batch)
        np.testing.assert_allclose(s, 1.0)
        np.testing.assert_allclose(g, 0.0)


class TestRegistry:
    def test_all_ids_make(self):
        assert "kitchen-all-v0" in registered_ids()
        assert "BlockPushMultimodal-v0" in registered_ids()
        assert len(registered_ids()) >= 16
        for env_id in ["kitchen-all-v0", "BlockPushMultimodal-v0",
                       "BlockPush-v0", "BlockReach-v0"]:
            spec = make(env_id)
            state = spec.reset_fn(jax.random.PRNGKey(0))
            obs = spec.obs_fn(state)
            a_dim = 9 if "kitchen" in env_id else 2
            s2, obs2, r, d = spec.step_fn(state, jnp.zeros(a_dim))
            assert obs.shape == obs2.shape

    def test_unknown_id(self):
        with pytest.raises(ValueError):
            make("nope-v0")


class TestTfMetricEquivalents:
    def test_average_success(self):
        assert average_success_metric(np.array([1.0, 0.5, 1.0, 0.0])) == 0.5

    def test_average_goal_distance(self):
        assert average_final_goal_distance(np.array([0.1, 0.3])) == pytest.approx(0.2)
