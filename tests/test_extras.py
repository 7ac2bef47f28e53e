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


class TestRegistryVariantsBehave:
    """Every env-id variant must be behaviorally distinct, not an alias
    (round-1 finding: Normalized/Insert/Rgb ids were aliases of PUSH)."""

    def test_normalized_obs_and_action(self):
        from beso_tpu.envs.block_push.single import ACTION_MAX

        raw = make("BlockPush-v0")
        norm = make("BlockPushNormalized-v0")
        key = jax.random.PRNGKey(0)
        s_raw, s_norm = raw.reset_fn(key), norm.reset_fn(key)
        o_raw, o_norm = raw.obs_fn(s_raw), norm.obs_fn(s_norm)
        # normalized obs are restructured (relative translations + cos/sin),
        # roughly within [-3, 3] of the published stats; raw coords differ
        assert float(jnp.abs(o_norm).max()) <= 3.0
        assert not np.allclose(np.asarray(o_raw), np.asarray(o_norm))
        # a full-scale [1, 1] normalized action = ACTION_MAX raw delta
        # (block_pushing.py:875-880)
        s2n, _, _, _ = norm.step_fn(s_norm, jnp.asarray([1.0, 1.0]))
        s2r, _, _, _ = raw.step_fn(s_raw, jnp.asarray(ACTION_MAX))
        np.testing.assert_allclose(np.asarray(s2n.effector_target),
                                   np.asarray(s2r.effector_target), atol=1e-6)
        # normalized reward is x100 (block_pushing.py:860)

    def test_insert_slot_gates_entry(self):
        """INSERT: a block pushed at the target from a misaligned bearing is
        held at the slot rim; PUSH lets it straight in."""
        from beso_tpu.envs.block_push.single import (SLOT_RADIUS,
                                                     SingleBlockPushState)

        def state_for(task_spec, bearing_offset):
            s = task_spec.reset_fn(jax.random.PRNGKey(3))
            # place the block just outside the slot radius, approaching the
            # target from `bearing_offset` relative to the slot opening,
            # with the effector directly behind it on the push line
            opening = float(s.target_yaw)
            ang = opening + bearing_offset
            radial = jnp.asarray([jnp.cos(ang), jnp.sin(ang)])
            start = s.target_pos + radial * (SLOT_RADIUS + 0.01)
            eff = start + radial * 0.04
            return s._replace(block_pos=start, effector=eff,
                              effector_target=eff)

        insert = make("BlockInsert-v0")
        push = make("BlockPush-v0")

        for spec, task in [(insert, "INSERT"), (push, "PUSH")]:
            s = state_for(spec, bearing_offset=jnp.pi)  # opposite the opening
            # drive the effector through the block toward the target
            for _ in range(30):
                to_t = s.target_pos - s.effector
                a = jnp.clip(to_t, -0.1, 0.1)
                s, _, _, _ = spec.step_fn(s, a)
            d = float(jnp.linalg.norm(s.block_pos - s.target_pos))
            if task == "INSERT":
                assert d >= SLOT_RADIUS - 1e-4, \
                    f"INSERT let a misaligned block in (d={d:.4f})"
                d_insert = d
            else:
                d_push = d
        assert d_push < d_insert, "PUSH and INSERT behave identically"

    def test_rgb_ids_render(self):
        for env_id in ["BlockPushRgb-v0", "BlockInsertRgb-v0",
                       "BlockPushMultimodalRgb-v0"]:
            spec = make(env_id)
            assert spec.render_fn is not None, f"{env_id} has no render_fn"
            frame = spec.render_fn(spec.reset_fn(jax.random.PRNGKey(0)))
            assert frame.dtype == np.uint8 and frame.ndim == 3
        # non-Rgb ids ship no renderer
        assert make("BlockPush-v0").render_fn is None

    def test_flipped_is_horizontal_short(self):
        flipped = make("BlockPushMultimodalFlipped-v0")
        assert flipped.max_episode_steps == 25  # multimodal:713-717
