"""Multi-device serving-engine tests: fused Pallas rollouts under shard_map.

VERDICT r4 #1: the fused_cached engine was hard-gated to one device; the
supported multi-device path is now `rollout_*_sharded` (rollout/sharded.py),
which wraps the whole rollout in shard_map over the mesh's data axes so each
device executes its own pallas_call on its env shard. These tests validate,
on the virtual 8-device CPU mesh (Pallas interpret mode):

1. numeric parity of the fused_cached engine vs the cached engine when the
   denoise fn is BUILT AND CALLED inside a shard_map region,
2. end-to-end sharded rollouts (kitchen + block push) execute with both
   engines and agree exactly on all metrics,
3. the sharded metrics carry the TOTAL env-step count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from beso_tpu.agents.policy import PolicyConfig
from beso_tpu.data.trajectories import (synthetic_kitchen_data,
                                        synthetic_push_data)
from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals
from beso_tpu.models import (DiffusionGPT, GCDenoiser, fit_minmax_scaler,
                             fit_scaler, make_rollout_denoise_factory)
from beso_tpu.parallel import make_mesh
from beso_tpu.rollout import (rollout_block_push_sharded,
                              rollout_kitchen_sharded)
from beso_tpu.rollout.sharded import _shard_map


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def _kitchen_setup(B=16):
    model = DiffusionGPT(state_dim=30, action_dim=9, embed_dim=32, n_layers=2,
                         n_heads=2, goal_seq_len=2, obs_seq_len=4)
    den = GCDenoiser(model, sigma_data=0.5)
    params = den.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 30)),
                      jnp.zeros((2, 4, 9)), jnp.zeros((2, 2, 30)),
                      jnp.full((2,), 0.5))
    data = synthetic_kitchen_data(n_traj=8, t_max=40)
    scaler = fit_scaler(data.all_observations(), data.all_actions())
    goals, expected = multigoal_kitchen_goals(data, 2, B, seed=42)
    cfg = PolicyConfig(window_size=4, obs_dim=30, action_dim=9,
                       num_sampling_steps=2, sigma_min=0.005,
                       sampler_type="ddim")
    return den, params, scaler, jnp.asarray(goals), jnp.asarray(expected), cfg


class TestShardedEngineParity:
    def test_fused_denoise_matches_cached_inside_shard_map(self, eight_devices):
        """Build + call both engines' denoise fns inside a shard_map region;
        outputs must agree (the pallas kernel, running per shard, computes
        the same numbers as the XLA cached path)."""
        den, params, scaler, goals, expected, cfg = _kitchen_setup(B=16)
        mesh = make_mesh(8, tp=1)
        spec = P("dp")

        f_cached = make_rollout_denoise_factory(den, params, scaler, cfg,
                                                engine="cached")
        f_fused = make_rollout_denoise_factory(den, params, scaler, cfg,
                                               engine="fused_cached")

        from beso_tpu.core.schedules import get_noise_schedule
        sig0 = get_noise_schedule(cfg.num_sampling_steps, cfg.sigma_min,
                                  cfg.sigma_max, cfg.rho,
                                  cfg.noise_scheduler)[0]

        key = jax.random.PRNGKey(3)
        states = jax.random.normal(key, (16, 4, 30))
        actions = jax.random.normal(jax.random.fold_in(key, 1), (16, 4, 9))

        def body(goals_s, states_s, actions_s):
            sig = jnp.full((states_s.shape[0],), sig0)
            out_c = f_cached(goals_s)(states_s, actions_s, None, sig)
            out_f = f_fused(goals_s)(states_s, actions_s, None, sig)
            return out_c, out_f

        with mesh:
            out_c, out_f = jax.jit(_shard_map(
                body, mesh=mesh, in_specs=(spec, spec, spec),
                out_specs=(spec, spec)))(goals, states, actions)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_f),
                                   atol=2e-4, rtol=2e-4)

    def test_kitchen_sharded_rollout_engines_agree(self, eight_devices):
        den, params, scaler, goals, expected, cfg = _kitchen_setup(B=16)
        mesh = make_mesh(8, tp=1)

        def denoise(s, a, g, sig):
            return den.apply(params, s, a, g, sig)

        metrics = {}
        for engine in ("cached", "fused_cached"):
            factory = make_rollout_denoise_factory(den, params, scaler, cfg,
                                                   engine=engine)
            with mesh:
                m = jax.jit(lambda k, f=factory: rollout_kitchen_sharded(
                    denoise, scaler, cfg, goals, expected, k, mesh,
                    n_steps=3, denoise_factory=f))(jax.random.PRNGKey(1))
                jax.block_until_ready(m.rewards)
            metrics[engine] = m

        for field in ("rewards", "results", "completed", "completion_order"):
            np.testing.assert_allclose(
                np.asarray(getattr(metrics["cached"], field)),
                np.asarray(getattr(metrics["fused_cached"], field)),
                atol=1e-5, err_msg=field)
        assert int(metrics["fused_cached"].env_steps) == 16 * 3
        assert np.isfinite(np.asarray(metrics["fused_cached"].rewards)).all()

    def test_block_push_sharded_rollout_runs_fused(self, eight_devices):
        model = DiffusionGPT(state_dim=10, action_dim=2, embed_dim=24,
                             n_layers=1, n_heads=2, goal_seq_len=1,
                             obs_seq_len=5)
        den = GCDenoiser(model, sigma_data=0.5)
        params = den.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 10)),
                          jnp.zeros((2, 5, 2)), jnp.zeros((2, 1, 10)),
                          jnp.full((2,), 0.5))
        data = synthetic_push_data(n_traj=8, t_max=40)
        scaler = fit_minmax_scaler(data.all_observations()[:, :10],
                                   data.all_actions())
        from beso_tpu.envs.block_push.goals import block_push_goal_frames
        frames, expected = block_push_goal_frames(data, 16, seed=6)
        cfg = PolicyConfig(window_size=5, obs_dim=10, action_dim=2,
                           num_sampling_steps=2, sigma_min=0.05,
                           sampler_type="ddim")

        def denoise(s, a, g, sig):
            return den.apply(params, s, a, g, sig)

        factory = make_rollout_denoise_factory(den, params, scaler, cfg,
                                               engine="fused_cached")
        mesh = make_mesh(8, tp=1)
        with mesh:
            m = jax.jit(lambda k: rollout_block_push_sharded(
                denoise, scaler, cfg, jnp.asarray(frames),
                jnp.asarray(expected), k, mesh, n_steps=3,
                denoise_factory=factory))(jax.random.PRNGKey(2))
            jax.block_until_ready(m.rewards)
        assert np.isfinite(np.asarray(m.rewards)).all()
        assert int(m.env_steps) == 16 * 3

    def test_batch_not_divisible_raises(self, eight_devices):
        den, params, scaler, goals, expected, cfg = _kitchen_setup(B=16)
        mesh = make_mesh(8, tp=1)

        def denoise(s, a, g, sig):
            return den.apply(params, s, a, g, sig)

        with pytest.raises(ValueError, match="not divisible"):
            with mesh:
                rollout_kitchen_sharded(denoise, scaler, cfg, goals[:12],
                                        expected[:12], jax.random.PRNGKey(0),
                                        mesh, n_steps=2)
