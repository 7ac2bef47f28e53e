"""Fused-inference engine (Pallas layer kernel) parity tests.

The fused path (models/fused.py + ops/fused_layer.py) must reproduce the
flax DiffusionGPT/GCDenoiser numerics exactly in f32 (interpret mode on the
CPU mesh here; the same kernel compiles on TPU, where parity is at bf16
rounding level). models/gpt.py itself carries the reference golden tests
(tests/test_reference_parity.py), so agreement with it is agreement with
`score_gpts.py:272-358` / `score_wrappers.py:81-96`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.models import DiffusionGPT, GCDenoiser
from beso_tpu.models.fused import (fused_gpt_apply, make_fused_denoise_fn,
                                   prepare_fused_gpt)
from beso_tpu.ops.fused_layer import (fused_layer, fused_layer_reference,
                                      padded_head_dim, prepare_layer_params)

KITCHEN = dict(state_dim=30, action_dim=9, embed_dim=360, n_layers=2,
               n_heads=6, goal_seq_len=2, obs_seq_len=4)
PUSH = dict(state_dim=10, action_dim=2, embed_dim=240, n_layers=2,
            n_heads=12, goal_seq_len=1, obs_seq_len=5)


def _inputs(kw, B, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    s = jax.random.normal(ks[0], (B, kw["obs_seq_len"], kw["state_dim"]))
    a = jax.random.normal(ks[1], (B, kw["obs_seq_len"], kw["action_dim"]))
    g = jax.random.normal(ks[2], (B, kw["goal_seq_len"], kw["state_dim"]))
    sig = jnp.exp(jax.random.uniform(ks[3], (B,), minval=-5, maxval=0))
    return s, a, g, sig, ks[4]


class TestFusedLayer:
    def test_padded_head_dim(self):
        assert padded_head_dim(60) == 64
        assert padded_head_dim(20) == 32
        assert padded_head_dim(64) == 64
        assert padded_head_dim(17) == 32

    @pytest.mark.parametrize("H,hd,T", [(6, 60, 11), (12, 20, 12)])
    def test_kernel_matches_reference(self, H, hd, T):
        D = H * hd
        ks = jax.random.split(jax.random.PRNGKey(1), 12)
        p = prepare_layer_params(
            jax.random.normal(ks[0], (D, 3 * D)) * 0.05,
            jax.random.normal(ks[1], (3 * D,)) * 0.05,
            jax.random.normal(ks[2], (D, D)) * 0.05,
            jax.random.normal(ks[3], (D,)) * 0.05,
            jax.random.normal(ks[4], (D, 4 * D)) * 0.05,
            jax.random.normal(ks[5], (4 * D,)) * 0.05,
            jax.random.normal(ks[6], (4 * D, D)) * 0.05,
            jax.random.normal(ks[7], (D,)) * 0.05,
            1.0 + 0.1 * jax.random.normal(ks[8], (D,)),
            0.1 * jax.random.normal(ks[9], (D,)),
            1.0 + 0.1 * jax.random.normal(ks[10], (D,)),
            0.1 * jax.random.normal(ks[11], (D,)),
            n_heads=H, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(2), (T, D, 8))
        out = fused_layer(x, p, n_heads=H, head_dim=hd, env_block=8,
                          interpret=True)
        ref = fused_layer_reference(x, p, n_heads=H, head_dim=hd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_rejects_misaligned_batch(self):
        D, H, hd = 24, 2, 12
        p = prepare_layer_params(
            jnp.zeros((D, 3 * D)), jnp.zeros((3 * D,)),
            jnp.zeros((D, D)), jnp.zeros((D,)),
            jnp.zeros((D, 4 * D)), jnp.zeros((4 * D,)),
            jnp.zeros((4 * D, D)), jnp.zeros((D,)),
            jnp.ones((D,)), jnp.zeros((D,)), jnp.ones((D,)), jnp.zeros((D,)),
            n_heads=H, dtype=jnp.float32)
        with pytest.raises(ValueError, match="not a multiple"):
            fused_layer(jnp.zeros((4, D, 5)), p, n_heads=H, head_dim=hd,
                        env_block=8, interpret=True)


class TestFusedGPT:
    @pytest.mark.parametrize("kw", [KITCHEN, PUSH], ids=["kitchen", "push"])
    def test_matches_flax_denoiser(self, kw):
        model = DiffusionGPT(**kw)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(kw, B=8)
        params = den.init(k, s, a, g, sig)
        ref = den.apply(params, s, a, g, sig)
        fn = make_fused_denoise_fn(den, params, env_block=8, interpret=True)
        out = fn(s, a, g, sig)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)

    def test_uncond_matches_flax(self):
        model = DiffusionGPT(cond_mask_prob=0.1, **KITCHEN)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(KITCHEN, B=8, key=3)
        params = den.init(k, s, a, g, sig)
        ref = den.apply(params, s, a, g, sig, uncond=True)
        fn = make_fused_denoise_fn(den, params, env_block=8, interpret=True)
        out = fn(s, a, g, sig, uncond=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)

    def test_batch_padding(self):
        """B not a multiple of env_block is padded and sliced back."""
        model = DiffusionGPT(**PUSH)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(PUSH, B=5, key=4)
        params = den.init(k, s, a, g, sig)
        ref = den.apply(params, s, a, g, sig)
        fn = make_fused_denoise_fn(den, params, env_block=8, interpret=True)
        out = fn(s, a, g, sig)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)

    def test_mlp_head_variant(self):
        model = DiffusionGPT(linear_output=False, **KITCHEN)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(KITCHEN, B=8, key=5)
        params = den.init(k, s, a, g, sig)
        ref = den.apply(params, s, a, g, sig)
        fn = make_fused_denoise_fn(den, params, env_block=8, interpret=True)
        out = fn(s, a, g, sig)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)

    def test_in_sampler_loop(self):
        """The fused denoise fn drops into the DDIM sampling loop."""
        from beso_tpu.sampling.samplers import sample_ddim

        model = DiffusionGPT(**PUSH)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(PUSH, B=8, key=6)
        params = den.init(k, s, a, g, sig)
        fn = make_fused_denoise_fn(den, params, env_block=8, interpret=True)
        sigmas = jnp.asarray([1.0, 0.3, 0.05, 0.0])
        x = jax.random.normal(jax.random.PRNGKey(7), a.shape)

        def ref_denoise(st, ac, go, sg):
            return den.apply(params, st, ac, go, sg)

        out_f = sample_ddim(lambda x_, sg: fn(s, x_, g, sg), x, sigmas)
        out_r = sample_ddim(lambda x_, sg: ref_denoise(s, x_, g, sg), x, sigmas)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   atol=1e-4, rtol=1e-4)


class TestFusedCached:
    """Combined engine: prefix-KV cache + fused Pallas suffix layers."""

    def test_matches_flax_on_grid_sigmas(self):
        from beso_tpu.models.fused import make_fused_cached_denoise_fn

        model = DiffusionGPT(**KITCHEN)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(KITCHEN, B=8, key=11)
        params = den.init(k, s, a, g, sig)
        sigmas = jnp.asarray([1.0, 0.18, 0.032])
        dn = make_fused_cached_denoise_fn(den, params, g, sigmas,
                                          env_block=8, interpret=True)
        for sg in [1.0, 0.18, 0.032]:
            sig_b = jnp.full((8,), sg)
            ref = den.apply(params, s, a, g, sig_b)
            out = dn(s, a, g, sig_b)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5, rtol=1e-4)

    def test_token_lanes_matches_phase_split(self):
        """The round-3 token-merged-lanes kernel and the round-2
        phase-split kernel compute identical suffix forwards."""
        from beso_tpu.models.fused import make_fused_cached_denoise_fn

        model = DiffusionGPT(**KITCHEN)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(KITCHEN, B=16, key=13)
        params = den.init(k, s, a, g, sig)
        sigmas = jnp.asarray([1.0, 0.18, 0.032])
        dn_tl = make_fused_cached_denoise_fn(den, params, g, sigmas,
                                             env_block=8, interpret=True,
                                             token_lanes=True)
        dn_ps = make_fused_cached_denoise_fn(den, params, g, sigmas,
                                             env_block=8, interpret=True,
                                             token_lanes=False)
        sig_b = jnp.full((16,), 0.18)
        np.testing.assert_allclose(np.asarray(dn_tl(s, a, g, sig_b)),
                                   np.asarray(dn_ps(s, a, g, sig_b)),
                                   atol=1e-5, rtol=1e-4)

    def test_layer_group_matches(self):
        """The grouped multi-layer kernel (VERDICT r3 #7: N blocks in one
        pallas_call) computes the same forward as per-layer calls, for
        group sizes that do and do not divide the layer count."""
        from beso_tpu.models.fused import make_fused_cached_denoise_fn

        model = DiffusionGPT(**KITCHEN)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(KITCHEN, B=8, key=23)
        params = den.init(k, s, a, g, sig)
        sigmas = jnp.asarray([1.0, 0.18, 0.032])
        sig_b = jnp.full((8,), 0.18)
        ref = den.apply(params, s, a, g, sig_b)
        for group in (2, 3, 4):
            dn = make_fused_cached_denoise_fn(den, params, g, sigmas,
                                              env_block=8, interpret=True,
                                              layer_group=group)
            np.testing.assert_allclose(np.asarray(dn(s, a, g, sig_b)),
                                       np.asarray(ref),
                                       atol=1e-5, rtol=1e-4)

    def test_qbatch_attention_matches(self):
        """Key-batched and unrolled attention phases of the tl v2 kernel
        agree (both against the flax forward)."""
        from beso_tpu.models.fused import make_fused_cached_denoise_fn

        model = DiffusionGPT(**KITCHEN)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(KITCHEN, B=8, key=17)
        params = den.init(k, s, a, g, sig)
        sigmas = jnp.asarray([1.0, 0.18, 0.032])
        sig_b = jnp.full((8,), 0.18)
        ref = den.apply(params, s, a, g, sig_b)
        for qb in (False, True):
            dn = make_fused_cached_denoise_fn(den, params, g, sigmas,
                                              env_block=8, interpret=True,
                                              attn_qbatch=qb)
            np.testing.assert_allclose(np.asarray(dn(s, a, g, sig_b)),
                                       np.asarray(ref),
                                       atol=1e-5, rtol=1e-4)

    def test_mlp_head_token_lanes(self):
        """linear_output=False skips the in-kernel epilogue and still
        matches the flax forward through the tl kernel."""
        from beso_tpu.models.fused import make_fused_cached_denoise_fn

        model = DiffusionGPT(linear_output=False, **KITCHEN)
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig, k = _inputs(KITCHEN, B=8, key=19)
        params = den.init(k, s, a, g, sig)
        sigmas = jnp.asarray([1.0, 0.18, 0.032])
        sig_b = jnp.full((8,), 1.0)
        ref = den.apply(params, s, a, g, sig_b)
        dn = make_fused_cached_denoise_fn(den, params, g, sigmas,
                                          env_block=8, interpret=True)
        np.testing.assert_allclose(np.asarray(dn(s, a, g, sig_b)),
                                   np.asarray(ref), atol=1e-5, rtol=1e-4)

    def test_rollout_metrics_match_cached(self):
        """fused_cached and cached engines agree end-to-end in a rollout."""
        from beso_tpu.agents.policy import PolicyConfig
        from beso_tpu.data import synthetic_kitchen_data
        from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals
        from beso_tpu.models import fit_scaler
        from beso_tpu.models.cached import make_rollout_denoise_factory
        from beso_tpu.rollout import rollout_kitchen
        import beso_tpu.models.fused as mf
        import functools

        model = DiffusionGPT(state_dim=30, action_dim=9, embed_dim=72,
                             n_layers=2, n_heads=6, goal_seq_len=2,
                             obs_seq_len=4)
        den = GCDenoiser(model, sigma_data=0.5)
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        params = den.init(ks[0], jnp.zeros((2, 4, 30)), jnp.zeros((2, 4, 9)),
                          jnp.zeros((2, 2, 30)), jnp.full((2,), 0.5))
        data = synthetic_kitchen_data(n_traj=4, t_max=30)
        scaler = fit_scaler(data.all_observations(), data.all_actions())
        goals, expected = multigoal_kitchen_goals(data, 2, 4, seed=0)
        goals, expected = jnp.asarray(goals), jnp.asarray(expected)
        cfg = PolicyConfig(window_size=4, obs_dim=30, action_dim=9,
                           num_sampling_steps=2, sigma_min=0.005)

        def dn(s, a, g, sig):
            return den.apply(params, s, a, g, sig)

        # force small env_block for the 4-env CPU test
        orig = mf.make_fused_cached_denoise_fn
        mf_small = functools.partial(orig, env_block=4)
        mf.make_fused_cached_denoise_fn = mf_small
        try:
            f_cached = make_rollout_denoise_factory(den, params, scaler, cfg,
                                                    engine="cached")
            f_fused = make_rollout_denoise_factory(den, params, scaler, cfg,
                                                   engine="fused_cached")
            key = jax.random.PRNGKey(3)
            m1 = rollout_kitchen(dn, scaler, cfg, goals, expected, key,
                                 n_steps=3, denoise_factory=f_cached)
            m2 = rollout_kitchen(dn, scaler, cfg, goals, expected, key,
                                 n_steps=3, denoise_factory=f_fused)
        finally:
            mf.make_fused_cached_denoise_fn = orig
        np.testing.assert_allclose(np.asarray(m2.rewards),
                                   np.asarray(m1.rewards), atol=1e-4)
