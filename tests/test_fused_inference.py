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
