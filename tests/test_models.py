"""Tests for DiffusionGPT, GCDenoiser, CFG, EMA, and scalers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.models import (
    DiffusionGPT,
    EmaState,
    GCDenoiser,
    Scaler,
    cfg_denoise_fn,
    ema_init,
    ema_update,
    fit_minmax_scaler,
    fit_scaler,
)
from beso_tpu.models.denoiser import denoiser_loss
from beso_tpu.models.mlps import MLPNetwork, ResidualMLPNetwork
from beso_tpu.models.vision import GlobalAvgPool2d, SpatialSoftArgmax

OBS, ACT, G, T, D = 10, 2, 1, 5, 48


def small_gpt(**kw):
    defaults = dict(
        state_dim=OBS, action_dim=ACT, embed_dim=D, n_layers=2, n_heads=4,
        goal_seq_len=G, obs_seq_len=T, goal_conditioned=True, linear_output=True,
    )
    defaults.update(kw)
    return DiffusionGPT(**defaults)


def init_inputs(B=3, key=0):
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 4)
    return (
        jax.random.normal(ks[0], (B, T, OBS)),
        jax.random.normal(ks[1], (B, T, ACT)),
        jax.random.normal(ks[2], (B, G, OBS)),
        jnp.full((B,), 0.5),
    )


class TestDiffusionGPT:
    def test_shapes(self):
        model = small_gpt()
        s, a, g, sig = init_inputs()
        params = model.init(jax.random.PRNGKey(0), s, a, g, sig)
        out = model.apply(params, s, a, g, sig)
        assert out.shape == (3, T, ACT)
        assert model.block_size == G + 2 * T + 1
        assert model.seq_size == G + T + 1

    def test_causality_over_action_tokens(self):
        """Perturbing the LAST action must not change earlier action preds."""
        model = small_gpt()
        s, a, g, sig = init_inputs()
        params = model.init(jax.random.PRNGKey(0), s, a, g, sig)
        out1 = model.apply(params, s, a, g, sig)
        a2 = a.at[:, -1, :].add(10.0)
        out2 = model.apply(params, s, a2, g, sig)
        # tokens are [sigma, g, s1, a1, ..., sT, aT]; causal mask means a_T
        # influences only the a_T output slot
        np.testing.assert_allclose(out1[:, :-1], out2[:, :-1], atol=1e-5)
        assert not np.allclose(out1[:, -1], out2[:, -1])

    def test_sigma_conditioning(self):
        model = small_gpt()
        s, a, g, sig = init_inputs()
        params = model.init(jax.random.PRNGKey(0), s, a, g, sig)
        out1 = model.apply(params, s, a, g, sig)
        out2 = model.apply(params, s, a, g, sig * 10)
        assert not np.allclose(out1, out2)

    def test_uncond_equals_zero_goals(self):
        model = small_gpt()
        s, a, g, sig = init_inputs()
        params = model.init(jax.random.PRNGKey(0), s, a, g, sig)
        out_uncond = model.apply(params, s, a, g, sig, uncond=True)
        out_zero = model.apply(params, s, a, jnp.zeros_like(g), sig)
        np.testing.assert_allclose(out_uncond, out_zero, atol=1e-6)

    def test_goal_not_conditioned_variant(self):
        model = small_gpt(goal_conditioned=False)
        s, a, g, sig = init_inputs()
        params = model.init(jax.random.PRNGKey(0), s, a, g, sig)
        out1 = model.apply(params, s, a, g, sig)
        out2 = model.apply(params, s, a, g * 100, sig)
        np.testing.assert_allclose(out1, out2, atol=1e-6)

    def test_cond_mask_prob_changes_train_output(self):
        model = small_gpt(cond_mask_prob=0.5)
        s, a, g, sig = init_inputs()
        params = model.init(jax.random.PRNGKey(0), s, a, g, sig)
        out_eval = model.apply(params, s, a, g, sig)
        out_train = model.apply(
            params, s, a, g, sig, train=True,
            rngs={"cond_mask": jax.random.PRNGKey(7)})
        assert not np.allclose(out_eval, out_train)

    def test_bf16_compute(self):
        model = small_gpt(dtype=jnp.bfloat16)
        s, a, g, sig = init_inputs()
        params = model.init(jax.random.PRNGKey(0), s, a, g, sig)
        out = model.apply(params, s, a, g, sig)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()


class TestDenoiser:
    def test_identity_at_sigma_zero_limit(self):
        """As sigma -> 0, D(x, sigma) -> x (c_skip->1, c_out->0)."""
        model = small_gpt()
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig = init_inputs()
        params = den.init(jax.random.PRNGKey(0), s, a, g, sig)
        out = den.apply(params, s, a, g, jnp.full((3,), 1e-8))
        np.testing.assert_allclose(out, a, atol=1e-4)

    def test_loss_golden_linear_inner(self):
        """Loss formula checked against a hand-rolled numpy computation with
        an inner model that returns zeros: loss = mean(target^2)."""
        def zero_inner(params, s, a, g, sig, **kw):
            return jnp.zeros_like(a)

        s, a, g, sig = init_inputs()
        noise = jax.random.normal(jax.random.PRNGKey(9), a.shape)
        loss = denoiser_loss(zero_inner, None, s, a, g, noise, sig, sigma_data=0.5)

        sd = 0.5
        sig_np = np.asarray(sig)[:, None, None]
        noised = np.asarray(a) + np.asarray(noise) * sig_np
        c_skip = sd**2 / (sig_np**2 + sd**2)
        c_out = sig_np * sd / np.sqrt(sig_np**2 + sd**2)
        target = (np.asarray(a) - c_skip * noised) / c_out
        np.testing.assert_allclose(loss, np.mean(target**2), rtol=1e-5)

    def test_pred_last_action_only(self):
        def zero_inner(params, s, a, g, sig, **kw):
            return jnp.zeros_like(a)

        s, a, g, sig = init_inputs()
        noise = jax.random.normal(jax.random.PRNGKey(9), a.shape)
        loss = denoiser_loss(zero_inner, None, s, a, g, noise, sig,
                             sigma_data=0.5, pred_last_action_only=True)
        assert np.isfinite(float(loss))


class TestCFG:
    def test_cfg_matches_two_calls(self):
        model = small_gpt()
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig = init_inputs()
        params = den.init(jax.random.PRNGKey(0), s, a, g, sig)

        def denoise(st, ac, go, si):
            return den.apply(params, st, ac, go, si)

        lam = 1.5
        fused = cfg_denoise_fn(denoise, lam)(s, a, g, sig)
        cond = denoise(s, a, g, sig)
        uncond = denoise(s, a, jnp.zeros_like(g), sig)
        want = uncond + lam * (cond - uncond)
        np.testing.assert_allclose(fused, want, atol=1e-5)

    def test_lambda_edge_cases(self):
        model = small_gpt()
        den = GCDenoiser(model, sigma_data=0.5)
        s, a, g, sig = init_inputs()
        params = den.init(jax.random.PRNGKey(0), s, a, g, sig)

        def denoise(st, ac, go, si):
            return den.apply(params, st, ac, go, si)

        np.testing.assert_allclose(
            cfg_denoise_fn(denoise, 1.0)(s, a, g, sig), denoise(s, a, g, sig))
        np.testing.assert_allclose(
            cfg_denoise_fn(denoise, 0.0)(s, a, g, sig),
            denoise(s, a, jnp.zeros_like(g), sig))


class TestEMA:
    def test_warmup_decay(self):
        """First update uses decay = min(0.999, 2/11)."""
        params = {"w": jnp.ones((3,))}
        ema = ema_init(params)
        new = {"w": jnp.zeros((3,))}
        ema = ema_update(ema, new, decay=0.999)
        d = min(0.999, 2 / 11)
        np.testing.assert_allclose(ema.params["w"], np.full(3, d), rtol=1e-6)
        assert int(ema.num_updates) == 1

    def test_converges_to_params(self):
        ema = ema_init({"w": jnp.zeros(())})
        target = {"w": jnp.ones(())}
        for _ in range(200):
            ema = ema_update(ema, target, decay=0.9)
        assert float(ema.params["w"]) > 0.99


class TestScaler:
    def test_standard_roundtrip(self):
        rng = np.random.RandomState(0)
        x = rng.randn(100, 6) * 3 + 1
        y = rng.randn(100, 2) * 2 - 1
        sc = fit_scaler(x, y, scale_data=True)
        ys = sc.scale_output(jnp.asarray(y, jnp.float32))
        np.testing.assert_allclose(np.asarray(ys).mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ys).std(0), 1, atol=1e-4)
        back = sc.inverse_scale_output(ys)
        np.testing.assert_allclose(back, y, rtol=1e-4, atol=1e-4)

    def test_minmax_output_range(self):
        rng = np.random.RandomState(1)
        x = rng.randn(50, 16)
        y = rng.rand(50, 2) * 10
        sc = fit_minmax_scaler(x, y, scale_data=True)
        ys = np.asarray(sc.scale_output(jnp.asarray(y, jnp.float32)))
        assert ys.min() >= -1 - 1e-5 and ys.max() <= 1 + 1e-5
        np.testing.assert_allclose(sc.y_bounds, [[-1, -1], [1, 1]])
        back = sc.inverse_scale_output(jnp.asarray(ys))
        np.testing.assert_allclose(back, y, rtol=1e-4, atol=1e-4)

    def test_clip_action_11x(self):
        x = np.random.RandomState(2).randn(50, 4)
        y = np.random.RandomState(3).rand(50, 2)  # in [0, 1]
        sc = fit_scaler(x, y, scale_data=False)
        clipped = np.asarray(sc.clip_action(jnp.asarray([[5.0, -5.0]])))
        np.testing.assert_allclose(clipped[0], np.asarray(sc.y_bounds)[1] * [1.1, 0] + np.asarray(sc.y_bounds)[0] * [0, 1.1], rtol=1e-5)

    def test_kitchen_onehot_passthrough(self):
        x = np.random.RandomState(4).randn(50, 30)
        y = np.random.RandomState(5).randn(50, 9)
        sc = fit_scaler(x, y, scale_data=True)
        onehot = jnp.eye(7)[None, :3].reshape(3, 7)
        np.testing.assert_allclose(sc.scale_input(onehot), onehot)

    def test_blockpush_4dim_goal(self):
        x = np.random.RandomState(6).randn(50, 16)
        y = np.random.RandomState(7).randn(50, 2)
        sc = fit_scaler(x, y, scale_data=True)
        g = jnp.ones((2, 4))
        out = np.asarray(sc.scale_input(g))
        mean = np.asarray(sc.x_mean)[[0, 1, 3, 4]]
        std = np.asarray(sc.x_std)[[0, 1, 3, 4]]
        want = np.tile((1 - mean) / (std + 1e-12), (2, 1))
        np.testing.assert_allclose(out, want, rtol=1e-4)


class TestAuxNets:
    def test_mlps(self):
        x = jnp.ones((4, 8))
        for net in [MLPNetwork(hidden_dim=16, num_hidden_layers=2, output_dim=3),
                    ResidualMLPNetwork(hidden_dim=16, num_hidden_layers=4, output_dim=3)]:
            params = net.init(jax.random.PRNGKey(0), x)
            assert net.apply(params, x).shape == (4, 3)

    def test_vision(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        ssa = SpatialSoftArgmax()
        out = ssa.apply(ssa.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2, 3, 2)
        assert np.abs(np.asarray(out)).max() <= 1.0
        gap = GlobalAvgPool2d()
        assert gap.apply(gap.init(jax.random.PRNGKey(0), x), x).shape == (2, 3)


class TestVisionDiffusionGPT:
    def test_separate_goal_embedding(self):
        """VisionDiffusionGPT (score_gpts.py:377-642): goals of dim
        state_dim-14 get their OWN Linear embedding instead of sharing
        tok_emb; otherwise identical math."""
        from beso_tpu.models.gpt import VisionDiffusionGPT

        m = VisionDiffusionGPT(state_dim=30, action_dim=9, embed_dim=48,
                               n_layers=2, n_heads=2, goal_seq_len=2,
                               obs_seq_len=3)
        assert m.goal_dim == 16  # state_dim - 14 (score_gpts.py:408)
        rng = np.random.default_rng(0)
        states = jnp.asarray(rng.normal(size=(2, 3, 30)), jnp.float32)
        actions = jnp.asarray(rng.normal(size=(2, 3, 9)), jnp.float32)
        goals = jnp.asarray(rng.normal(size=(2, 2, 16)), jnp.float32)
        sigma = jnp.full((2,), 0.5)
        params = m.init(jax.random.PRNGKey(0), states, actions, goals, sigma)
        assert "goal_emb" in params["params"]  # separate goal Linear exists
        out = m.apply(params, states, actions, goals, sigma)
        assert out.shape == (2, 3, 9)
        assert np.isfinite(np.asarray(out)).all()
        # uncond zeroes the goals: different output than conditional
        out_uncond = m.apply(params, states, actions, goals, sigma, uncond=True)
        assert not np.allclose(np.asarray(out), np.asarray(out_uncond))
        # zero goals == uncond (goal path enters only through goal_emb)
        out_zero = m.apply(params, states, actions, jnp.zeros_like(goals), sigma)
        np.testing.assert_allclose(np.asarray(out_uncond), np.asarray(out_zero),
                                   rtol=1e-6, atol=1e-7)
