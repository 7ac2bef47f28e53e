"""End-to-end training slice + policy predict + checkpoint tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.agents.policy import (
    PolicyConfig,
    PolicyState,
    policy_predict,
    policy_reset,
)
from beso_tpu.core.densities import make_sample_density
from beso_tpu.data import SlicedDataset, synthetic_push_data
from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_minmax_scaler
from beso_tpu.train.trainer import (
    TrainState,
    evaluate_mse,
    make_optimizer,
    make_train_step,
    process_batch,
    step_lr_schedule,
)

W, G_LEN, OBS, ACT = 5, 1, 16, 2


@pytest.fixture(scope="module")
def setup():
    data = synthetic_push_data(n_traj=12, t_max=60)
    ds = SlicedDataset(data, window=W, future_conditional=True,
                       future_seq_len=G_LEN)
    scaler = fit_minmax_scaler(data.all_observations(), data.all_actions(),
                               scale_data=True)
    model = DiffusionGPT(state_dim=OBS, action_dim=ACT, embed_dim=32,
                         n_layers=2, n_heads=4, goal_seq_len=G_LEN,
                         obs_seq_len=W, cond_mask_prob=0.1,
                         approximate_gelu=False)  # torch-erf parity
    den = GCDenoiser(model, sigma_data=0.5)
    density = make_sample_density("loglogistic", 0.5, 0.05, 1.0)
    opt = make_optimizer("adam", lr=1e-3)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 32)
    s, a, g = process_batch(batch, scaler)
    params = den.init(jax.random.PRNGKey(1), s, a, g, jnp.ones((32,)) * 0.5)
    from beso_tpu.models.ema import ema_init

    ts = TrainState(params=params, opt_state=opt.init(params),
                    ema=ema_init(params), step=jnp.zeros((), jnp.int32))
    return dict(ds=ds, scaler=scaler, den=den, density=density, opt=opt, ts=ts)


class TestTraining:
    def test_loss_decreases(self, setup):
        train_step = make_train_step(setup["den"], setup["opt"],
                                     setup["density"], setup["scaler"],
                                     cond_mask_prob=0.1)
        ts = setup["ts"]
        key = jax.random.PRNGKey(2)
        losses = []
        for i in range(30):
            key, kb, ks = jax.random.split(key, 3)
            batch = setup["ds"].sample_batch(kb, 64)
            ts, loss = train_step(ts, batch, ks)
            losses.append(float(loss))
        assert int(ts.step) == 30
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_evaluate_mse_finite(self, setup):
        batch = setup["ds"].sample_batch(jax.random.PRNGKey(3), 16)
        mse = evaluate_mse(setup["den"], setup["ts"].params, batch,
                           setup["scaler"], jax.random.PRNGKey(4),
                           sigma_min=0.05)
        assert np.isfinite(float(mse))

    def test_step_lr(self):
        sched = step_lr_schedule(1e-4, step_size=100, gamma=0.99)
        assert sched(0) == pytest.approx(1e-4)
        assert sched(99) == pytest.approx(1e-4)
        assert sched(100) == pytest.approx(1e-4 * 0.99)
        assert sched(250) == pytest.approx(1e-4 * 0.99 ** 2)


class TestPolicyPredict:
    def test_rolling_context(self, setup):
        cfg = PolicyConfig(window_size=W, obs_dim=OBS, action_dim=ACT,
                           sigma_min=0.05, num_sampling_steps=3)
        den, scaler, ts = setup["den"], setup["scaler"], setup["ts"]

        def denoise(s, a, g, sig):
            return den.apply(ts.ema.params, s, a, g, sig)

        B = 4
        pstate = policy_reset(B, cfg)
        key = jax.random.PRNGKey(0)
        goal = jnp.zeros((B, G_LEN, OBS))
        for n in range(8):
            obs = jax.random.normal(jax.random.fold_in(key, n), (B, OBS))
            action, pstate = policy_predict(denoise, scaler, pstate, obs,
                                            goal, jax.random.fold_in(key, 100 + n), cfg)
            assert action.shape == (B, ACT)
            assert np.isfinite(np.asarray(action)).all()
            assert int(pstate.count[0]) == n + 1
        # after 8 steps with window 5, the obs buffer holds the last 5 obs
        assert pstate.obs_buf.shape == (B, W, OBS)

    def test_partial_window_matches_variable_length(self, setup):
        """With count < W the padded fixed-shape forward must equal a
        variable-length forward on the truncated window (causality check)."""
        den, ts = setup["den"], setup["ts"]
        model = setup["den"].inner_model
        B, t = 2, 3
        key = jax.random.PRNGKey(5)
        s_full = jnp.zeros((B, W, OBS)).at[:, :t].set(
            jax.random.normal(key, (B, t, OBS)))
        a_full = jnp.zeros((B, W, ACT)).at[:, :t].set(
            jax.random.normal(key, (B, t, ACT)))
        g = jax.random.normal(key, (B, G_LEN, OBS))
        sig = jnp.full((B,), 0.5)
        out_full = model.apply(ts.params, s_full, a_full, g, sig)
        out_trunc = model.apply(ts.params, s_full[:, :t], a_full[:, :t], g, sig)
        np.testing.assert_allclose(out_full[:, :t], out_trunc, atol=1e-5)

    def test_cfg_policy(self, setup):
        cfg = PolicyConfig(window_size=W, obs_dim=OBS, action_dim=ACT,
                           sigma_min=0.05, cond_lambda=2.0)
        den, scaler, ts = setup["den"], setup["scaler"], setup["ts"]

        def denoise(s, a, g, sig):
            return den.apply(ts.ema.params, s, a, g, sig)

        pstate = policy_reset(2, cfg)
        obs = jnp.ones((2, OBS))
        goal = jnp.ones((2, G_LEN, OBS))
        action, _ = policy_predict(denoise, scaler, pstate, obs, goal,
                                   jax.random.PRNGKey(0), cfg)
        assert np.isfinite(np.asarray(action)).all()


class TestCheckpoint:
    def test_orbax_roundtrip(self, setup, tmp_path):
        from beso_tpu.train.checkpoint import (restore_train_state,
                                               save_train_state)

        ts = setup["ts"]
        save_train_state(ts, str(tmp_path), "best")
        restored = restore_train_state(ts, str(tmp_path), "best")
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                     ts.params, restored.params)

    def test_torch_key_roundtrip(self, setup):
        """flax -> torch keys -> flax must be the identity."""
        from beso_tpu.train.checkpoint import (convert_torch_diffusion_gpt,
                                               export_torch_state_dict)

        params = setup["ts"].params
        sd = export_torch_state_dict(params, n_layers=2)
        back = convert_torch_diffusion_gpt(sd, n_layers=2)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
                     params, back)


class TestTorchParity:
    def test_forward_matches_independent_torch_impl(self, setup):
        """Cross-check the flax DiffusionGPT against an independent torch
        implementation of the documented architecture, sharing weights via
        the checkpoint converter."""
        import torch

        torch.manual_seed(0)
        params = setup["ts"].params
        from beso_tpu.train.checkpoint import export_torch_state_dict

        sd = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
              for k, v in export_torch_state_dict(params, n_layers=2).items()}

        B, t = 2, W
        rng = np.random.RandomState(0)
        s_np = rng.randn(B, t, OBS).astype(np.float32)
        a_np = rng.randn(B, t, ACT).astype(np.float32)
        g_np = rng.randn(B, G_LEN, OBS).astype(np.float32)
        sig_np = np.full((B,), 0.37, np.float32)

        # --- torch forward (independent re-implementation) ---
        def lin(name, x):
            return x @ sd[f"inner_model.{name}.weight"].T + sd[f"inner_model.{name}.bias"]

        def layer_norm(name, x):
            return torch.nn.functional.layer_norm(
                x, (x.shape[-1],), sd[f"inner_model.{name}.weight"],
                sd[f"inner_model.{name}.bias"])

        ts_t = torch.from_numpy(s_np)
        ta = torch.from_numpy(a_np)
        tg = torch.from_numpy(g_np)
        tsig = torch.from_numpy(sig_np)

        emb_t = lin("sigma_emb", (tsig.log() / 4).reshape(B, 1, 1))
        state_e = lin("tok_emb", ts_t)
        goal_e = lin("tok_emb", tg)
        act_e = lin("action_emb", ta)
        pos = sd["inner_model.pos_emb"]  # [1, seq, D]
        goal_x = goal_e + pos[:, :G_LEN]
        state_x = state_e + pos[:, G_LEN:G_LEN + t]
        act_x = act_e + pos[:, G_LEN:G_LEN + t]
        D = state_x.shape[-1]
        sa = torch.stack([state_x, act_x], dim=2).reshape(B, 2 * t, D)
        x = torch.cat([emb_t, goal_x, sa], dim=1)
        n_heads = 4
        T_tok = x.shape[1]
        mask = torch.tril(torch.ones(T_tok, T_tok)).bool()
        for i in range(2):
            h = layer_norm(f"blocks.{i}.ln1", x)
            q = lin(f"blocks.{i}.attn.query", h)
            k = lin(f"blocks.{i}.attn.key", h)
            v = lin(f"blocks.{i}.attn.value", h)
            hd = D // n_heads
            q = q.view(B, T_tok, n_heads, hd).transpose(1, 2)
            k = k.view(B, T_tok, n_heads, hd).transpose(1, 2)
            v = v.view(B, T_tok, n_heads, hd).transpose(1, 2)
            att = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
            att = att.masked_fill(~mask, float("-inf"))
            att = torch.softmax(att, dim=-1)
            y = (att @ v).transpose(1, 2).reshape(B, T_tok, D)
            x = x + lin(f"blocks.{i}.attn.proj", y)
            h = layer_norm(f"blocks.{i}.ln2", x)
            h = lin(f"blocks.{i}.mlp.0", h)
            h = torch.nn.functional.gelu(h)
            x = x + lin(f"blocks.{i}.mlp.2", h)
        x = layer_norm("ln_f", x)
        x = x[:, G_LEN + 1:, :].reshape(B, t, 2, D)
        torch_out = lin("action_pred", x[:, :, 1, :]).numpy()

        # --- flax forward ---
        model = setup["den"].inner_model
        flax_out = np.asarray(model.apply(
            params, jnp.asarray(s_np), jnp.asarray(a_np), jnp.asarray(g_np),
            jnp.asarray(sig_np)))

        np.testing.assert_allclose(flax_out, torch_out, atol=2e-5)
