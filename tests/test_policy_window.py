"""Differential test: fixed-shape window buffers vs a python-deque replica.

`policy_predict` replaces the reference BesoAgent's obs/action deques
(beso_agent.py:97-100, 296-388) with fixed-shape left-aligned buffers carried
through lax.scan. This test steps a literal deque implementation of the
reference's predict context handling against `policy_predict` for 20 steps
with window_size=4 — covering the fill phase (t < W) and steady state — and
asserts the model sees identical inputs each step (transitively, via a
causal mock denoiser) and produces identical actions.
"""

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.agents.policy import PolicyConfig, policy_predict, policy_reset
from beso_tpu.core.schedules import get_noise_schedule
from beso_tpu.models.scaler import fit_scaler

W, OBS, ACT, G, B = 4, 6, 3, 2, 2
SIGMA_MAX, SIGMA_MIN, N_STEPS = 1.0, 0.005, 3


def _causal_denoise_np(states, actions, goal, sigma):
    """Causal mock denoiser D(x, sigma): token i depends only on tokens <= i
    (cumulative state mean), mirroring the transformer's causal mask."""
    states, actions, goal = (np.asarray(a, np.float64) for a in (states, actions, goal))
    sigma = np.asarray(sigma, np.float64)
    s = sigma.reshape(-1, 1, 1)
    T = states.shape[1]
    cum = np.cumsum(states, axis=1) / np.arange(1, T + 1).reshape(1, -1, 1)
    return (actions / (1.0 + s ** 2)
            + 0.1 * cum.mean(-1, keepdims=True)
            + 0.05 * goal.mean(axis=(1, 2)).reshape(-1, 1, 1))


def _causal_denoise_jax(states, actions, goals, sigma, **kw):
    s = sigma.reshape(-1, 1, 1)
    T = states.shape[1]
    cum = jnp.cumsum(states, axis=1) / jnp.arange(1, T + 1).reshape(1, -1, 1)
    return (actions / (1.0 + s ** 2)
            + 0.1 * jnp.mean(cum, -1, keepdims=True)
            + 0.05 * jnp.mean(goals, axis=(1, 2)).reshape(-1, 1, 1))


def _ddim_np(denoise, x, states, goal, sigmas):
    """Reference sample_ddim update rule (gc_sampling.py:895-924), numpy."""
    x = np.asarray(x, np.float64).copy()
    for i in range(len(sigmas) - 1):
        sig, sig_next = float(sigmas[i]), float(sigmas[i + 1])
        den = denoise(states, x, goal, np.full((x.shape[0],), sig))
        t, t_next = -np.log(sig), (-np.log(sig_next) if sig_next > 0 else np.inf)
        h = t_next - t
        ratio = sig_next / sig
        x = ratio * x - np.expm1(-h) * den
    return x


class DequeReplica:
    """Literal replica of BesoAgent.predict's context handling
    (beso_agent.py:291-294, 322-327, 352-362, 373-387)."""

    def __init__(self, scaler):
        self.scaler = scaler
        self.obs_context = deque(maxlen=W)
        self.action_context = deque(maxlen=W - 1)
        self.sigmas = get_noise_schedule(N_STEPS, SIGMA_MIN, SIGMA_MAX,
                                         5.0, "exponential")

    def predict(self, obs, goal, noise):
        obs_s = np.asarray(self.scaler.scale_input(jnp.asarray(obs)))
        goal_s = np.asarray(self.scaler.scale_input(jnp.asarray(goal)))
        self.obs_context.append(obs_s)
        input_state = np.stack(tuple(self.obs_context), axis=1)  # [B, t, obs]

        x = noise[:, None, :]                                    # [B, 1, act]
        if len(self.action_context) > 0:
            prev = np.concatenate(tuple(self.action_context), axis=1)
            x = np.concatenate([prev, x], axis=1)                # [B, k+1, act]

        x0 = _ddim_np(_causal_denoise_np, x, input_state, goal_s, self.sigmas)
        x0 = x0[:, -1, :]                                        # last action
        x0 = np.asarray(self.scaler.clip_action(jnp.asarray(x0)))
        action = np.asarray(self.scaler.inverse_scale_output(jnp.asarray(x0)))
        self.action_context.append(x0[:, None, :])
        return action, input_state, x.shape[1]


def test_policy_window_matches_deque_replica():
    rng = np.random.default_rng(0)
    fit_x = rng.normal(0.3, 1.7, size=(500, OBS)).astype(np.float32)
    fit_y = rng.normal(-0.2, 0.8, size=(500, ACT)).astype(np.float32)
    scaler = fit_scaler(fit_x, fit_y)

    cfg = PolicyConfig(window_size=W, obs_dim=OBS, action_dim=ACT,
                       sampler_type="ddim", num_sampling_steps=N_STEPS,
                       sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX, rho=5.0,
                       noise_scheduler="exponential")

    state = policy_reset(B, cfg)
    replica = DequeReplica(scaler)
    goal = rng.normal(size=(B, G, OBS)).astype(np.float32)
    base_key = jax.random.PRNGKey(42)

    for t in range(20):
        obs = rng.normal(size=(B, OBS)).astype(np.float32)
        key_t = jax.random.fold_in(base_key, t)

        action, state = policy_predict(_causal_denoise_jax, scaler, state,
                                       jnp.asarray(obs), jnp.asarray(goal),
                                       key_t, cfg)

        # the exact noise policy_predict drew for the newest token
        noise = np.asarray(jax.random.normal(key_t, (B, ACT)) * SIGMA_MAX)
        ref_action, ref_input_state, ref_ctx_len = replica.predict(obs, goal, noise)

        # (a) the buffer prefix IS the deque stack (model-input equality)
        t_eff = min(t + 1, W)
        assert ref_ctx_len == t_eff  # action tokens track obs tokens
        np.testing.assert_allclose(
            np.asarray(state.obs_buf)[:, :t_eff], ref_input_state,
            rtol=1e-6, atol=1e-7, err_msg=f"obs context step {t}")

        # (b) identical predicted action through the full fill + roll cycle
        np.testing.assert_allclose(np.asarray(action), ref_action,
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"action step {t}")


def test_policy_reset_clears_context():
    """reset() parity (beso_agent.py:291-294): after reset, predictions match
    a fresh run bit-for-bit."""
    rng = np.random.default_rng(1)
    scaler = fit_scaler(rng.normal(size=(200, OBS)).astype(np.float32),
                        rng.normal(size=(200, ACT)).astype(np.float32))
    cfg = PolicyConfig(window_size=W, obs_dim=OBS, action_dim=ACT)
    goal = jnp.asarray(rng.normal(size=(B, G, OBS)).astype(np.float32))
    obs_seq = [jnp.asarray(rng.normal(size=(B, OBS)).astype(np.float32))
               for _ in range(3)]
    key = jax.random.PRNGKey(7)

    def run(state):
        outs = []
        for i, o in enumerate(obs_seq):
            a, state = policy_predict(_causal_denoise_jax, scaler, state, o,
                                      goal, jax.random.fold_in(key, i), cfg)
            outs.append(np.asarray(a))
        return outs, state

    outs1, state = run(policy_reset(B, cfg))
    outs2, _ = run(policy_reset(B, cfg))  # fresh reset -> identical
    for a, b in zip(outs1, outs2):
        np.testing.assert_array_equal(a, b)
