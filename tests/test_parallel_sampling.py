"""Picard parallel-sampling tests: exactness at K=n, convergence below."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.core.schedules import get_sigmas_karras
from beso_tpu.models import DiffusionGPT, GCDenoiser
from beso_tpu.sampling.parallel import sample_picard
from beso_tpu.sampling.samplers import sample_ddim, sample_euler


def _linear_denoiser(key, d=4):
    """Analytic denoiser of a gaussian score model: D(x, sigma) =
    (mu * sigma^2 + x * s^2) / (sigma^2 + s^2) — exact for x ~ N(mu, s^2)."""
    mu = jax.random.normal(key, (d,))
    s2 = 0.25

    def dn(x, sigma):
        sig2 = (sigma ** 2).reshape((-1,) + (1,) * (x.ndim - 1))
        return (mu * sig2 + x * s2) / (sig2 + s2)

    return dn


@pytest.mark.parametrize("update,seq", [("ddim", sample_ddim),
                                        ("euler", sample_euler)])
def test_exact_at_full_iterations(update, seq):
    dn = _linear_denoiser(jax.random.PRNGKey(0))
    sigmas = get_sigmas_karras(10, 0.01, 1.0, rho=5.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4))
    ref = seq(dn, x, sigmas)
    out = sample_picard(dn, x, sigmas, update=update)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_monotone_convergence():
    """Error vs the sequential trajectory decreases with sweeps, and a
    handful of sweeps suffices on a long grid (the latency win)."""
    dn = _linear_denoiser(jax.random.PRNGKey(2))
    sigmas = get_sigmas_karras(32, 0.01, 1.0, rho=5.0)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 4))
    ref = np.asarray(sample_ddim(dn, x, sigmas))
    errs = []
    for K in (1, 4, 8, 16):
        out = np.asarray(sample_picard(dn, x, sigmas, update="ddim",
                                       n_iterations=K))
        errs.append(np.abs(out - ref).max())
    assert all(b <= a for a, b in zip(errs, errs[1:])), errs
    assert errs[-1] < 1e-5, f"16 sweeps on a 32-grid should be exact: {errs}"
    assert errs[2] < 0.05 * errs[0], f"8 sweeps should be close: {errs}"


def test_with_real_denoiser():
    """Runs against a real (tiny) GCDenoiser; conditioning tiled over the
    folded grid axis."""
    model = DiffusionGPT(state_dim=6, action_dim=2, embed_dim=24, n_layers=1,
                         n_heads=2, goal_seq_len=1, obs_seq_len=2)
    den = GCDenoiser(model, sigma_data=0.5)
    B, W = 3, 2
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    s = jax.random.normal(ks[0], (B, W, 6))
    g = jax.random.normal(ks[1], (B, 1, 6))
    params = den.init(ks[2], s, jnp.zeros((B, W, 2)), g, jnp.ones((B,)))
    sigmas = get_sigmas_karras(6, 0.05, 1.0, rho=5.0)

    def dn(x, sigma):
        reps = x.shape[0] // B
        return den.apply(params, jnp.tile(s, (reps, 1, 1)), x,
                         jnp.tile(g, (reps, 1, 1)), sigma)

    x = jax.random.normal(ks[3], (B, W, 2))
    ref = sample_ddim(dn, x, sigmas)
    out = sample_picard(dn, x, sigmas, update="ddim")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_rejects_unknown_update():
    dn = _linear_denoiser(jax.random.PRNGKey(5))
    with pytest.raises(ValueError, match="update rule"):
        sample_picard(dn, jnp.zeros((2, 4)), jnp.asarray([1.0, 0.5, 0.0]),
                      update="heun")


def test_picard_policy_rollout_matches_ddim():
    """sampler_type='picard' (exact iterations) reproduces the ddim rollout
    metrics through the full policy/rollout stack."""
    from beso_tpu.agents.policy import PolicyConfig
    from beso_tpu.data import synthetic_kitchen_data
    from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals
    from beso_tpu.models import fit_scaler
    from beso_tpu.rollout import rollout_kitchen

    model = DiffusionGPT(state_dim=30, action_dim=9, embed_dim=72, n_layers=2,
                         n_heads=6, goal_seq_len=2, obs_seq_len=4)
    den = GCDenoiser(model, sigma_data=0.5)
    params = den.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 30)),
                      jnp.zeros((2, 4, 9)), jnp.zeros((2, 2, 30)),
                      jnp.full((2,), 0.5))
    data = synthetic_kitchen_data(n_traj=4, t_max=30)
    scaler = fit_scaler(data.all_observations(), data.all_actions())
    goals, expected = multigoal_kitchen_goals(data, 2, 4, seed=0)
    goals, expected = jnp.asarray(goals), jnp.asarray(expected)

    def dn(s, a, g, sig):
        return den.apply(params, s, a, g, sig)

    key = jax.random.PRNGKey(3)
    base = dict(window_size=4, obs_dim=30, action_dim=9,
                num_sampling_steps=3, sigma_min=0.005)
    m_ddim = rollout_kitchen(dn, scaler, PolicyConfig(sampler_type="ddim",
                                                      **base),
                             goals, expected, key, n_steps=3)
    m_pic = rollout_kitchen(dn, scaler, PolicyConfig(sampler_type="picard",
                                                     **base),
                            goals, expected, key, n_steps=3)
    np.testing.assert_allclose(np.asarray(m_pic.rewards),
                               np.asarray(m_ddim.rewards), atol=1e-4)
