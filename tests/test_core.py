"""Golden-value tests for the diffusion core (schedules, densities, precond).

Expected values are computed with independent numpy implementations of the
published formulas (Karras et al. 2022; Nichol & Dhariwal 2021), so these
tests verify the jnp code against math, not against itself.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.core import (
    append_dims,
    append_zero,
    cosine_beta_schedule,
    edm_scalings,
    get_iddpm_sigmas,
    get_noise_schedule,
    get_sigmas_exponential,
    get_sigmas_karras,
    get_sigmas_linear,
    get_sigmas_polyexponential,
    get_sigmas_ve,
    get_sigmas_vp,
    make_sample_density,
    rand_log_logistic,
    rand_log_normal,
    rand_uniform,
)


class TestSchedules:
    def test_append_zero(self):
        out = append_zero(jnp.array([3.0, 2.0, 1.0]))
        np.testing.assert_allclose(out, [3.0, 2.0, 1.0, 0.0])

    def test_karras_golden(self):
        # rho-ramp formula evaluated by hand for n=3, sigma in [0.1, 1], rho=2
        # ramp = [0, .5, 1]; s = (1 + r*(sqrt(.1)-1))^2
        got = get_sigmas_karras(3, 0.1, 1.0, rho=2.0)
        s_mid = (1 + 0.5 * (math.sqrt(0.1) - 1)) ** 2
        np.testing.assert_allclose(got, [1.0, s_mid, 0.1, 0.0], rtol=1e-6)

    def test_exponential_is_geometric(self):
        got = np.asarray(get_sigmas_exponential(5, 0.01, 1.0))
        ratios = got[1:5] / got[:4]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)
        assert got[0] == pytest.approx(1.0)
        assert got[4] == pytest.approx(0.01)
        assert got[-1] == 0.0

    def test_linear(self):
        got = get_sigmas_linear(3, 0.1, 1.0)
        np.testing.assert_allclose(got, [1.0, 0.55, 0.1, 0.0], rtol=1e-6)

    def test_vp_golden(self):
        # sigma(t) = sqrt(exp(beta_d t^2/2 + beta_min t) - 1), t from 1 to eps
        got = np.asarray(get_sigmas_vp(2))
        t = np.array([1.0, 1e-3])
        want = np.sqrt(np.exp(19.9 * t ** 2 / 2 + 0.1 * t) - 1)
        np.testing.assert_allclose(got[:2], want, rtol=1e-5)

    def test_ve_endpoints(self):
        # quirk preserved from the reference (gc_sampling.py:61-68): the ramp
        # runs linspace(0, n+1, n) so the last sigma overshoots sigma_min:
        # sigma[-2] = sigma_max * (sigma_min/sigma_max)^((n+1)/(n-1))
        n = 4
        got = np.asarray(get_sigmas_ve(n, 0.02, 100.0))
        assert got[0] == pytest.approx(100.0, rel=1e-5)
        want_last = 100.0 * (0.02 / 100.0) ** ((n + 1) / (n - 1))
        assert got[n - 1] == pytest.approx(want_last, rel=1e-4)

    def test_polyexponential_rho1_equals_exponential(self):
        a = np.asarray(get_sigmas_polyexponential(6, 0.05, 2.0, rho=1.0))
        b = np.asarray(get_sigmas_exponential(6, 0.05, 2.0))
        np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_cosine_beta_monotone_flip(self):
        got = np.asarray(cosine_beta_schedule(10))
        assert got[-1] == 0.0
        # flipped: starts at the largest beta
        assert got[0] == got[:10].max()

    def test_iddpm_bounds(self):
        got = np.asarray(get_iddpm_sigmas(10, 0.02, 100.0))
        body = got[:-1]
        assert (body >= 0.02 - 1e-6).all() and (body <= 100.0 + 1e-4).all()
        assert (np.diff(body) <= 0).all()

    def test_dispatch(self):
        np.testing.assert_allclose(
            get_noise_schedule(3, 0.1, 1.0, schedule_type="exponential"),
            get_sigmas_exponential(3, 0.1, 1.0),
        )
        with pytest.raises(ValueError):
            get_noise_schedule(3, 0.1, 1.0, schedule_type="nope")

    def test_all_descending(self):
        for fn in [
            lambda: get_sigmas_karras(8, 0.01, 1.0, 7.0),
            lambda: get_sigmas_exponential(8, 0.01, 1.0),
            lambda: get_sigmas_linear(8, 0.01, 1.0),
            lambda: get_sigmas_ve(8),
            lambda: get_sigmas_vp(8),
            lambda: get_sigmas_polyexponential(8, 0.01, 1.0, 2.0),
        ]:
            s = np.asarray(fn())
            assert (np.diff(s) <= 1e-7).all(), fn


class TestDensities:
    def test_log_logistic_truncation(self):
        key = jax.random.PRNGKey(0)
        s = rand_log_logistic(key, (20000,), loc=math.log(0.5), scale=0.5,
                              min_value=0.005, max_value=1.0)
        s = np.asarray(s)
        assert s.min() >= 0.005 - 1e-6 and s.max() <= 1.0 + 1e-5
        # median of untruncated log-logistic is exp(loc)=0.5; truncation at
        # [0.005, 1] keeps most mass, so the median stays near 0.5
        assert 0.35 < np.median(s) < 0.65

    def test_log_normal_moments(self):
        key = jax.random.PRNGKey(1)
        s = np.asarray(rand_log_normal(key, (50000,), loc=-0.6, scale=1.6))
        np.testing.assert_allclose(np.log(s).mean(), -0.6, atol=0.05)
        np.testing.assert_allclose(np.log(s).std(), 1.6, atol=0.05)

    def test_uniform_bounds(self):
        s = np.asarray(rand_uniform(jax.random.PRNGKey(2), (1000,), 0.1, 0.9))
        assert s.min() >= 0.1 and s.max() <= 0.9

    def test_factory_dispatch(self):
        d = make_sample_density("loglogistic", sigma_data=0.5, sigma_min=0.005, sigma_max=1.0)
        s = np.asarray(d(jax.random.PRNGKey(3), (100,)))
        assert s.shape == (100,) and (s > 0).all()
        for name in ["lognormal", "loguniform", "uniform", "v-diffusion"]:
            d = make_sample_density(name, 0.5, 0.01, 1.0, loc=-0.6, scale=1.0)
            assert d(jax.random.PRNGKey(4), (8,)).shape == (8,)
        d = make_sample_density("discrete", 0.5, 0.01, 1.0, discrete_values=[0.1, 0.2])
        vals = np.asarray(d(jax.random.PRNGKey(5), (64,)))
        assert np.isclose(vals[:, None], [0.1, 0.2]).any(axis=1).all()
        with pytest.raises(ValueError):
            make_sample_density("nope", 0.5, 0.01, 1.0)


class TestPrecond:
    def test_edm_scalings_golden(self):
        sigma = jnp.array([0.0, 0.5, 1.0, 2.0])
        c_skip, c_out, c_in = edm_scalings(sigma, sigma_data=0.5)
        var = np.asarray(sigma) ** 2 + 0.25
        np.testing.assert_allclose(c_skip, 0.25 / var, rtol=1e-6)
        np.testing.assert_allclose(c_out, np.asarray(sigma) * 0.5 / np.sqrt(var), rtol=1e-6)
        np.testing.assert_allclose(c_in, 1 / np.sqrt(var), rtol=1e-6)

    def test_boundary_conditions(self):
        # at sigma=0 the denoiser must be the identity: c_skip=1, c_out=0
        c_skip, c_out, c_in = edm_scalings(jnp.array(0.0), sigma_data=0.5)
        assert c_skip == pytest.approx(1.0)
        assert c_out == pytest.approx(0.0)
        assert c_in == pytest.approx(2.0)

    def test_append_dims(self):
        x = jnp.ones((4,))
        assert append_dims(x, 3).shape == (4, 1, 1)
        with pytest.raises(ValueError):
            append_dims(jnp.ones((2, 2)), 1)
