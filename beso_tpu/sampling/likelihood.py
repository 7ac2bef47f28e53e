"""Exact log-likelihood of actions under the probability-flow ODE.

Functional parity target: `log_likelihood` (gc_sampling.py:471-495), which
integrates the instantaneous change-of-variables formula with a Hutchinson
trace estimator over torchdiffeq's adaptive dopri5.

TPU-first deviation: the divergence is computed with `jax.jvp` (exact
directional derivative, no autograd graph juggling) and the ODE is integrated
with fixed-step RK4 over a log-spaced sigma grid inside `lax.scan` — static
shapes, one compiled program. Accuracy is controlled by `n_steps` instead of
atol/rtol (this is a debug/analysis feature, reference default unused by
shipped configs).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def log_likelihood(denoise_fn: DenoiseFn, action, sigma_min: float,
                   sigma_max: float, key=None, n_steps: int = 64):
    """Returns (log_likelihood[B], info). Integrates from sigma_min to
    sigma_max (data -> prior), like the reference (gc_sampling.py:490-495)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    B = action.shape[0]
    v = (jax.random.randint(key, action.shape, 0, 2) * 2 - 1).astype(action.dtype)

    def ode_fn(x, sigma):
        s_in = jnp.ones((B,), jnp.float32)

        def drift(y):
            denoised = denoise_fn(y, sigma * s_in)
            return (y - denoised) / sigma

        d, jvp_v = jax.jvp(drift, (x,), (v,))
        d_ll = jnp.sum((v * jvp_v).reshape(B, -1), axis=1)
        return d, d_ll

    sigmas = jnp.asarray(
        np.exp(np.linspace(np.log(sigma_min), np.log(sigma_max), n_steps + 1)),
        dtype=jnp.float32)

    def rk4_step(carry, inp):
        x, ll = carry
        s0, s1 = inp
        h = s1 - s0
        k1, l1 = ode_fn(x, s0)
        k2, l2 = ode_fn(x + 0.5 * h * k1, s0 + 0.5 * h)
        k3, l3 = ode_fn(x + 0.5 * h * k2, s0 + 0.5 * h)
        k4, l4 = ode_fn(x + h * k3, s1)
        x = x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        ll = ll + (h / 6.0) * (l1 + 2 * l2 + 2 * l3 + l4)
        return (x, ll), None

    (latent, delta_ll), _ = jax.lax.scan(
        rk4_step, (action, jnp.zeros((B,))), (sigmas[:-1], sigmas[1:]))

    # prior: N(0, sigma_max^2) per dimension
    D = int(np.prod(action.shape[1:]))
    ll_prior = jnp.sum(
        -0.5 * (latent.reshape(B, -1) / sigma_max) ** 2, axis=1
    ) - 0.5 * D * jnp.log(2 * jnp.pi * sigma_max ** 2)
    return ll_prior + delta_ll, {"fevals": 4 * n_steps}
