"""Karras-EDM denoiser wrapper + training loss.

Functional parity target: GCDenoiser
(`beso/agents/diffusion_agents/k_diffusion/score_wrappers.py:18-99`):

forward  D(x, sigma) = inner(s, x*c_in, g, sigma) * c_out + x * c_skip
loss     noised = a + n*sigma
         target = (a - c_skip*noised) / c_out
         MSE(inner(s, noised*c_in, g, sigma), target)
         (+ `pred_last_action_only` branch, score_wrappers.py:59-68)

Here the wrapper is a thin pure-function layer over any inner
`apply(params, states, actions, goals, sigma, ...) -> pred` callable; a small
`GCDenoiser` convenience class bundles it with a flax module.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from beso_tpu.core.precond import append_dims, edm_scalings

InnerApply = Callable[..., jnp.ndarray]


def denoise(
    inner_apply: InnerApply,
    params: Any,
    states: jnp.ndarray,
    actions: jnp.ndarray,
    goals: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_data: float = 0.5,
    **kwargs,
) -> jnp.ndarray:
    """EDM-preconditioned forward pass (score_wrappers.py:81-96)."""
    c_skip, c_out, c_in = [append_dims(c, actions.ndim)
                           for c in edm_scalings(sigma, sigma_data)]
    out = inner_apply(params, states, actions * c_in, goals, sigma, **kwargs)
    return out * c_out + actions * c_skip


def denoiser_loss(
    inner_apply: InnerApply,
    params: Any,
    states: jnp.ndarray,
    actions: jnp.ndarray,
    goals: jnp.ndarray,
    noise: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_data: float = 0.5,
    pred_last_action_only: bool = False,
    **kwargs,
) -> jnp.ndarray:
    """EDM training loss (score_wrappers.py:45-79). Returns a scalar."""
    if pred_last_action_only:
        # only noise the final action token (score_wrappers.py:59-64)
        noise = noise.at[:, :-1, :].set(0.0)
    noised = actions + noise * append_dims(sigma, actions.ndim)
    c_skip, c_out, c_in = [append_dims(c, actions.ndim)
                           for c in edm_scalings(sigma, sigma_data)]
    model_out = inner_apply(params, states, noised * c_in, goals, sigma, **kwargs)
    target = (actions - c_skip * noised) / c_out
    if pred_last_action_only:
        return jnp.mean((model_out[:, -1, :] - target[:, -1, :]) ** 2)
    return jnp.mean((model_out - target) ** 2)


class GCDenoiser:
    """Convenience bundle of a flax inner model + EDM preconditioning.

    Usage:
        model = DiffusionGPT(...)
        den = GCDenoiser(model, sigma_data=0.5)
        params = den.init(rng, states, actions, goals, sigma)
        pred = den.apply(params, states, actions, goals, sigma)
        loss = den.loss(params, states, actions, goals, noise, sigma, rngs=...)
    """

    def __init__(self, inner_model, sigma_data: float = 0.5):
        self.inner_model = inner_model
        self.sigma_data = sigma_data

    def init(self, rng, states, actions, goals, sigma):
        return self.inner_model.init(rng, states, actions, goals, sigma)

    def _inner_apply(self, params, states, actions, goals, sigma, **kwargs):
        return self.inner_model.apply(params, states, actions, goals, sigma, **kwargs)

    def apply(self, params, states, actions, goals, sigma, **kwargs):
        return denoise(self._inner_apply, params, states, actions, goals,
                       sigma, self.sigma_data, **kwargs)

    def loss(self, params, states, actions, goals, noise, sigma,
             pred_last_action_only: bool = False, **kwargs):
        return denoiser_loss(self._inner_apply, params, states, actions, goals,
                             noise, sigma, self.sigma_data,
                             pred_last_action_only, **kwargs)
