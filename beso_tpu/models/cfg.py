"""Classifier-free guidance sampling wrappers.

Functional parity target: ClassifierFreeSampleModel
(`beso/agents/diffusion_agents/k_diffusion/classifier_free_sampler.py:12-52`):

    out = out_uncond + lambda * (out_cond - out_uncond)
    lambda == 1 -> conditional only; lambda == 0 -> unconditional only.

TPU-first deviation: instead of two sequential model calls the cond/uncond
passes are stacked along the batch axis into ONE forward (2x batch), halving
launch/overhead and letting the MXU see a bigger matmul. The reference's
goal-zeroing (`uncond=True` inside DiffusionGPT) is realized by zeroing the
goal rows of the stacked batch.

Also provides classifier *guided* sampling (classifier_free_sampler.py:56-90):
    out = pred + lambda * grad_a Q(s, pred, g) * sigma^2
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from beso_tpu.core.precond import append_dims

DenoiseFn = Callable[..., jnp.ndarray]


def cfg_denoise_fn(denoise: DenoiseFn, cond_lambda: float) -> DenoiseFn:
    """Wrap `denoise(states, actions, goals, sigma) -> pred` with CFG.

    The returned function has the same signature. For cond_lambda == 1 / 0 it
    reduces to a single conditional / unconditional call (reference behavior,
    classifier_free_sampler.py:30-41).
    """
    if cond_lambda == 1.0:
        return denoise

    if cond_lambda == 0.0:
        def uncond_fn(states, actions, goals, sigma, **kw):
            return denoise(states, actions, jnp.zeros_like(goals), sigma, **kw)
        return uncond_fn

    def guided_fn(states, actions, goals, sigma, **kw):
        B = actions.shape[0]
        states2 = jnp.concatenate([states, states], axis=0)
        actions2 = jnp.concatenate([actions, actions], axis=0)
        goals2 = jnp.concatenate([goals, jnp.zeros_like(goals)], axis=0)
        sigma2 = jnp.concatenate([sigma, sigma], axis=0)
        out = denoise(states2, actions2, goals2, sigma2, **kw)
        out_cond, out_uncond = out[:B], out[B:]
        return out_uncond + cond_lambda * (out_cond - out_uncond)

    return guided_fn


def classifier_guided_denoise_fn(
    denoise: DenoiseFn,
    guide: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    cond_lambda: float = 2.0,
) -> DenoiseFn:
    """Classifier-guided variant (classifier_free_sampler.py:78-87).

    `guide(states, actions, goals)` returns a scalar-per-batch value Q whose
    action-gradient steers the prediction.
    """

    def guided_fn(states, actions, goals, sigma, **kw):
        pred = denoise(states, actions, goals, sigma, **kw)
        grads = jax.grad(lambda a: jnp.sum(guide(states, a, goals)))(pred)
        return pred + cond_lambda * grads * append_dims(sigma ** 2, actions.ndim)

    return guided_fn
