"""Karras-EDM preconditioner math.

Functional parity target: GCDenoiser.get_scalings
(`beso/agents/diffusion_agents/k_diffusion/score_wrappers.py:40-43`).
"""

from __future__ import annotations

import jax.numpy as jnp


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Right-pad `x` with singleton dims until it has `target_ndim` dims
    (reference utils.py:165-170)."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def edm_scalings(sigma: jnp.ndarray, sigma_data: float = 1.0):
    """EDM preconditioning coefficients (score_wrappers.py:40-43).

    c_skip = sigma_d^2 / (sigma^2 + sigma_d^2)
    c_out  = sigma * sigma_d / sqrt(sigma^2 + sigma_d^2)
    c_in   = 1 / sqrt(sigma^2 + sigma_d^2)
    """
    var = sigma ** 2 + sigma_data ** 2
    c_skip = sigma_data ** 2 / var
    c_out = sigma * sigma_data / jnp.sqrt(var)
    c_in = 1.0 / jnp.sqrt(var)
    return c_skip, c_out, c_in
