"""Training-time sigma sample densities.

Functional parity targets: the `rand_*` family of the reference
(`beso/agents/diffusion_agents/k_diffusion/utils.py:173-220`) and the
`make_sample_density` dispatch (`beso_agent.py:540-578`).

All densities are pure functions of an explicit `jax.random` key, so training
is reproducible by construction (the reference relied on global torch RNG).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

SampleDensity = Callable[[jax.Array, tuple], jnp.ndarray]


def rand_log_normal(key, shape, loc: float = 0.0, scale: float = 1.0, dtype=jnp.float32):
    """Lognormal sigma density (utils.py:173-175)."""
    return jnp.exp(jax.random.normal(key, shape, dtype) * scale + loc)


def rand_log_logistic(
    key,
    shape,
    loc: float = 0.0,
    scale: float = 1.0,
    min_value: float = 0.0,
    max_value: float = float("inf"),
    dtype=jnp.float32,
):
    """Optionally truncated log-logistic density (utils.py:178-185).

    BESO's default training density with loc=log(sigma_data), scale=0.5,
    truncated to [sigma_min, sigma_max] (beso_agent.py:551-556).
    Internally float64-like math is done in float32; the truncation CDF values
    are computed host-side in python floats for accuracy.
    """
    min_cdf = _sigmoid((math.log(min_value) - loc) / scale) if min_value > 0 else 0.0
    max_cdf = _sigmoid((math.log(max_value) - loc) / scale) if max_value != float("inf") else 1.0
    u = jax.random.uniform(key, shape, jnp.float32) * (max_cdf - min_cdf) + min_cdf
    return jnp.exp(_logit(u) * scale + loc).astype(dtype)


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def _logit(u: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(u) - jnp.log1p(-u)


def rand_log_uniform(key, shape, min_value: float, max_value: float, dtype=jnp.float32):
    """Log-uniform density (utils.py:188-192)."""
    lo, hi = math.log(min_value), math.log(max_value)
    return jnp.exp(jax.random.uniform(key, shape, dtype) * (hi - lo) + lo)


def rand_uniform(key, shape, min_value: float, max_value: float, dtype=jnp.float32):
    """Uniform density (utils.py:195-197)."""
    return jax.random.uniform(key, shape, dtype) * (max_value - min_value) + min_value


def rand_discrete(key, shape, values: Sequence[float], dtype=jnp.float32):
    """Uniform choice over a discrete sigma grid (utils.py:200-202)."""
    values = jnp.asarray(values, dtype=dtype)
    idx = jax.random.randint(key, shape, 0, values.shape[0])
    return values[idx]


def rand_v_diffusion(
    key,
    shape,
    sigma_data: float = 1.0,
    min_value: float = 0.0,
    max_value: float = float("inf"),
    dtype=jnp.float32,
):
    """Truncated v-diffusion timestep density (utils.py:205-210)."""
    min_cdf = math.atan(min_value / sigma_data) * 2 / math.pi
    max_cdf = math.atan(max_value / sigma_data) * 2 / math.pi if max_value != float("inf") else 1.0
    u = jax.random.uniform(key, shape, dtype) * (max_cdf - min_cdf) + min_cdf
    return jnp.tan(u * math.pi / 2) * sigma_data


def rand_split_log_normal(key, shape, loc: float, scale_1: float, scale_2: float, dtype=jnp.float32):
    """Split lognormal density (utils.py:213-220)."""
    k_n, k_u = jax.random.split(key)
    n = jnp.abs(jax.random.normal(k_n, shape, dtype))
    u = jax.random.uniform(k_u, shape, dtype)
    n_left = n * -scale_1 + loc
    n_right = n * scale_2 + loc
    ratio = scale_1 / (scale_1 + scale_2)
    return jnp.exp(jnp.where(u < ratio, n_left, n_right))


def make_sample_density(
    density_type: str,
    sigma_data: float,
    sigma_min: float,
    sigma_max: float,
    loc: float | None = None,
    scale: float | None = None,
    discrete_values: Sequence[float] | None = None,
) -> SampleDensity:
    """Build a `(key, shape) -> sigmas` callable.

    Mirrors BesoAgent.make_sample_density (beso_agent.py:540-578); the
    'lognormal' branch consumes the configured mean/std, the 'loglogistic'
    default pins loc=log(sigma_data), scale=0.5 truncated to the sigma range.
    """
    if density_type == "lognormal":
        return partial(rand_log_normal, loc=loc if loc is not None else 0.0,
                       scale=scale if scale is not None else 1.0)
    if density_type == "loglogistic":
        return partial(
            rand_log_logistic,
            loc=loc if loc is not None else math.log(sigma_data),
            scale=scale if scale is not None else 0.5,
            min_value=sigma_min,
            max_value=sigma_max,
        )
    if density_type == "loguniform":
        return partial(rand_log_uniform, min_value=sigma_min, max_value=sigma_max)
    if density_type == "uniform":
        return partial(rand_uniform, min_value=sigma_min, max_value=sigma_max)
    if density_type == "v-diffusion":
        return partial(rand_v_diffusion, sigma_data=sigma_data,
                       min_value=sigma_min, max_value=sigma_max)
    if density_type == "discrete":
        assert discrete_values is not None, "'discrete' density needs a sigma grid"
        return partial(rand_discrete, values=discrete_values)
    if density_type == "split-lognormal":
        return partial(rand_split_log_normal, loc=loc, scale_1=scale, scale_2=scale)
    raise ValueError(f"Unknown sample density type: {density_type!r}")
