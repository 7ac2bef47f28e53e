"""Exponential moving average of parameters as a pure pytree transform.

Functional parity target: ExponentialMovingAverage
(`beso/networks/ema_helper/ema.py:10-105`), including the warmup
decay = min(decay, (1 + n) / (10 + n)) (ema.py:46-48), and EMAWarmup's
inverse-decay schedule (ema.py:108-141).

In JAX there is no store/copy_to/restore dance: the EMA lives as a second
parameter tree; evaluation simply uses `ema.params`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any            # shadow parameter tree
    num_updates: jnp.ndarray  # int32 scalar


def ema_init(params: Any) -> EmaState:
    return EmaState(params=jax.tree.map(jnp.asarray, params),
                    num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, new_params: Any, decay: float,
               use_num_updates: bool = True) -> EmaState:
    """shadow <- shadow - (1 - d) * (shadow - param), d warmup-capped."""
    n = state.num_updates + 1
    if use_num_updates:
        d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    else:
        d = jnp.asarray(decay)
    one_minus = 1.0 - d
    new_shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p), state.params, new_params)
    return EmaState(params=new_shadow, num_updates=n)


class EMAWarmup:
    """Inverse-decay EMA warmup schedule (ema.py:108-141).

    decay(epoch) = clip(1 - (1 + epoch / inv_gamma)^-power, min_value, max_value)
    """

    def __init__(self, inv_gamma: float = 1.0, power: float = 1.0,
                 min_value: float = 0.0, max_value: float = 1.0,
                 start_at: int = 0, last_epoch: int = 0):
        self.inv_gamma = inv_gamma
        self.power = power
        self.min_value = min_value
        self.max_value = max_value
        self.start_at = start_at
        self.last_epoch = last_epoch

    def get_value(self) -> float:
        epoch = max(0, self.last_epoch - self.start_at)
        value = 1 - (1 + epoch / self.inv_gamma) ** -self.power
        return 0.0 if epoch < 0 else min(self.max_value, max(self.min_value, value))

    def step(self) -> None:
        self.last_epoch += 1
