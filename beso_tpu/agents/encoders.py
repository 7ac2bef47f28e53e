"""Input encoders: batch dict -> (state, goal) tensors.

Functional parity targets: `BaseEncoder`
(`beso/agents/input_encoders/base_encoder.py:6-17`) and `NoEncoder`
(`beso/agents/input_encoders/obs_encoder.py:11-22`) — the trivial encoder
pulling 'observation'/'goal_observation' from the batch. Vision encoders
compose the modules in beso_tpu.models.vision.
"""

from __future__ import annotations

import abc
from typing import Tuple

import jax.numpy as jnp


class BaseEncoder(abc.ABC):
    @abc.abstractmethod
    def __call__(self, batch: dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ...


class NoEncoder(BaseEncoder):
    """Identity encoder (obs_encoder.py:11-22)."""

    def __init__(self, obs_modality: str = "observation",
                 goal_modality: str = "goal_observation"):
        self.obs_modality = obs_modality
        self.goal_modality = goal_modality

    def __call__(self, batch: dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return batch[self.obs_modality], batch[self.goal_modality]
