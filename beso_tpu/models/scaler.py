"""Data scalers as frozen pytrees (jit-safe, device-resident).

Functional parity targets: `Scaler` and `MinMaxScaler`
(`beso/networks/scaler/scaler_class.py:11-338`):

* Scaler: standardize inputs and outputs by dataset mean/std; bounds arrays
  for action clipping (scaled bounds when scale_data, raw min/max otherwise).
* MinMaxScaler: outputs to [-1, 1] min-max, inputs standardized
  (scaler_class.py:214-233, 266-280); used by the block-push configs.
* clip_action clamps to 1.1x the action bounds (scaler_class.py:161-166).
* special input cases (scaler_class.py:79-92): a 7-dim onehot kitchen goal
  passes through unscaled; a 4-dim block-push goal is scaled with the
  x/y statistics of the two block position pairs. NOTE: the reference's
  scale_block_push_goal multiplies by x (`out = x * (x - mean)/std`,
  scaler_class.py:154-157) which is a documented bug (SURVEY.md 2.4) on a
  path unused by shipped configs; we implement the intended (x - mean)/std.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

_EPS = 1e-12


@struct.dataclass
class Scaler:
    kind: str = struct.field(pytree_node=False)  # 'standard' | 'minmax'
    scale_data: bool = struct.field(pytree_node=False)
    x_mean: jnp.ndarray
    x_std: jnp.ndarray
    y_mean: jnp.ndarray
    y_std: jnp.ndarray
    x_min: jnp.ndarray
    x_max: jnp.ndarray
    y_min: jnp.ndarray
    y_max: jnp.ndarray
    x_bounds: jnp.ndarray  # [2, x_dim]
    y_bounds: jnp.ndarray  # [2, y_dim]

    # -- input ------------------------------------------------------------
    def scale_input(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.scale_data:
            return x
        x_dim = self.x_mean.shape[-1]
        if x.shape[-1] == 7 and x_dim == 30:
            return x  # kitchen onehot goal passthrough (scaler_class.py:84-85)
        if x.shape[-1] == 4 and x_dim == 16:
            mean = self.x_mean[jnp.array([0, 1, 3, 4])]
            std = self.x_std[jnp.array([0, 1, 3, 4])]
            return (x - mean) / (std + _EPS)
        return (x - self.x_mean) / (self.x_std + _EPS)

    def inverse_scale_input(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.scale_data:
            return x
        if self.kind == "minmax":
            return (x + 1.0) / 2.0 * (self.x_max - self.x_min) + self.x_min
        return x * (self.x_std + _EPS) + self.x_mean

    # -- output -----------------------------------------------------------
    def scale_output(self, y: jnp.ndarray) -> jnp.ndarray:
        if not self.scale_data:
            return y
        if self.kind == "minmax":
            return (y - self.y_min) / (self.y_max - self.y_min) * 2.0 - 1.0
        return (y - self.y_mean) / (self.y_std + _EPS)

    def inverse_scale_output(self, y: jnp.ndarray) -> jnp.ndarray:
        if not self.scale_data:
            return y
        if self.kind == "minmax":
            return (y + 1.0) / 2.0 * (self.y_max - self.y_min) + self.y_min
        return y * (self.y_std + _EPS) + self.y_mean

    def clip_action(self, y: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(y, self.y_bounds[0] * 1.1, self.y_bounds[1] * 1.1)


def _flatten(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=np.float64)
    if a.ndim == 3:
        a = a.reshape(-1, a.shape[-1])
    return a


def fit_scaler(x_data, y_data, scale_data: bool = True) -> Scaler:
    """Standardizing scaler fit (scaler_class.py:15-67)."""
    x, y = _flatten(x_data), _flatten(y_data)
    x_mean, x_std = x.mean(0), x.std(0)
    y_mean, y_std = y.mean(0), y.std(0)
    if scale_data:
        y_bounds = np.stack([(y.min(0) - y_mean) / (y_std + _EPS),
                             (y.max(0) - y_mean) / (y_std + _EPS)])
        x_bounds = np.stack([(x.min(0) - x_mean) / (x_std + _EPS),
                             (x.max(0) - x_mean) / (x_std + _EPS)])
    else:
        y_bounds = np.stack([y.min(0), y.max(0)])
        x_bounds = np.stack([x.min(0), x.max(0)])
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return Scaler(
        kind="standard", scale_data=scale_data,
        x_mean=f32(x_mean), x_std=f32(x_std), y_mean=f32(y_mean), y_std=f32(y_std),
        x_min=f32(x.min(0)), x_max=f32(x.max(0)),
        y_min=f32(y.min(0)), y_max=f32(y.max(0)),
        x_bounds=f32(x_bounds), y_bounds=f32(y_bounds),
    )


def fit_minmax_scaler(x_data, y_data, scale_data: bool = True) -> Scaler:
    """Min-max output scaler fit (scaler_class.py:169-239).

    Outputs map to [-1, 1]; inputs standardize; the action bounds become
    exactly +-1 when scaling (scaler_class.py:215-216), while input bounds
    stay standardized (scaler_class.py:219-220).
    """
    x, y = _flatten(x_data), _flatten(y_data)
    x_mean, x_std = x.mean(0), x.std(0)
    if scale_data:
        y_bounds = np.stack([-np.ones(y.shape[-1]), np.ones(y.shape[-1])])
        x_bounds = np.stack([(x.min(0) - x_mean) / (x_std + _EPS),
                             (x.max(0) - x_mean) / (x_std + _EPS)])
    else:
        y_bounds = np.stack([y.min(0), y.max(0)])
        x_bounds = np.stack([x.min(0), x.max(0)])
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return Scaler(
        kind="minmax", scale_data=scale_data,
        x_mean=f32(x_mean), x_std=f32(x_std),
        y_mean=f32(y.mean(0)), y_std=f32(y.std(0)),
        x_min=f32(x.min(0)), x_max=f32(x.max(0)),
        y_min=f32(y.min(0)), y_max=f32(y.max(0)),
        x_bounds=f32(x_bounds), y_bounds=f32(y_bounds),
    )
