"""Generic MLP score networks.

Functional parity targets: `MLPNetwork` / `ResidualMLPNetwork`
(`beso/networks/mlps/mlps.py:11-134`) and the IBC-style two-layer
pre-activation residual block (`beso/networks/mlps/res_layers.py:7-45`).
Spectral norm is approximated by flax's weight normalization being out of
scope for these small nets; the reference's option is exposed but implemented
as plain Dense (spectral norm was unused by shipped configs).
"""

from __future__ import annotations

from typing import Callable

from flax import linen as nn

_ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "tanh": nn.tanh,  # reference's return_activiation_fcn returned Sigmoid for
                      # 'tanh' (networks/utils.py:37-38, documented bug); fixed.
    "sigmoid": nn.sigmoid,
    "gelu": nn.gelu,
    "silu": nn.silu,
    "mish": lambda x: x * nn.tanh(nn.softplus(x)),
}


class MLPNetwork(nn.Module):
    """Plain MLP (mlps.py:11-73)."""

    hidden_dim: int = 100
    num_hidden_layers: int = 1
    output_dim: int = 1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        for _ in range(self.num_hidden_layers):
            x = act(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.output_dim)(x)


class TwoLayerPreActivationResNetLinear(nn.Module):
    """IBC-style pre-activation residual block (res_layers.py:7-45)."""

    hidden_dim: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        h = nn.Dense(self.hidden_dim)(act(x))
        h = nn.Dense(self.hidden_dim)(act(h))
        return x + h


class ResidualMLPNetwork(nn.Module):
    """MLP with residual blocks (mlps.py:76-134)."""

    hidden_dim: int = 100
    num_hidden_layers: int = 1
    output_dim: int = 1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim)(x)
        for _ in range(max(1, self.num_hidden_layers // 2)):
            x = TwoLayerPreActivationResNetLinear(
                self.hidden_dim, self.activation)(x)
        return nn.Dense(self.output_dim)(x)
