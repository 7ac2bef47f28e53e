"""Time/sigma embedding modules.

Functional parity target: the embedding factory + classes of
`beso/agents/diffusion_agents/k_diffusion/utils.py:8-134`:
{'GaussianFourier', 'Sinusoidal', 'FourierFeatures', 'Linear', 'MLP'} —
the shipped configs use 'Linear' (configs/agents/model/diffusion_gpt.yaml:23),
which DiffusionGPT inlines; the others are provided for config parity.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


class GaussianFourierProjection(nn.Module):
    """Fixed random Fourier features (utils.py:26-36)."""

    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, x):  # x: [B] or [B, 1]
        # fixed (non-trainable) random weights like the reference's
        # requires_grad=False parameter (utils.py:32)
        W = self.variable(
            "constants", "W",
            lambda: nn.initializers.normal(self.scale)(
                self.make_rng("params"), (self.embed_dim // 2,))).value
        x = x.reshape(x.shape[0], 1)
        proj = x * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class GaussianFourierEmbedding(nn.Module):
    """Fourier features -> 2-layer Mish MLP (utils.py:69-82)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t):
        h = GaussianFourierProjection(self.embed_dim)(t)
        h = nn.Dense(2 * self.embed_dim)(h)
        h = h * nn.tanh(nn.softplus(h))  # mish
        return nn.Dense(self.embed_dim)(h)


class FourierFeatures(nn.Module):
    """cos/sin of a fixed random projection (utils.py:39-51)."""

    embed_dim: int
    std: float = 1.0

    @nn.compact
    def __call__(self, t):
        W = self.param("weight", nn.initializers.normal(self.std),
                       (self.embed_dim // 2, 1))
        t = t.reshape(t.shape[0], 1)
        f = 2 * jnp.pi * t @ W.T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class SinusoidalPosEmb(nn.Module):
    """Transformer-style sinusoidal embedding (utils.py:122-134)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = jnp.exp(jnp.arange(half) * -emb)
        emb = x.reshape(-1, 1) * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class SinusoidalPosEmbedding(nn.Module):
    """Sinusoidal -> 2-layer Mish MLP (utils.py:85-98)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t):
        h = SinusoidalPosEmb(self.embed_dim)(t)
        h = nn.Dense(2 * self.embed_dim)(h)
        h = h * nn.tanh(nn.softplus(h))
        return nn.Dense(self.embed_dim)(h)


class MLPTimeEmbedding(nn.Module):
    """Linear -> SiLU -> Linear (utils.py:54-66)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t):
        h = nn.Dense(2 * self.embed_dim)(t.reshape(-1, 1))
        h = nn.silu(h)
        return nn.Dense(self.embed_dim)(h)


class LinearTimeEmbedding(nn.Module):
    """Linear(1, D) — the shipped default (utils.py:18-19)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t):
        return nn.Dense(self.embed_dim)(t.reshape(-1, 1))


def make_time_embedding(embedding_type: str, embed_dim: int) -> nn.Module:
    """Factory mirroring return_time_sigma_embedding_model (utils.py:8-23)."""
    table = {
        "GaussianFourier": GaussianFourierEmbedding,
        "Sinusoidal": SinusoidalPosEmbedding,
        "FourierFeatures": FourierFeatures,
        "Linear": LinearTimeEmbedding,
        "MLP": MLPTimeEmbedding,
    }
    try:
        return table[embedding_type](embed_dim)
    except KeyError:
        raise ValueError(
            "Embedding not avaiable, please chose an existing one!") from None
