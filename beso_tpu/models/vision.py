"""Vision pooling modules for image-based policies.

Functional parity targets (`beso/networks/vision_modules/vision_modules.py:7-117`):
CoordConv, SpatialSoftArgmax, GlobalMaxPool2d, GlobalAvgPool2d.
Layouts are NHWC (TPU-native) instead of torch's NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class CoordConv(nn.Module):
    """Append normalized (x, y) coordinate channels to an NHWC image."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ys = jnp.linspace(-1.0, 1.0, H)
        xs = jnp.linspace(-1.0, 1.0, W)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        coords = jnp.broadcast_to(
            jnp.stack([xx, yy], axis=-1)[None], (B, H, W, 2)).astype(x.dtype)
        return jnp.concatenate([x, coords], axis=-1)


class SpatialSoftArgmax(nn.Module):
    """Per-channel softmax-weighted expected (x, y) position.

    Returns [B, C, 2] of normalized coordinates in [-1, 1].
    """

    temperature: float = 1.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        logits = x.reshape(B, H * W, C) / self.temperature
        attn = jax.nn.softmax(logits, axis=1).reshape(B, H, W, C)
        ys = jnp.linspace(-1.0, 1.0, H)
        xs = jnp.linspace(-1.0, 1.0, W)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        ex = jnp.einsum("bhwc,hw->bc", attn, xx)
        ey = jnp.einsum("bhwc,hw->bc", attn, yy)
        return jnp.stack([ex, ey], axis=-1)


class GlobalMaxPool2d(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.max(x, axis=(1, 2))


class GlobalAvgPool2d(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.mean(x, axis=(1, 2))
