"""Pallas kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.ops.flash_attention import flash_attention


def reference_attention(q, k, v, causal=True):
    B, H, T, hd = q.shape
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(hd).astype(q.dtype)
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


class TestFlashAttention:
    @pytest.mark.parametrize("T", [128, 256, 200])  # incl. non-multiple of 128
    def test_matches_reference_causal(self, T):
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        B, H, hd = 2, 2, 64
        q = jax.random.normal(kq, (B, H, T, hd))
        k = jax.random.normal(kk, (B, H, T, hd))
        v = jax.random.normal(kv, (B, H, T, hd))
        out = flash_attention(q, k, v, causal=True, interpret=True)
        want = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_matches_reference_full(self):
        key = jax.random.PRNGKey(1)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, 128, 64))
        k = jax.random.normal(kk, (1, 2, 128, 64))
        v = jax.random.normal(kv, (1, 2, 128, 64))
        out = flash_attention(q, k, v, causal=False, interpret=True)
        want = reference_attention(q, k, v, causal=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
