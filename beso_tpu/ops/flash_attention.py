"""Causal flash attention as a Pallas TPU kernel.

BESO's shipped policies attend over ~11 tokens, where attention is cheapest
on the VPU (see models/gpt.py) — but action-chunking variants (longer action
horizons, the natural successor configuration) push the token count to
O(100-1000), where materializing [B, H, T, T] scores becomes HBM-bound. This
kernel computes online-softmax attention with the canonical flash recurrence,
streaming K/V blocks through VMEM: no TxT materialization, one HBM pass.

Layout: grid over (batch*heads, query blocks); K/V for the (batch, head) row
live in VMEM (fine up to T ~ 4k at hd <= 128). Causal masking is done with
block-index arithmetic. Use `interpret=True` for CPU tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_q: int, block_k: int,
                  sm_scale: float, causal: bool, seq_len: int):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale          # [block_q, hd]
    hd = q.shape[-1]

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)     # running max
    l = jnp.zeros((block_q, 1), jnp.float32)             # running denom
    acc = jnp.zeros((block_q, hd), jnp.float32)

    num_k_blocks = pl.cdiv(seq_len, block_k)
    # with causal masking, keys beyond this query block never contribute
    k_upper = (qi + 1) * block_q if causal else seq_len
    num_k_blocks = pl.cdiv(k_upper, block_k) if causal else num_k_blocks

    def body(kj, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
        if causal:
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_ids = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        # mask key padding beyond seq_len
        k_ids = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(k_ids < seq_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                             "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = True, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False) -> jnp.ndarray:
    """q, k, v: [B, H, T, hd] -> [B, H, T, hd], softmax(QK^T/sqrt(hd))V.

    Differentiable: the forward streams through the Pallas kernel; the
    backward is the standard attention VJP in XLA einsums (it materializes
    the TxT score matrix, so training memory is O(T^2) while inference
    stays O(T) — fine at action-chunking sizes; a Pallas backward kernel is
    the upgrade path for multi-thousand-token training).
    """
    return _flash_attention_vjp(q, k, v, causal, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_vjp(q, k, v, causal, block_q, block_k, interpret):
    return _flash_forward(q, k, v, causal, block_q, block_k, interpret)


def _flash_attention_fwd(q, k, v, causal, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, causal, block_q, block_k, interpret)
    return out, (q, k, v)


def _flash_attention_bwd(causal, block_q, block_k, interpret, res, g):
    q, k, v = res
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        T = q.shape[2]
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_vjp.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   causal: bool, block_q: int, block_k: int,
                   interpret: bool) -> jnp.ndarray:
    B, H, T, hd = q.shape
    sm_scale = 1.0 / math.sqrt(hd)
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    pad = (-T) % block_q
    if pad:
        zero = jnp.zeros((B, H, pad, hd), q.dtype)
        q = jnp.concatenate([q, zero], axis=2)
        k = jnp.concatenate([k, zero], axis=2)
        v = jnp.concatenate([v, zero], axis=2)
    Tp = T + pad
    qf = q.reshape(B * H, Tp, hd)
    kf = k.reshape(B * H, Tp, hd)
    vf = v.reshape(B * H, Tp, hd)

    kernel = functools.partial(_flash_kernel, block_q=block_q,
                               block_k=block_k, sm_scale=sm_scale,
                               causal=causal, seq_len=T)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, Tp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Tp, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Tp, hd), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, Tp, hd)[:, :, :T, :]
