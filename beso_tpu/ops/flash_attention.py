"""Causal flash attention as Pallas TPU kernels (forward + backward).

BESO's shipped policies attend over ~11 tokens, where attention is cheapest
on the VPU (see models/gpt.py) — but action-chunking variants (longer action
horizons, the natural successor configuration) push the token count to
O(100-1000), where materializing [B, H, T, T] scores becomes HBM-bound. This
module computes online-softmax attention with the canonical flash
recurrence, streaming K/V blocks through VMEM: no TxT materialization, one
HBM pass — in BOTH directions. The forward stores the per-row logsumexp;
the backward recomputes probabilities blockwise (FlashAttention-2 recipe:
one kernel accumulating dQ over key blocks, one accumulating dK/dV over
query blocks), so training memory is O(T) like inference.

Layout: grid over (batch*heads, query/key blocks); K/V for the (batch,
head) row live in VMEM (fine up to T ~ 4k at hd <= 128). Causal masking is
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_q: int,
                  block_k: int, sm_scale: float, causal: bool, seq_len: int):
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
    # logsumexp of the SCALED scores, for the backward recomputation
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, block_q: int, block_k: int, sm_scale: float,
                   causal: bool, seq_len: int):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale          # [bq, hd]
    do = do_ref[0].astype(jnp.float32)                   # [bq, hd]
    lse = lse_ref[0]                                     # [bq, 1]
    delta = delta_ref[0]                                 # [bq, 1]
    hd = q.shape[-1]

    k_upper = (qi + 1) * block_q if causal else seq_len
    num_k_blocks = pl.cdiv(k_upper, block_k)

    def body(kj, dq):
        k = k_ref[0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        k_ids = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        s = jnp.where(k_ids < seq_len, s, NEG_INF)
        p = jnp.exp(s - lse)                             # [bq, bk]
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_k_blocks, body,
                           jnp.zeros((block_q, hd), jnp.float32))
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, block_k: int,
                    sm_scale: float, causal: bool, seq_len: int):
    kj = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)                     # [bk, hd]
    v = v_ref[0].astype(jnp.float32)                     # [bk, hd]
    hd = k.shape[-1]
    Tp = q_ref.shape[1]
    num_q_blocks = Tp // block_q
    q_lower = (kj * block_k) // block_q if causal else 0

    def body(qi, carry):
        dk, dv = carry
        q = (q_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
             * sm_scale)
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qi * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(qi * block_q, block_q), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
        q_ids = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_ids = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        # mask p (not s): padded query rows carry lse ~ -inf, for which
        # exp(s - lse) would be 1 instead of 0 and pollute dK/dV
        mask = (k_ids < seq_len) & (q_ids < seq_len)
        if causal:
            mask = mask & (q_ids >= k_ids)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        q_lower, num_q_blocks, body,
        (jnp.zeros((block_k, hd), jnp.float32),
         jnp.zeros((block_k, hd), jnp.float32)))
    # dk accumulated against scaled q; one more sm_scale gives d(raw k)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                             "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = True, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False) -> jnp.ndarray:
    """q, k, v: [B, H, T, hd] -> [B, H, T, hd], softmax(QK^T/sqrt(hd))V.

    Differentiable with O(T) memory in both directions: forward and
    backward both run as Pallas kernels (FlashAttention-2 backward with
    blockwise probability recomputation from the saved logsumexp).
    """
    return _flash_attention_vjp(q, k, v, causal, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_vjp(q, k, v, causal, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, causal, block_q, block_k, interpret)
    return out


def _flash_attention_fwd(q, k, v, causal, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, causal, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_attention_bwd(causal, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    B, H, T, hd = q.shape
    sm_scale = 1.0 / math.sqrt(hd)
    block_q = min(block_q, _round_up(T, 8))
    block_k = min(block_k, _round_up(T, 8))
    # pad to a multiple of BOTH block sizes, same as _flash_forward: for
    # non-power-of-two combos lcm != max and Tp must divide the dq grid
    # cleanly while keeping the causal k-loop inside the refs (ADVICE r3)
    pad = (-T) % (block_q * block_k // math.gcd(block_q, block_k))
    if pad:
        zero = jnp.zeros((B, H, pad, hd), q.dtype)
        q = jnp.concatenate([q, zero], axis=2)
        k = jnp.concatenate([k, zero], axis=2)
        v = jnp.concatenate([v, zero], axis=2)
        g = jnp.concatenate([g.astype(q.dtype), zero], axis=2)
        out = jnp.concatenate([out, zero], axis=2)
        lse = jnp.concatenate(
            [lse, jnp.zeros((B, H, pad, 1), lse.dtype)], axis=2)
    else:
        g = g.astype(q.dtype)
    Tp = T + pad
    BH = B * H
    qf = q.reshape(BH, Tp, hd)
    kf = k.reshape(BH, Tp, hd)
    vf = v.reshape(BH, Tp, hd)
    gf = g.reshape(BH, Tp, hd)
    of = out.reshape(BH, Tp, hd)
    lsef = lse.reshape(BH, Tp, 1)

    # delta_i = rowsum(dO_i * O_i) — cheap XLA elementwise+reduce
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)

    row = lambda b, i: (b, 0, 0)
    blk = lambda b, i: (b, i, 0)
    dq_kernel = functools.partial(_bwd_dq_kernel, block_q=block_q,
                                  block_k=block_k, sm_scale=sm_scale,
                                  causal=causal, seq_len=T)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(BH, Tp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), blk),
            pl.BlockSpec((1, Tp, hd), row),
            pl.BlockSpec((1, Tp, hd), row),
            pl.BlockSpec((1, block_q, hd), blk),
            pl.BlockSpec((1, block_q, 1), blk),
            pl.BlockSpec((1, block_q, 1), blk),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), blk),
        out_shape=jax.ShapeDtypeStruct((BH, Tp, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, delta)

    dkv_kernel = functools.partial(_bwd_dkv_kernel, block_q=block_q,
                                   block_k=block_k, sm_scale=sm_scale,
                                   causal=causal, seq_len=T)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(BH, Tp // block_k),
        in_specs=[
            pl.BlockSpec((1, Tp, hd), row),
            pl.BlockSpec((1, block_k, hd), blk),
            pl.BlockSpec((1, block_k, hd), blk),
            pl.BlockSpec((1, Tp, hd), row),
            pl.BlockSpec((1, Tp, 1), row),
            pl.BlockSpec((1, Tp, 1), row),
        ],
        out_specs=(pl.BlockSpec((1, block_k, hd), blk),
                   pl.BlockSpec((1, block_k, hd), blk)),
        out_shape=(jax.ShapeDtypeStruct((BH, Tp, hd), q.dtype),
                   jax.ShapeDtypeStruct((BH, Tp, hd), q.dtype)),
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, delta)

    to4 = lambda x: x.reshape(B, H, Tp, hd)[:, :, :T, :]
    return to4(dq), to4(dk), to4(dv)


_flash_attention_vjp.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   causal: bool, block_q: int, block_k: int,
                   interpret: bool):
    B, H, T, hd = q.shape
    sm_scale = 1.0 / math.sqrt(hd)
    block_q = min(block_q, _round_up(T, 8))
    block_k = min(block_k, _round_up(T, 8))
    # pad to a multiple of BOTH block sizes: with block_k > block_q the
    # causal k-loop's last pl.ds read rounds (qi+1)*block_q up to block_k
    # and must stay inside the padded K/V refs (ADVICE r2)
    pad = (-T) % (block_q * block_k // math.gcd(block_q, block_k))
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
    out, lse = pl.pallas_call(
        kernel,
        grid=(B * H, Tp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Tp, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Tp, hd), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
                   pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B * H, Tp, hd), q.dtype),
                   jax.ShapeDtypeStruct((B * H, Tp, 1), jnp.float32)),
        interpret=interpret,
    )(qf, kf, vf)
    return (out.reshape(B, H, Tp, hd)[:, :, :T, :],
            lse.reshape(B, H, Tp, 1)[:, :, :T, :])
