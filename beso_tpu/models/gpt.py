"""Noise-conditioned causal transformer ("DiffusionGPT") in flax.linen.

Functional parity target: the reference's miniGPT-derived score network
(`beso/agents/diffusion_agents/k_diffusion/score_gpts.py:15-374`):

token layout   [sigma_emb, g_1..g_G, s_1, a_1, ..., s_T, a_T]
block_size     G + 2T + 1          (score_gpts.py:148)
seq_size       G + T + 1           (score_gpts.py:150)
sigma token    Linear(log(sigma)/4)         (score_gpts.py:284-286)
tok_emb        shared Linear for states AND goals (score_gpts.py:305-306)
pos_emb        learned, shared between s_t and a_t (score_gpts.py:322-324)
CFG masking    Bernoulli(cond_mask_prob) elementwise goal zeroing in training
               (score_gpts.py:360-371); full zeroing when uncond=True
head           linear, or Linear(D,100)+SiLU+Linear(100,A) (score_gpts.py:183-190)
output         action-slot tokens of the second half (score_gpts.py:343-354)

TPU-first deviations from the torch code (behavior preserved):
* pure function of (params, rngs, inputs) — no module-global `training` flag,
* attention runs as one fused QKV projection + `jax.nn.dot_product_attention`
  (same math as the explicit q/k/v Linears + softmax of score_gpts.py:50-80),
* optional bfloat16 compute dtype with float32 params/softmax accumulation,
* the B,T,2,D de-interleave of outputs is a static reshape (no data-dependent
  branch; the reference's `x.size()[1] < 2*obs_seq_len` branch only triggers
  for truncated contexts, which we handle by padding windows to full size).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# token count at/above which "auto" attention switches from the VPU
# broadcast form to the Pallas flash kernel (where [B,H,T,T] score
# materialization starts to dominate HBM traffic)
_FLASH_THRESHOLD = 64


class CausalSelfAttention(nn.Module):
    """Multi-head causal self-attention (score_gpts.py:15-80).

    `impl` selects the compute path (same math, different hardware mapping):
    * "broadcast" — VPU broadcast-multiply-reduce. For BESO's tiny token
      counts (~11) the per-head QK^T matmuls are 11x60 tiles, far below the
      128x128 MXU tile, so this measures ~2.6x faster at B=4096 on v5e.
    * "pallas" — the flash-attention kernel (ops/flash_attention.py):
      online-softmax streaming over K/V blocks, no TxT materialization.
      Measured on v5e: equal to broadcast at the 131-token chunked config
      (attention is a small fraction there), and the only path that RUNS at
      ~1k tokens — the broadcast form's [B, T, S, H] score tensor blows the
      compiler's memory budget (remote-compile failure at B=64, T=1027).
    * "auto" (default) — broadcast below _FLASH_THRESHOLD tokens, pallas at
      or above it. NOTE: the pallas path does not support attention dropout
      (BESO ships attn_pdrop=0 everywhere); dropout falls back to broadcast.
    """

    n_embd: int
    n_heads: int
    attn_pdrop: float
    resid_pdrop: float
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, T, C = x.shape
        qkv = nn.Dense(3 * self.n_embd, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.n_embd // self.n_heads
        q = q.reshape(B, T, self.n_heads, hd)
        k = k.reshape(B, T, self.n_heads, hd)
        v = v.reshape(B, T, self.n_heads, hd)

        dropout_active = self.attn_pdrop > 0 and not deterministic
        impl = self.impl
        if impl == "auto":
            impl = "pallas" if (T >= _FLASH_THRESHOLD
                                and not dropout_active) else "broadcast"
        if impl == "pallas" and dropout_active:
            raise ValueError("attention='pallas' does not support attn_pdrop")

        if impl == "pallas":
            from beso_tpu.ops.flash_attention import flash_attention

            # kernel layout [B, H, T, hd]; interpret mode on CPU hosts
            y = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), causal=True,
                interpret=jax.default_backend() == "cpu")
            y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
        else:
            scale = 1.0 / math.sqrt(hd)
            scores = (q[:, :, None] * k[:, None, :, :, :]).sum(-1)  # [B,T,S,H]
            scores = scores.astype(jnp.float32) * scale
            causal = jnp.tril(jnp.ones((T, T), bool))
            scores = jnp.where(causal[None, :, :, None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=2)
            if dropout_active:
                probs = nn.Dropout(self.attn_pdrop)(probs,
                                                    deterministic=deterministic)
            probs = probs.astype(v.dtype)
            y = (probs[..., None] * v[:, None]).sum(2)  # [B, T, H, hd]
            y = y.reshape(B, T, C)
        y = nn.Dense(self.n_embd, dtype=self.dtype, name="proj")(y)
        y = nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)
        return y


class Block(nn.Module):
    """Pre-LN transformer block with 4x GELU MLP (score_gpts.py:83-115).

    `approximate_gelu=True` (default) uses the tanh GELU: the exact erf on
    the VPU costs ~40% of the whole forward at BESO's shapes (measured on
    v5e); the tanh form matches erf to ~1e-3 and is the native choice for
    models trained in this framework. Set False for bit-faithful use of
    torch-trained checkpoints (torch nn.GELU defaults to erf).
    """

    n_embd: int
    n_heads: int
    attn_pdrop: float
    resid_pdrop: float
    approximate_gelu: bool = True
    attention: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # LN statistics are always float32 (flax _compute_stats); emitting the
        # normalized output in the compute dtype removes a full-width f32
        # round-trip to HBM per LN (measured 33% of the bf16 forward on v5e).
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        x = x + CausalSelfAttention(
            self.n_embd, self.n_heads, self.attn_pdrop, self.resid_pdrop,
            impl=self.attention, dtype=self.dtype, name="attn",
        )(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(4 * self.n_embd, dtype=self.dtype, name="fc")(h)
        h = nn.gelu(h, approximate=self.approximate_gelu)
        h = nn.Dense(self.n_embd, dtype=self.dtype, name="fc_proj")(h)
        h = nn.Dropout(self.resid_pdrop)(h, deterministic=deterministic)
        return x + h


def _init_dense():
    """miniGPT init: normal(0, 0.02) weights, zero bias (score_gpts.py:202-209)."""
    return dict(
        kernel_init=nn.initializers.normal(stddev=0.02),
        bias_init=nn.initializers.zeros,
    )


class DiffusionGPT(nn.Module):
    """Goal-conditioned noise-aware causal GPT over state/action tokens."""

    state_dim: int
    action_dim: int
    embed_dim: int
    n_layers: int
    n_heads: int
    goal_seq_len: int
    obs_seq_len: int
    goal_conditioned: bool = True
    embed_pdrob: float = 0.0
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    cond_mask_prob: float = 0.0
    linear_output: bool = True
    goal_dim: Optional[int] = None  # defaults to state_dim (shared tok_emb)
    sigma_embedding: str = "Linear"  # time_embedding_fn type (utils.py:8-23)
    approximate_gelu: bool = True    # tanh GELU (see Block); False = torch erf
    attention: str = "auto"          # 'auto' | 'broadcast' | 'pallas'
    dtype: jnp.dtype = jnp.float32

    @property
    def eff_goal_len(self) -> int:
        return self.goal_seq_len if self.goal_conditioned else 0

    @property
    def block_size(self) -> int:
        return self.eff_goal_len + 2 * self.obs_seq_len + 1

    @property
    def seq_size(self) -> int:
        return self.eff_goal_len + self.obs_seq_len + 1

    @nn.compact
    def __call__(
        self,
        states: jnp.ndarray,    # [B, T, state_dim]
        actions: jnp.ndarray,   # [B, T, action_dim]
        goals: jnp.ndarray,     # [B, G, goal_dim]
        sigma: jnp.ndarray,     # [B]
        *,
        uncond: bool = False,
        train: bool = False,
    ) -> jnp.ndarray:           # [B, T, action_dim]
        B, T, _ = states.shape
        G = self.eff_goal_len
        deterministic = not train

        # sigma token: embedding of log(sigma)/4 (score_gpts.py:284-286);
        # 'Linear' is the shipped choice, alternatives per utils.py:8-23
        sig = (jnp.log(sigma.astype(jnp.float32)) / 4.0).reshape(B, 1, 1)
        if self.sigma_embedding == "Linear":
            emb_t = nn.Dense(self.embed_dim, dtype=self.dtype,
                             name="sigma_emb", **_init_dense())(sig)
        else:
            from beso_tpu.models.embeddings import make_time_embedding

            emb_t = make_time_embedding(self.sigma_embedding, self.embed_dim)(
                sig.reshape(B)).reshape(B, 1, self.embed_dim)

        # CFG goal dropout: elementwise Bernoulli(p) zero mask while training
        # (score_gpts.py:360-371); full zeroing when sampling unconditionally.
        if self.goal_conditioned:
            if uncond:
                goals = jnp.zeros_like(goals)
            elif train and self.cond_mask_prob > 0.0:
                rng = self.make_rng("cond_mask")
                mask = jax.random.bernoulli(rng, self.cond_mask_prob, goals.shape)
                goals = goals * (1.0 - mask.astype(goals.dtype))

        tok_emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="tok_emb",
                           **_init_dense())
        state_embed = tok_emb(states)
        if self.goal_dim is not None and self.goal_dim != self.state_dim:
            goal_embed = nn.Dense(self.embed_dim, dtype=self.dtype,
                                  name="goal_emb", **_init_dense())(goals)
        else:
            goal_embed = tok_emb(goals)  # shared embed (score_gpts.py:305-306)
        action_embed = nn.Dense(self.embed_dim, dtype=self.dtype,
                                name="action_emb", **_init_dense())(actions)

        pos_emb = self.param(
            "pos_emb", nn.initializers.normal(stddev=0.02),
            (1, self.seq_size, self.embed_dim), jnp.float32,
        )
        drop = nn.Dropout(self.embed_pdrob)
        state_x = drop(state_embed + pos_emb[:, G:G + T, :], deterministic=deterministic)
        action_x = drop(action_embed + pos_emb[:, G:G + T, :], deterministic=deterministic)

        # interleave [s_1, a_1, ..., s_T, a_T] (score_gpts.py:330-331)
        sa_seq = jnp.stack([state_x, action_x], axis=2).reshape(B, 2 * T, self.embed_dim)

        if self.goal_conditioned:
            goal_x = drop(goal_embed + pos_emb[:, :G, :], deterministic=deterministic)
            input_seq = jnp.concatenate([emb_t.astype(sa_seq.dtype), goal_x, sa_seq], axis=1)
        else:
            input_seq = jnp.concatenate([emb_t.astype(sa_seq.dtype), sa_seq], axis=1)

        # pos_emb is a float32 param; without this cast the residual stream
        # (and every elementwise op on it) is promoted to f32, tripling HBM
        # traffic in the bf16 configuration.
        x = input_seq.astype(self.dtype)
        for i in range(self.n_layers):
            x = Block(self.embed_dim, self.n_heads, self.attn_pdrop,
                      self.resid_pdrop, approximate_gelu=self.approximate_gelu,
                      attention=self.attention,
                      dtype=self.dtype, name=f"block_{i}")(
                x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_f")(x)

        # second half: drop [sigma, goals] prefix, keep s/a tokens
        # (score_gpts.py:290-293,343-353)
        x = x[:, G + 1:, :]
        x = x.reshape(B, T, 2, self.embed_dim)
        action_outputs = x[:, :, 1, :]  # tokens at action slots

        if self.linear_output:
            pred = nn.Dense(self.action_dim, dtype=jnp.float32,
                            name="action_pred", **_init_dense())(action_outputs)
        else:
            h = nn.Dense(100, dtype=self.dtype, name="action_pred_fc",
                         **_init_dense())(action_outputs)
            h = nn.silu(h)
            pred = nn.Dense(self.action_dim, dtype=jnp.float32,
                            name="action_pred_out", **_init_dense())(h)
        return pred.astype(jnp.float32)


class VisionDiffusionGPT(DiffusionGPT):
    """Variant with a separate goal embedding for image-embedding states
    (score_gpts.py:377-642). Identical math except goals (dim state_dim-14)
    get their own Linear; construct with goal_dim=state_dim-14."""

    def __post_init__(self):
        if self.goal_dim is None:
            object.__setattr__(self, "goal_dim", self.state_dim - 14)
        super().__post_init__()
