"""Encoder pretraining for image policies: state regression from pixels.

Functional parity target: the reference's vision pipelines do NOT train
their encoders through the policy loss — they consume PRECOMPUTED
embeddings from a pretrained encoder
(`beso/envs/franka_kitchen/dataloader.py:94-161` loads embedded frames;
`beso/agents/diffusion_agents/k_diffusion/score_gpts.py:377-642` treats
goals/states as given embedding vectors). No pretrained weights can be
vendored here, so the TPU-native equivalent is a PRETRAINING STAGE that
runs in-framework: render demo states through the fixed analytic camera,
train the same `ConvImageEncoder` the policy uses (plus a small
regression head that is thrown away) to regress the ground-truth low-dim
state, then graft the encoder weights into the policy and optionally
freeze them (`freeze_encoder=True` on the policy module).

The regression objective is the strongest available probe of the
"representational gap" hypothesis (RESULTS.md vision studies): the
reported per-dim RMSE states exactly how much of the ground-truth state
the embedding carries, and a policy trained on frozen
regression-pretrained features isolates representation quality from
policy optimization.

TPU-first: rendering happens inside the jitted pretraining step (the
state pool is passed as an argument — never a closure constant, the
remote-compile HTTP 413 rule), and `steps_per_call` steps are fused into
one `lax.scan` program so short-step dispatch overhead amortizes.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from beso_tpu.models.vision_policy import ConvImageEncoder


class StateRegressionNet(nn.Module):
    """ConvImageEncoder (shared with the policy) + disposable MLP head.

    The encoder submodule is named "encoder" so its parameter subtree is
    directly graftable into `VisionPolicyGPT`/`KitchenVisionPolicyGPT`
    (which name their encoder identically)."""

    obs_dim: int
    embed_size: int = 48
    features: Tuple[int, ...] = (24, 48, 64)
    head_width: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> jnp.ndarray:  # [N, H, W, C]
        feat = ConvImageEncoder(self.embed_size, features=self.features,
                                dtype=self.dtype, name="encoder")(imgs)
        x = nn.Dense(self.head_width, name="head_hidden")(
            feat.astype(jnp.float32))
        x = nn.gelu(x)
        return nn.Dense(self.obs_dim, name="head_out")(x)


def graft_encoder_params(params, encoder_params):
    """Replace the (unique) "encoder" subtree anywhere in `params` with
    `encoder_params`. Returns a new pytree; raises if the key is absent
    or ambiguous."""
    found = []

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "encoder":
                    found.append(k)
                    out[k] = encoder_params
                else:
                    out[k] = walk(v)
            return out
        return node

    out = walk(jax.tree.map(lambda x: x, params))  # shallow copy of leaves
    if len(found) != 1:
        raise ValueError(
            f"expected exactly one 'encoder' subtree, found {len(found)}")
    return out


def pretrain_state_regression(
    key: jax.Array,
    states: np.ndarray,
    render_fn: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    embed_size: int = 48,
    features: Tuple[int, ...] = (24, 48, 64),
    dtype: jnp.dtype = jnp.float32,
    steps: int = 3000,
    batch_size: int = 256,
    lr: float = 1e-3,
    jitter_rel: float = 0.1,
    steps_per_call: int = 50,
    target_fn: Callable[[jnp.ndarray], jnp.ndarray] = None,
    weight_fn: Callable[[jnp.ndarray], jnp.ndarray] = None,
    cosine_decay: bool = True,
    std_floor: float = 1e-3,
    jitter_std: np.ndarray = None,
):
    """Train `ConvImageEncoder` to regress the low-dim state from its own
    rendering.

    Args:
      states: [M, obs_dim] pool of ground-truth states (e.g. all demo
        observations). Targets are normalized per-dim by the pool's
        (weighted) mean/std.
      render_fn: maps ONE [obs_dim] state to an [H, W, C] image (already
        background-subtracted the way the policy feeds its encoder).
      jitter_rel: gaussian state jitter as a fraction of the per-dim std,
        applied before BOTH the render and the target — densifies
        coverage beyond the demo manifold so the encoder stays accurate
        on off-distribution eval states.
      target_fn: optional batched map [B, obs_dim] -> [B, target_dim] to a
        SYMMETRY-ADAPTED regression target (e.g. yaw of a fourfold-
        symmetric block as (cos 4y, sin 4y) — raw-angle regression has an
        irreducible pi/2 ambiguity the render cannot resolve). Identity
        by default.
      weight_fn: optional batched map [B, obs_dim] -> [B, target_dim]
        per-row loss weights; use 0 to mask target dims that are
        out-of-frame/meaningless for that row (e.g. the far-plane 10.0
        sentinel in goal-picture rows). All-ones by default.
      cosine_decay: cosine-anneal the LR to lr/100 over `steps` (sharper
        final localization than constant LR).
      std_floor: normalization floor for near-constant target dims — a
        dim whose pool std is below the floor would otherwise blow up the
        normalized loss under any jitter.
      jitter_std: optional ABSOLUTE per-dim jitter scale [obs_dim]
        (overrides jitter_rel x pool-std — needed when sentinel values,
        e.g. the 10.0 far plane in goal rows, inflate the raw pool std).

    Returns:
      (encoder_params, info) where `encoder_params` is the subtree to
      pass to `graft_encoder_params`, and `info` carries the final loss
      and per-dim weighted RMSE in target units (ORIGINAL state units
      when `target_fn` is None).
    """
    states = np.asarray(states, np.float32)
    m, obs_dim = states.shape
    if target_fn is None:
        target_fn = lambda b: b  # noqa: E731
    if weight_fn is None:
        weight_fn = lambda b: jnp.ones_like(target_fn(b))  # noqa: E731

    pool_t = np.asarray(target_fn(jnp.asarray(states)), np.float32)
    pool_w = np.asarray(weight_fn(jnp.asarray(states)), np.float32)
    wsum = np.maximum(pool_w.sum(axis=0), 1e-6)
    mean = (pool_t * pool_w).sum(axis=0) / wsum
    var = (pool_w * (pool_t - mean) ** 2).sum(axis=0) / wsum
    std = np.maximum(np.sqrt(var), std_floor)
    target_dim = pool_t.shape[-1]

    net = StateRegressionNet(obs_dim=target_dim, embed_size=embed_size,
                             features=features, dtype=dtype)
    k_init, k_train = jax.random.split(key)
    img0 = jax.vmap(render_fn)(jnp.asarray(states[:2]))
    params = net.init(k_init, img0)
    if cosine_decay:
        tx = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1), 0.01))
    else:
        tx = optax.adam(lr)
    opt_state = tx.init(params)

    mean_j = jnp.asarray(mean)
    std_j = jnp.asarray(std)
    if jitter_std is None:
        jitter_std = jitter_rel * np.maximum(states.std(axis=0), 1e-3)
    else:
        jitter_std = np.asarray(jitter_std, np.float32)
    apply_jitter = bool(np.any(jitter_std > 0))
    state_jitter_j = jnp.asarray(jitter_std)  # absolute, state space

    def loss_fn(p, batch_states):
        imgs = jax.vmap(render_fn)(batch_states)
        pred = net.apply(p, imgs)
        target = (target_fn(batch_states) - mean_j) / std_j
        w = weight_fn(batch_states)
        return jnp.sum(w * (pred - target) ** 2) / jnp.maximum(
            jnp.sum(w), 1e-6)

    # the pool rides in as a jit ARGUMENT (never a baked-in constant — the
    # remote-compile HTTP 413 rule) and `steps_per_call` updates fuse into
    # one scan so dispatch overhead amortizes
    @jax.jit
    def run_block(p, o, pool, ks):
        def one_step(carry, k):
            p, o = carry
            k_idx, k_jit = jax.random.split(k)
            idx = jax.random.randint(k_idx, (batch_size,), 0, m)
            b = pool[idx]
            if apply_jitter:
                b = b + state_jitter_j * jax.random.normal(k_jit, b.shape)
            loss, grads = jax.value_and_grad(loss_fn)(p, b)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), losses = jax.lax.scan(one_step, (p, o), ks)
        return p, o, losses

    pool_dev = jnp.asarray(states)
    losses = []
    n_calls = max(1, steps // steps_per_call)
    keys = jax.random.split(k_train, n_calls * steps_per_call)
    for c in range(n_calls):
        ks = keys[c * steps_per_call:(c + 1) * steps_per_call]
        params, opt_state, ls = run_block(params, opt_state, pool_dev, ks)
        losses.append(np.asarray(ls))
    losses = np.concatenate(losses)

    # held-in probe: per-dim weighted RMSE in target units on a fresh slice
    k_probe = jax.random.fold_in(k_train, 7)
    idx = jax.random.randint(k_probe, (min(512, m),), 0, m)
    probe = pool_dev[idx]
    pred = net.apply(params, jax.vmap(render_fn)(probe))
    err = (pred * std_j + mean_j) - target_fn(probe)
    w = weight_fn(probe)
    rmse = np.asarray(jnp.sqrt(
        jnp.sum(w * err ** 2, axis=0) / jnp.maximum(jnp.sum(w, axis=0),
                                                    1e-6)))

    info = {
        "final_loss": float(losses[-10:].mean()),
        "first_loss": float(losses[:10].mean()),
        "rmse_per_dim": rmse,
        "rmse_mean": float(rmse.mean()),
    }
    return params["params"]["encoder"], info
