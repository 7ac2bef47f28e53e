"""Prefix-KV cached inference: per-episode sigma/goal token caching.

Structural observation (TPU-first serving optimization, no reference
equivalent — the torch code recomputes everything per call): in the token
sequence `[sigma, g_1..g_G, s_1, a_1, ..., s_T, a_T]` (score_gpts.py:326-337)
the prefix `[sigma, g*]` attends only to itself (causality), so its per-layer
activations — and hence its attention K/V — depend only on (sigma, goal).
During evaluation rollouts the goal is fixed per episode and the sampler's
sigma grid is a static schedule of `n_timesteps` values, so the prefix K/V
for every (sigma_k, goal) pair can be computed ONCE per episode and reused
for all `n_steps x NFE` denoiser calls. Each call then processes only the
2T state/action tokens: ~27% fewer FLOPs at kitchen shapes (3 of 11 tokens)
and a smaller attention problem.

Valid for samplers that only evaluate the model on grid sigmas (ddim, euler
with s_churn=0, dpmpp_2m, lms). Ancestral/churned/adaptive samplers evaluate
off-grid sigmas — use the full path there (the rollout gates this).

Numerics are identical to models/gpt.py (tested to 1e-5 in f32); only the
computation is re-partitioned.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from beso_tpu.core.precond import append_dims, edm_scalings

# samplers whose model evaluations stay on the sigma grid
CACHED_SAFE_SAMPLERS = ("ddim", "euler", "dpmpp_2m", "lms")


class RawGPTParams(NamedTuple):
    """Flax DiffusionGPT weights in natural [in, out] orientation."""

    sig_w: jnp.ndarray
    sig_b: jnp.ndarray
    tok_w: jnp.ndarray
    tok_b: jnp.ndarray
    goal_w: Optional[jnp.ndarray]
    goal_b: Optional[jnp.ndarray]
    act_w: jnp.ndarray
    act_b: jnp.ndarray
    pos_emb: jnp.ndarray
    layers: Tuple[dict, ...]
    lnf_scale: jnp.ndarray
    lnf_bias: jnp.ndarray
    head: Tuple[jnp.ndarray, ...]


class PrefixKV(NamedTuple):
    k: jnp.ndarray        # [S, L, B, P, H, hd]
    v: jnp.ndarray        # [S, L, B, P, H, hd]
    sigmas: jnp.ndarray   # [S] the grid the cache was built for


def extract_gpt_params(model, params: Any) -> RawGPTParams:
    if model.sigma_embedding != "Linear":
        raise NotImplementedError(
            "cached inference supports the shipped 'Linear' sigma embedding")
    p = params.get("params", params)

    def kb(name):
        return p[name]["kernel"], p[name]["bias"]

    layers = []
    for i in range(model.n_layers):
        blk = p[f"block_{i}"]
        layers.append(dict(
            ln1_s=blk["ln1"]["scale"], ln1_b=blk["ln1"]["bias"],
            wqkv=blk["attn"]["qkv"]["kernel"], bqkv=blk["attn"]["qkv"]["bias"],
            wproj=blk["attn"]["proj"]["kernel"],
            bproj=blk["attn"]["proj"]["bias"],
            ln2_s=blk["ln2"]["scale"], ln2_b=blk["ln2"]["bias"],
            wfc=blk["fc"]["kernel"], bfc=blk["fc"]["bias"],
            wfc2=blk["fc_proj"]["kernel"], bfc2=blk["fc_proj"]["bias"]))

    head = (kb("action_pred") if model.linear_output
            else kb("action_pred_fc") + kb("action_pred_out"))
    goal_w = goal_b = None
    if model.goal_dim is not None and model.goal_dim != model.state_dim:
        goal_w, goal_b = kb("goal_emb")
    sig_w, sig_b = kb("sigma_emb")
    tok_w, tok_b = kb("tok_emb")
    act_w, act_b = kb("action_emb")
    return RawGPTParams(sig_w=sig_w, sig_b=sig_b, tok_w=tok_w, tok_b=tok_b,
                        goal_w=goal_w, goal_b=goal_b, act_w=act_w, act_b=act_b,
                        pos_emb=p["pos_emb"], layers=tuple(layers),
                        lnf_scale=p["ln_f"]["scale"],
                        lnf_bias=p["ln_f"]["bias"], head=head)


def _ln(x, scale, bias, dtype):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(dtype)


def _dense(x, w, b, dtype):
    y = jnp.dot(x.astype(dtype), w.astype(dtype),
                preferred_element_type=jnp.float32) + b
    return y.astype(dtype)


def _qkv_split(model, qkv):
    B, T, _ = qkv.shape
    H = model.n_heads
    hd = model.embed_dim // H
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return (q.reshape(B, T, H, hd), k.reshape(B, T, H, hd),
            v.reshape(B, T, H, hd))


def _attend(model, q, k, v, mask):
    """Broadcast-form attention (models/gpt.py numerics): q [B,Tq,H,hd],
    k/v [B,S,H,hd], mask [Tq,S] bool."""
    hd = model.embed_dim // model.n_heads
    dtype = q.dtype
    scores = (q[:, :, None] * k[:, None]).sum(-1)          # [B,Tq,S,H]
    scores = scores.astype(jnp.float32) / (hd ** 0.5)
    scores = jnp.where(mask[None, :, :, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=2).astype(dtype)
    y = (probs[..., None] * v[:, None]).sum(2)             # [B,Tq,H,hd]
    return y.reshape(q.shape[0], q.shape[1], model.embed_dim)


def _block_with_kv(model, lp, x, kv_prefix, mask):
    """One transformer block over suffix tokens x, attending to
    [prefix_kv ++ own_kv]. Returns (x_out, (k_own, v_own))."""
    dtype = model.dtype
    h = _ln(x, lp["ln1_s"], lp["ln1_b"], dtype)
    q, k, v = _qkv_split(model, _dense(h, lp["wqkv"], lp["bqkv"], dtype))
    if kv_prefix is not None:
        pk, pv = kv_prefix
        k_full = jnp.concatenate([pk.astype(k.dtype), k], axis=1)
        v_full = jnp.concatenate([pv.astype(v.dtype), v], axis=1)
    else:
        k_full, v_full = k, v
    y = _attend(model, q, k_full, v_full, mask)
    x = x + _dense(y, lp["wproj"], lp["bproj"], dtype)
    h = _ln(x, lp["ln2_s"], lp["ln2_b"], dtype)
    h = _dense(h, lp["wfc"], lp["bfc"], dtype)
    h = jax.nn.gelu(h, approximate=model.approximate_gelu)
    return x + _dense(h, lp["wfc2"], lp["bfc2"], dtype), (k, v)


def build_prefix(model, rp: RawGPTParams, goals_scaled: jnp.ndarray,
                 sigmas: jnp.ndarray) -> PrefixKV:
    """Run the prefix tokens [sigma, g_1..g_G] through all layers for every
    grid sigma; collect per-layer K/V. goals_scaled: [B, G, goal_dim] as fed
    to the model (already scaled/zeroed); sigmas: [S]."""
    B = goals_scaled.shape[0]
    G = model.eff_goal_len
    S = sigmas.shape[0]
    dtype = model.dtype

    sig = (jnp.log(sigmas.astype(jnp.float32)) / 4.0).reshape(S, 1, 1, 1)
    emb_t = _dense(sig, rp.sig_w, rp.sig_b, dtype)          # [S,1,1,D]
    emb_t = jnp.broadcast_to(emb_t, (S, B, 1, model.embed_dim))

    if model.goal_conditioned:
        if rp.goal_w is not None:
            goal_x = _dense(goals_scaled, rp.goal_w, rp.goal_b, dtype)
        else:
            goal_x = _dense(goals_scaled, rp.tok_w, rp.tok_b, dtype)
        goal_x = goal_x + rp.pos_emb[:, :G, :]
        goal_x = jnp.broadcast_to(goal_x[None],
                                  (S, B, G, model.embed_dim))
        seq = jnp.concatenate([emb_t, goal_x], axis=2)      # [S,B,P,D]
    else:
        seq = emb_t
    P = seq.shape[2]
    x = seq.reshape(S * B, P, model.embed_dim).astype(dtype)

    mask = jnp.tril(jnp.ones((P, P), bool))
    ks, vs = [], []
    for lp in rp.layers:
        x, (k, v) = _block_with_kv(model, lp, x, None, mask)
        ks.append(k)
        vs.append(v)
    H = model.n_heads
    hd = model.embed_dim // H
    k_cache = jnp.stack(ks).reshape(model.n_layers, S, B, P, H, hd)
    v_cache = jnp.stack(vs).reshape(model.n_layers, S, B, P, H, hd)
    return PrefixKV(k=k_cache.transpose(1, 0, 2, 3, 4, 5),
                    v=v_cache.transpose(1, 0, 2, 3, 4, 5),
                    sigmas=jnp.asarray(sigmas))


def suffix_forward(model, rp: RawGPTParams, prefix: PrefixKV,
                   states: jnp.ndarray, actions: jnp.ndarray,
                   sigma: jnp.ndarray) -> jnp.ndarray:
    """Inner-model forward over the 2T state/action tokens with cached
    prefix K/V. sigma: [B] — all entries must equal one grid value; the
    nearest grid index selects the cache entry."""
    B, T, _ = states.shape
    G = model.eff_goal_len
    P = 1 + G if model.goal_conditioned else 1
    D = model.embed_dim
    dtype = model.dtype

    idx = jnp.argmin(jnp.abs(jnp.log(jnp.maximum(sigma[0], 1e-12))
                             - jnp.log(jnp.maximum(prefix.sigmas, 1e-12))))

    state_x = _dense(states, rp.tok_w, rp.tok_b, dtype) + rp.pos_emb[:, G:G + T, :]
    action_x = _dense(actions, rp.act_w, rp.act_b, dtype) + rp.pos_emb[:, G:G + T, :]
    x = jnp.stack([state_x, action_x], axis=2).reshape(B, 2 * T, D)
    x = x.astype(dtype)

    # suffix query t (sequence position P+t) sees all P prefix keys plus
    # suffix keys j <= t
    qpos = jnp.arange(2 * T)
    mask = jnp.concatenate(
        [jnp.ones((2 * T, P), bool), qpos[:, None] >= qpos[None, :]], axis=1)

    for li, lp in enumerate(rp.layers):
        kv = (prefix.k[idx, li], prefix.v[idx, li])
        x, _ = _block_with_kv(model, lp, x, kv, mask)

    x = _ln(x, rp.lnf_scale, rp.lnf_bias, dtype)
    x = x.reshape(B, T, 2, D)[:, :, 1, :]                   # action slots
    if model.linear_output:
        w, b = rp.head
        pred = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32)) + b
    else:
        w1, b1, w2, b2 = rp.head
        h = jax.nn.silu(_dense(x, w1, b1, dtype))
        pred = jnp.dot(h.astype(jnp.float32), w2.astype(jnp.float32)) + b2
    return pred.astype(jnp.float32)


def make_rollout_denoise_factory(den, params: Any, scaler, cfg,
                                 engine: str = "cached"):
    """Per-episode denoise-fn factory for the fused rollouts.

    Returns `factory(goals_raw) -> dn` for `rollout_*.denoise_factory`:
    builds the prefix cache once per rollout (inside the rollout's jit) for
    the policy's sigma grid and the episode goals, handling the CFG batch
    stacking that `cfg_denoise_fn` applies ([goals, zeros] along batch —
    models/cfg.py:49-52) so the cached batch lines up with the wrapped
    calls.

    Gating (raises ValueError otherwise): sampler must stay on the sigma
    grid (CACHED_SAFE_SAMPLERS), s_churn == 0, single action sample.
    """
    from beso_tpu.agents.policy import scale_goal_for_model
    from beso_tpu.core.schedules import get_noise_schedule

    if cfg.sampler_type not in CACHED_SAFE_SAMPLERS:
        raise ValueError(
            f"cached inference engine requires a grid-sigma sampler "
            f"{CACHED_SAFE_SAMPLERS}, got {cfg.sampler_type!r}")
    if cfg.s_churn:
        raise ValueError("cached inference engine requires s_churn == 0")
    if cfg.n_action_samples > 1:
        raise ValueError("cached inference engine requires a single action "
                         "sample per step")

    sigmas = get_noise_schedule(cfg.num_sampling_steps, cfg.sigma_min,
                                cfg.sigma_max, cfg.rho,
                                cfg.noise_scheduler)[:-1]  # drop appended 0

    use_fused = engine == "fused_cached"

    def factory(goals_raw):
        g_s = scale_goal_for_model(scaler, jnp.asarray(goals_raw))
        if cfg.cond_lambda == 0.0:
            g_model = jnp.zeros_like(g_s)
        elif cfg.cond_lambda != 1.0:
            # cfg_denoise_fn stacks [cond, uncond] along batch
            g_model = jnp.concatenate([g_s, jnp.zeros_like(g_s)], axis=0)
        else:
            g_model = g_s
        if use_fused:
            # Pallas suffix layers on top of the prefix cache. Multi-device
            # serving runs this per shard under shard_map
            # (rollout/sharded.py) — each device executes its own
            # pallas_call on its env shard; plain jit over dp-SHARDED
            # inputs is not a supported fused path (XLA cannot partition a
            # pallas_call). BESO_LAYER_GROUP=N runs N blocks per
            # pallas_call (VERDICT r3 #7 measurement knob; default 1 =
            # per-layer calls).
            import os

            from beso_tpu.models.fused import make_fused_cached_denoise_fn

            return make_fused_cached_denoise_fn(
                den, params, g_model, sigmas,
                layer_group=int(os.environ.get("BESO_LAYER_GROUP", "1")))
        return make_cached_denoise_fn(den, params, g_model, sigmas)

    return factory


def make_cached_denoise_fn(den, params: Any, goals_scaled: jnp.ndarray,
                           sigmas: jnp.ndarray):
    """Per-episode denoise fn: EDM-preconditioned suffix forward against a
    prefix cache built once for (goals_scaled, sigma grid).

    The returned `dn(states, actions, goals, sigma)` ignores its goals
    argument (the cache encodes them); batch must match goals_scaled. Use
    only with CACHED_SAFE_SAMPLERS and s_churn == 0.
    """
    model = den.inner_model
    rp = extract_gpt_params(model, params)
    prefix = build_prefix(model, rp, goals_scaled, jnp.asarray(sigmas))

    def dn(states, actions, goals, sigma, **kwargs):
        del goals, kwargs
        c_skip, c_out, c_in = [append_dims(c, actions.ndim)
                               for c in edm_scalings(sigma, den.sigma_data)]
        out = suffix_forward(model, rp, prefix, states, actions * c_in, sigma)
        return out * c_out + actions * c_skip

    return dn
