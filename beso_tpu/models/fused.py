"""Fused-inference engine for DiffusionGPT: whole forward via Pallas layers.

Drop-in replacement for `GCDenoiser.apply` on the rollout/serving path. The
token assembly (sigma/state/goal/action embeddings, positional embeddings,
interleaving — `score_gpts.py:281-337` semantics, identical to
models/gpt.py) and the output head run as ordinary XLA ops; the 6-layer
transformer stack runs as fused Pallas kernels (ops/fused_layer.py) in the
tokens-major [T, D, B] layout, entering and leaving that layout with a
single transpose each way.

Usage:
    den = GCDenoiser(model, sigma_data=0.5)
    params = ...  # trained flax params
    denoise_fn = make_fused_denoise_fn(den, params)
    pred = denoise_fn(states, actions, goals, sigma)   # == den.apply(...)

Training always uses the flax path (the kernel is forward-only); parity is
enforced by tests/test_fused.py against models/gpt.py, which carries the
reference golden tests.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from beso_tpu.core.precond import append_dims, edm_scalings
from beso_tpu.ops.fused_layer import (ENV_BLOCK, FusedLayerParams,
                                      fused_layer, prepare_layer_params)


class FusedGPTParams(NamedTuple):
    sig_w: jnp.ndarray            # [1, D]
    sig_b: jnp.ndarray            # [D]
    tok_w: jnp.ndarray            # [state_dim, D]
    tok_b: jnp.ndarray            # [D]
    goal_w: Optional[jnp.ndarray]  # [goal_dim, D] when separate goal_emb
    goal_b: Optional[jnp.ndarray]
    act_w: jnp.ndarray            # [action_dim, D]
    act_b: jnp.ndarray            # [D]
    pos_emb: jnp.ndarray          # [1, seq_size, D]
    layers: Tuple[FusedLayerParams, ...]
    lnf_scale: jnp.ndarray        # [D]
    lnf_bias: jnp.ndarray         # [D]
    head: Tuple[jnp.ndarray, ...]  # (w, b) or (w1, b1, w2, b2)


def prepare_fused_gpt(model, params: Any) -> FusedGPTParams:
    """Extract + pre-layout flax DiffusionGPT params for the fused path."""
    if model.sigma_embedding != "Linear":
        raise NotImplementedError(
            "fused inference supports the shipped 'Linear' sigma embedding")
    p = params.get("params", params)
    dtype = model.dtype

    def kb(name):
        return p[name]["kernel"], p[name]["bias"]

    layers = []
    for i in range(model.n_layers):
        blk = p[f"block_{i}"]
        wqkv, bqkv = blk["attn"]["qkv"]["kernel"], blk["attn"]["qkv"]["bias"]
        wproj, bproj = blk["attn"]["proj"]["kernel"], blk["attn"]["proj"]["bias"]
        layers.append(prepare_layer_params(
            wqkv, bqkv, wproj, bproj,
            blk["fc"]["kernel"], blk["fc"]["bias"],
            blk["fc_proj"]["kernel"], blk["fc_proj"]["bias"],
            blk["ln1"]["scale"], blk["ln1"]["bias"],
            blk["ln2"]["scale"], blk["ln2"]["bias"],
            n_heads=model.n_heads, dtype=dtype))

    if model.linear_output:
        head = kb("action_pred")
    else:
        head = kb("action_pred_fc") + kb("action_pred_out")

    goal_w = goal_b = None
    if model.goal_dim is not None and model.goal_dim != model.state_dim:
        goal_w, goal_b = kb("goal_emb")

    sig_w, sig_b = kb("sigma_emb")
    tok_w, tok_b = kb("tok_emb")
    act_w, act_b = kb("action_emb")
    return FusedGPTParams(
        sig_w=sig_w, sig_b=sig_b, tok_w=tok_w, tok_b=tok_b,
        goal_w=goal_w, goal_b=goal_b, act_w=act_w, act_b=act_b,
        pos_emb=p["pos_emb"], layers=tuple(layers),
        lnf_scale=p["ln_f"]["scale"], lnf_bias=p["ln_f"]["bias"], head=head)


def fused_gpt_apply(model, fp: FusedGPTParams, states, actions, goals, sigma,
                    *, uncond: bool = False, env_block: int = ENV_BLOCK,
                    interpret: bool = False) -> jnp.ndarray:
    """DiffusionGPT forward (inference) with the fused transformer stack.

    Same numerics as models/gpt.py __call__ with train=False.
    """
    B, T, _ = states.shape
    G = model.eff_goal_len
    D = model.embed_dim
    dtype = model.dtype
    head_dim = D // model.n_heads

    def dense(x, w, b):
        y = jnp.dot(x.astype(dtype), w.astype(dtype),
                    preferred_element_type=jnp.float32)
        return (y + b).astype(dtype)

    sig = (jnp.log(sigma.astype(jnp.float32)) / 4.0).reshape(B, 1, 1)
    emb_t = dense(sig, fp.sig_w, fp.sig_b)

    if model.goal_conditioned and uncond:
        goals = jnp.zeros_like(goals)

    state_x = dense(states, fp.tok_w, fp.tok_b) + fp.pos_emb[:, G:G + T, :]
    action_x = dense(actions, fp.act_w, fp.act_b) + fp.pos_emb[:, G:G + T, :]
    sa_seq = jnp.stack([state_x, action_x], axis=2).reshape(B, 2 * T, D)
    if model.goal_conditioned:
        if fp.goal_w is not None:
            goal_x = dense(goals, fp.goal_w, fp.goal_b)
        else:
            goal_x = dense(goals, fp.tok_w, fp.tok_b)
        goal_x = goal_x + fp.pos_emb[:, :G, :]
        seq = jnp.concatenate([emb_t, goal_x, sa_seq], axis=1)
    else:
        seq = jnp.concatenate([emb_t, sa_seq], axis=1)
    seq = seq.astype(dtype)

    # pad the env dim up to a block multiple (tiny B: tests / odd batches)
    Bp = -(-B // env_block) * env_block
    if Bp != B:
        seq = jnp.pad(seq, ((0, Bp - B), (0, 0), (0, 0)))

    x = seq.transpose(1, 2, 0)  # [T_tok, D, B]
    for lp in fp.layers:
        x = fused_layer(x, lp, n_heads=model.n_heads, head_dim=head_dim,
                        approximate_gelu=model.approximate_gelu,
                        env_block=env_block, interpret=interpret)
    x = x.transpose(2, 0, 1)[:B]  # [B, T_tok, D]

    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * fp.lnf_scale
         + fp.lnf_bias).astype(dtype)

    x = x[:, G + 1:, :].reshape(B, T, 2, D)
    action_tokens = x[:, :, 1, :]
    if model.linear_output:
        w, b = fp.head
        pred = jnp.dot(action_tokens.astype(jnp.float32),
                       w.astype(jnp.float32)) + b
    else:
        w1, b1, w2, b2 = fp.head
        h = dense(action_tokens, w1, b1)
        h = jax.nn.silu(h)
        pred = jnp.dot(h.astype(jnp.float32), w2.astype(jnp.float32)) + b2
    return pred.astype(jnp.float32)


def make_fused_cached_denoise_fn(den, params: Any, goals_scaled, sigmas, *,
                                 env_block: int = ENV_BLOCK,
                                 interpret: Optional[bool] = None,
                                 token_lanes: bool = True,
                                 attn_qbatch: bool = False,
                                 layer_group: int = 1):
    """Combined engine: prefix-KV caching (models/cached.py) + the fused
    Pallas suffix layers. Per episode, the [sigma, goal] prefix K/V are
    built once per grid sigma (XLA, cheap); every denoiser call then runs
    only the 2T suffix tokens through the fused prefix layers, keeping
    LayerNorms, attention and the MLP in VMEM.

    `token_lanes=True` (round 3) uses the token-merged-lanes kernel: lanes
    carry (token, env) pairs so the LN+QKV and proj+MLP phases are single
    matmuls with no per-token fori_loop — measurably faster than the
    phase-split kernel, whose loops Mosaic executes strictly serially.
    The v2 kernel additionally (a) selects the per-sigma prefix K/V row
    inside the BlockSpec index map via scalar prefetch (no HBM-level
    dynamic-slice copy of the whole cache per call) and (b) for linear
    heads applies ln_f + the action head in-kernel on the last layer,
    removing the f32 [B, 2T, D] epilogue traffic (measured 5.75 -> 5.1
    ms/call at B=4096 kitchen). `attn_qbatch=True` switches the attention
    phase to the key-batched form (parity-kept; ~2% slower on chip).
    `layer_group=N` (round 4, VERDICT r3 #7) runs N consecutive blocks
    inside ONE pallas_call (intermediate activations never leave VMEM,
    one launch per group); N=2 fits the 360-D kitchen model's weights.

    Same gating as the cached engine: grid-sigma samplers only. Returned
    `dn(states, actions, goals_ignored, sigma)` is EDM-preconditioned.
    """
    from beso_tpu.models.cached import build_prefix, extract_gpt_params
    from beso_tpu.ops.fused_layer import (fused_layer_with_prefix,
                                          fused_layer_prefix_tl_v2,
                                          padded_head_dim)

    model = den.inner_model
    fp = prepare_fused_gpt(model, params)
    rp = extract_gpt_params(model, params)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = model.dtype
    H = model.n_heads
    hd = model.embed_dim // H
    hdp = padded_head_dim(hd)
    D = model.embed_dim
    G = model.eff_goal_len

    # pad the episode batch up to an env-block multiple once, here, so the
    # per-call padding lines up with the cache
    goals_scaled = jnp.asarray(goals_scaled)
    B0 = goals_scaled.shape[0]
    Bp0 = -(-B0 // env_block) * env_block
    if Bp0 != B0:
        goals_scaled = jnp.pad(goals_scaled,
                               ((0, Bp0 - B0), (0, 0), (0, 0)))
    prefix = build_prefix(model, rp, goals_scaled, jnp.asarray(sigmas))
    # [S, L, B, P, H, hd] -> [S, L, P, H*hdp, B] (kernel layout, zero pad)
    def to_kernel_layout(kv):
        kv = jnp.pad(kv, ((0, 0),) * 5 + ((0, hdp - hd),))
        S, L, B, P = kv.shape[:4]
        return kv.transpose(0, 1, 3, 4, 5, 2).reshape(S, L, P, H * hdp, B) \
                 .astype(dtype)

    pk_all = to_kernel_layout(prefix.k)
    pv_all = to_kernel_layout(prefix.v)
    B_pref = pk_all.shape[-1]
    if token_lanes:
        # precompute the token-merged-lanes prefix layout ONCE:
        # [S, L, P, HD, B] -> per-layer [S, nB, HD, P*E] (v2 kernel indexes
        # the sigma row via scalar prefetch, so keep S leading)
        nB_pref = B_pref // env_block

        def to_tl(kv):
            S, L, P, HDp, _ = kv.shape
            return (kv.reshape(S, L, P, HDp, nB_pref, env_block)
                    .transpose(0, 1, 4, 3, 2, 5)
                    .reshape(S, L, nB_pref, HDp, P * env_block))

        pk_tl = to_tl(pk_all)
        pv_tl = to_tl(pv_all)
        pk_by_layer = [pk_tl[:, li] for li in range(model.n_layers)]
        pv_by_layer = [pv_tl[:, li] for li in range(model.n_layers)]
        # fused ln_f + linear-head epilogue params ([D,1]/[Mp,D] f32)
        use_epilogue = model.linear_output
        if use_epilogue:
            w, b = fp.head
            M = w.shape[1]
            Mp = -(-M // 8) * 8
            whead = jnp.pad(w.T.astype(jnp.float32), ((0, Mp - M), (0, 0)))
            bhead = jnp.pad(b.astype(jnp.float32), (0, Mp - M)).reshape(-1, 1)
            epi = (fp.lnf_scale.astype(jnp.float32).reshape(-1, 1),
                   fp.lnf_bias.astype(jnp.float32).reshape(-1, 1),
                   whead, bhead)

    def inner(states, actions, sigma):
        B, T, _ = states.shape
        idx = jnp.argmin(jnp.abs(
            jnp.log(jnp.maximum(sigma[0], 1e-12))
            - jnp.log(jnp.maximum(prefix.sigmas, 1e-12))))

        def dense(x, w, b):
            y = jnp.dot(x.astype(dtype), w.astype(dtype),
                        preferred_element_type=jnp.float32)
            return (y + b).astype(dtype)

        state_x = dense(states, fp.tok_w, fp.tok_b) + fp.pos_emb[:, G:G + T, :]
        action_x = dense(actions, fp.act_w, fp.act_b) + fp.pos_emb[:, G:G + T, :]
        seq = jnp.stack([state_x, action_x], axis=2).reshape(B, 2 * T, D)
        seq = seq.astype(dtype)

        Bp = -(-B // env_block) * env_block
        if Bp != B:
            seq = jnp.pad(seq, ((0, Bp - B), (0, 0), (0, 0)))
        if B_pref != Bp:
            raise ValueError(
                f"prefix cache batch {B_pref} != padded call batch {Bp}")

        T2 = 2 * T
        if token_lanes:
            # [B, 2T, D] -> [nB, D, 2T*E] with lane l = t*E + e; ONE
            # conversion each way per call, all layers stay in-layout
            nB = Bp // env_block
            idx32 = idx.astype(jnp.int32)[None]
            x = (seq.reshape(nB, env_block, T2, D)
                 .transpose(0, 3, 2, 1).reshape(nB, D, T2 * env_block))
            n_layers = len(fp.layers)
            if layer_group > 1:
                from beso_tpu.ops.fused_layer import (
                    fused_layers_prefix_tl_v2_group)

                for lo in range(0, n_layers, layer_group):
                    hi_ = min(lo + layer_group, n_layers)
                    last = hi_ == n_layers
                    out = fused_layers_prefix_tl_v2_group(
                        x, pk_by_layer[lo:hi_], pv_by_layer[lo:hi_],
                        idx32, list(fp.layers[lo:hi_]),
                        n_heads=H, head_dim=hd, suffix_len=T2,
                        approximate_gelu=model.approximate_gelu,
                        qbatch=attn_qbatch,
                        epilogue=epi if (last and use_epilogue) else None,
                        interpret=interpret)
                    x = out[0] if (last and use_epilogue) else out
            else:
                for li, lp in enumerate(fp.layers):
                    last = li == n_layers - 1
                    out = fused_layer_prefix_tl_v2(
                        x, pk_by_layer[li], pv_by_layer[li], idx32, lp,
                        n_heads=H, head_dim=hd, suffix_len=T2,
                        approximate_gelu=model.approximate_gelu,
                        qbatch=attn_qbatch,
                        epilogue=epi if (last and use_epilogue) else None,
                        interpret=interpret)
                    x = out[0] if (last and use_epilogue) else out
            if use_epilogue:
                # pred [nB, Mp, 2T*E] f32 -> [B, T, act]: action slots are
                # the odd suffix tokens
                pred = out[1]
                Mp = pred.shape[1]
                pred = (pred.reshape(nB, Mp, T2, env_block)
                        .transpose(0, 3, 2, 1).reshape(Bp, T2, Mp)[:B])
                pred = pred.reshape(B, T, 2, Mp)[:, :, 1, :model.action_dim]
                return pred
            x = (x.reshape(nB, D, T2, env_block).transpose(0, 3, 2, 1)
                 .reshape(Bp, T2, D)[:B])
        else:
            x = seq.transpose(1, 2, 0)  # [2T, D, B]
            for li, lp in enumerate(fp.layers):
                x = fused_layer_with_prefix(
                    x, pk_all[idx, li], pv_all[idx, li], lp, n_heads=H,
                    head_dim=hd, approximate_gelu=model.approximate_gelu,
                    env_block=env_block, interpret=interpret)
            x = x.transpose(2, 0, 1)[:B]  # [B, 2T, D]

        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = (xf * xf).mean(-1, keepdims=True) - mu * mu
        x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * fp.lnf_scale
             + fp.lnf_bias).astype(dtype)
        x = x.reshape(B, T, 2, D)[:, :, 1, :]
        if model.linear_output:
            w, b = fp.head
            pred = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32)) + b
        else:
            w1, b1, w2, b2 = fp.head
            h = jax.nn.silu(dense(x, w1, b1))
            pred = jnp.dot(h.astype(jnp.float32), w2.astype(jnp.float32)) + b2
        return pred.astype(jnp.float32)

    def dn(states, actions, goals, sigma, **kwargs):
        del goals, kwargs
        c_skip, c_out, c_in = [append_dims(c, actions.ndim)
                               for c in edm_scalings(sigma, den.sigma_data)]
        out = inner(states, actions * c_in, sigma)
        return out * c_out + actions * c_skip

    return dn


def make_fused_denoise_fn(den, params: Any, *, env_block: int = ENV_BLOCK,
                          interpret: Optional[bool] = None):
    """Build `denoise_fn(states, actions, goals, sigma)` == den.apply(...)
    but running the transformer stack through the fused Pallas kernels.

    `interpret=None` auto-selects interpreter mode on CPU backends so tests
    and the virtual-mesh dryrun run unchanged.
    """
    model = den.inner_model
    fp = prepare_fused_gpt(model, params)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def inner_apply(_params, states, actions, goals, sigma, **kwargs):
        return fused_gpt_apply(model, fp, states, actions, goals, sigma,
                               uncond=kwargs.get("uncond", False),
                               env_block=env_block, interpret=interpret)

    def denoise_fn(states, actions, goals, sigma, **kwargs):
        c_skip, c_out, c_in = [append_dims(c, actions.ndim)
                               for c in edm_scalings(sigma, den.sigma_data)]
        out = inner_apply(None, states, actions * c_in, goals, sigma, **kwargs)
        return out * c_out + actions * c_skip

    return denoise_fn
