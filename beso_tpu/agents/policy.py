"""Pure-function policy prediction with rolling obs/action context.

Functional parity target: BesoAgent.predict + reset
(`beso/agents/diffusion_agents/beso_agent.py:291-388`):

* an observation deque of size `window_size` and an action deque of size
  `window_size - 1` (beso_agent.py:97-100) provide the transformer context,
* fresh noise x ~ N(0, sigma_max^2) is drawn ONLY for the newest action
  token; prior predicted actions are concatenated as context
  (beso_agent.py:352-362),
* the sampler integrates the FULL action-token tensor, the last action of the
  result is kept (beso_agent.py:373-374), clipped to 1.1x action bounds and
  inverse-scaled (beso_agent.py:378-383); the clipped-scaled value is what
  enters the action context for the next step (beso_agent.py:387).

TPU-first design: the deques become a fixed-shape left-aligned buffer + fill
counter carried through `lax.scan`. While the buffer is partially filled, the
padding slots sit to the RIGHT of the real tokens, so the causal attention
mask guarantees they cannot influence the read-out slot — bitwise equivalence
with the reference's variable-length context at static shape. EMA weights are
simply a second parameter tree (no store/copy_to/restore dance).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from beso_tpu.core.schedules import get_noise_schedule
from beso_tpu.models.cfg import cfg_denoise_fn
from beso_tpu.models.scaler import Scaler
from beso_tpu.sampling.samplers import sample_loop


class PolicyState(NamedTuple):
    """Rolling context carried across env steps (vmap-friendly pytree)."""

    obs_buf: jnp.ndarray   # [B, W, obs_dim] left-aligned window
    act_buf: jnp.ndarray   # [B, W, act_dim] left-aligned; slot t-1 = newest
    count: jnp.ndarray     # [B] int32 number of observations seen


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    """Inference-time knobs (subset of BesoAgent's ctor args)."""

    window_size: int
    obs_dim: int
    action_dim: int
    sampler_type: str = "ddim"
    num_sampling_steps: int = 3
    sigma_min: float = 0.005
    sigma_max: float = 1.0
    sigma_data: float = 0.5
    rho: float = 5.0
    noise_scheduler: str = "exponential"
    cond_lambda: float = 1.0  # >1/<1 wraps the model in CFG
    s_churn: float = 0.0
    s_tmin: float = 0.0
    # multi-sample action selection (reference: get_mean/use_kde,
    # beso_agent.py:352-368 — the torch aggregation path is incomplete;
    # this is the working equivalent)
    n_action_samples: int = 1
    aggregation: str = "single"  # 'single' | 'mean' | 'kde'
    # sampler_type='picard' runs Picard parallel sampling
    # (sampling/parallel.py): K sweeps of one [n*B]-batched denoise each
    # instead of n sequential calls — for long sigma grids
    picard_update: str = "ddim"          # 'ddim' | 'euler'
    picard_iterations: Optional[int] = None  # None = n (exact)


def scale_goal_for_model(scaler: Scaler, goal: jnp.ndarray) -> jnp.ndarray:
    """Goal preprocessing shared by policy_predict and the prefix-cache
    factory: scale, then zero the non-block dims of 10-dim block-push goals
    (base_agent.py:119-120)."""
    goal_s = scaler.scale_input(goal)
    if goal_s.shape[-1] == 10:
        goal_s = goal_s.at[..., jnp.asarray([2, 5, 6, 7, 8, 9])].set(0.0)
    return goal_s


def policy_reset(batch_size: int, cfg: PolicyConfig) -> PolicyState:
    """Clear the rolling contexts (beso_agent.py:291-294)."""
    return PolicyState(
        obs_buf=jnp.zeros((batch_size, cfg.window_size, cfg.obs_dim)),
        act_buf=jnp.zeros((batch_size, cfg.window_size, cfg.action_dim)),
        count=jnp.zeros((batch_size,), jnp.int32),
    )


def _append_window(buf: jnp.ndarray, item: jnp.ndarray, count: jnp.ndarray,
                   width: int) -> jnp.ndarray:
    """Left-aligned deque append: write at slot `count` while filling, else
    shift left and write at the last slot."""
    B = buf.shape[0]
    shifted = jnp.roll(buf, -1, axis=1)
    full = count >= width                      # [B]
    base = jnp.where(full[:, None, None], shifted, buf)
    slot = jnp.minimum(count, width - 1)       # [B]
    return base.at[jnp.arange(B), slot].set(item)


def _kde_select(cands: jnp.ndarray) -> jnp.ndarray:
    """Pick the max-density sample per env via a gaussian KDE over the
    candidate set (Scott's-rule bandwidth). cands: [B, n, d] -> [B, d]."""
    B, n, d = cands.shape
    std = jnp.std(cands, axis=1, keepdims=True).mean(axis=-1, keepdims=True)
    h = jnp.maximum(std * n ** (-1.0 / (d + 4)), 1e-6)       # [B, 1, 1]
    diff = cands[:, :, None, :] - cands[:, None, :, :]        # [B, n, n, d]
    sq = jnp.sum(diff ** 2, axis=-1)                          # [B, n, n]
    dens = jnp.sum(jnp.exp(-0.5 * sq / (h ** 2)), axis=-1)    # h broadcasts
    best = jnp.argmax(dens, axis=-1)                          # [B]
    return jnp.take_along_axis(cands, best[:, None, None], axis=1)[:, 0]


def policy_predict(
    denoise: Callable[..., jnp.ndarray],
    scaler: Scaler,
    state: PolicyState,
    obs: jnp.ndarray,        # [B, obs_dim] raw (unscaled) observation
    goal: jnp.ndarray,       # [B, G, goal_dim] raw goal
    key,
    cfg: PolicyConfig,
    extra_args: Optional[dict] = None,
):
    """One control step: returns (action [B, act_dim] env units, new_state).

    `denoise(states, actions, goals, sigma)` must be the EMA-weighted
    preconditioned denoiser (e.g. partial(GCDenoiser.apply, ema_params)).
    """
    extra_args = extra_args or {}
    B = obs.shape[0]
    W = cfg.window_size

    # process_batch: scale inputs; 10-dim block-push goals get their
    # non-block dims zeroed (base_agent.py:119-120)
    obs_s = scaler.scale_input(obs)
    goal_s = scale_goal_for_model(scaler, goal)

    obs_buf = _append_window(state.obs_buf, obs_s, state.count, W)
    count = state.count + 1
    t_eff = jnp.minimum(count, W)              # current context length [B]

    # fresh noise for ONLY the newest action token (beso_agent.py:352-362)
    n_samp = max(1, cfg.n_action_samples)
    newest = jnp.minimum(count - 1, W - 1)
    x = state.act_buf
    if n_samp > 1:
        # draw n_samp candidate actions per env in one batched denoise
        x = jnp.repeat(x, n_samp, axis=0)
        obs_in = jnp.repeat(obs_buf, n_samp, axis=0)
        goal_in = jnp.repeat(goal_s, n_samp, axis=0)
        newest_in = jnp.repeat(newest, n_samp, axis=0)
    else:
        obs_in, goal_in, newest_in = obs_buf, goal_s, newest
    Bn = B * n_samp
    noise = jax.random.normal(key, (Bn, cfg.action_dim)) * cfg.sigma_max
    x = x.at[jnp.arange(Bn), newest_in].set(noise)

    sigmas = get_noise_schedule(cfg.num_sampling_steps, cfg.sigma_min,
                                cfg.sigma_max, cfg.rho, cfg.noise_scheduler)
    dn = cfg_denoise_fn(denoise, cfg.cond_lambda)

    def dn_xa(actions, sigma):
        return dn(obs_in, actions, goal_in, sigma)

    if cfg.sampler_type == "picard":
        from beso_tpu.sampling.parallel import sample_picard

        def dn_tiled(actions, sigma):
            # conditioning tiled over the folded [n_grid * B] batch axis
            reps = actions.shape[0] // Bn
            return dn(jnp.tile(obs_in, (reps, 1, 1)), actions,
                      jnp.tile(goal_in, (reps, 1, 1)), sigma)

        x0 = sample_picard(dn_tiled, x, sigmas, key,
                           update=cfg.picard_update,
                           n_iterations=cfg.picard_iterations)
    else:
        x0 = sample_loop(cfg.sampler_type, dn_xa, x, sigmas, key,
                         s_churn=extra_args.get("s_churn", cfg.s_churn),
                         s_tmin=extra_args.get("s_min", cfg.s_tmin))

    # keep only the newest action slot (beso_agent.py:373-374)
    a_scaled = x0[jnp.arange(Bn), newest_in]
    if n_samp > 1:
        cands = a_scaled.reshape(B, n_samp, cfg.action_dim)
        if cfg.aggregation == "mean":
            a_scaled = jnp.mean(cands, axis=1)
        elif cfg.aggregation == "kde":
            a_scaled = _kde_select(cands)
        else:  # 'single'
            a_scaled = cands[:, 0]
    a_scaled = scaler.clip_action(a_scaled)
    action = scaler.inverse_scale_output(a_scaled)

    # queue the clipped scaled action as next-step context (beso_agent.py:387)
    act_buf = state.act_buf.at[jnp.arange(B), newest].set(a_scaled)
    # when the obs window is full the action window shifts with it
    shifted = jnp.roll(act_buf, -1, axis=1)
    act_buf = jnp.where((count >= W)[:, None, None], shifted, act_buf)

    return action, PolicyState(obs_buf=obs_buf, act_buf=act_buf, count=count)
