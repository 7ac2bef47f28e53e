"""Vmapped multi-seed sweep training: N seeds in one jitted program.

Reference equivalent: Hydra `--multirun seed=1,...,10` (README.md:94-98)
launches N separate *processes*, each training one model on one GPU. The
TPU-native redesign trains all N seeds SIMULTANEOUSLY by vmapping the train
step over a leading seed axis of the TrainState: one compiled program, one
device, N models. BESO's models are small (2.8-9.5M params), so even 10
stacked replicas fit comfortably in HBM; measured on v5e, per-seed step
throughput at 8 stacked seeds stays within ~15% of a single run (batch 1024
already fills the MXU — the win is one program/one compile instead of N
processes, plus the option to shard the seed axis across a device mesh).

Each seed gets an independent parameter init, its own data-shuffling and
sigma/noise streams (per-seed RNG keys), exactly like N separate runs.

Non-seed parameter grids (lr, sampler, ...) change static model/optimizer
structure and cannot share one program — scripts/sweep.py loops those and
vmaps the seed axis inside each cell.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from beso_tpu.models.ema import ema_init
from beso_tpu.train.trainer import (TrainState, evaluate_mse, make_train_step,
                                    process_batch)

log = logging.getLogger(__name__)


def init_sweep_state(denoiser, optimizer, sample_batch: dict, scaler,
                     seeds) -> TrainState:
    """Stacked TrainState with a leading seed axis: params[i] initialized
    from PRNGKey(seeds[i])."""
    state_t, action_t, goal_t = process_batch(sample_batch, scaler)
    sigma = jnp.ones((action_t.shape[0],)) * 0.5

    def init_one(seed):
        params = denoiser.init(jax.random.PRNGKey(seed), state_t, action_t,
                               goal_t, sigma)
        return TrainState(params=params, opt_state=optimizer.init(params),
                          ema=ema_init(params),
                          step=jnp.zeros((), jnp.int32))

    return jax.vmap(init_one)(jnp.asarray(seeds))


def make_sweep_train_steps(
    denoiser, optimizer, sample_density, scaler, train_sampler,
    batch_size: int, n_steps: int, **kwargs,
) -> Callable:
    """Fused (scan) + vmapped (seed axis) train steps: ONE jitted call runs
    `n_steps` steps for every seed. Returns
    `fused(ts_stacked, keys [S]) -> (ts_stacked, losses [S, n_steps])`."""
    step_fn = make_train_step(denoiser, optimizer, sample_density, scaler,
                              **kwargs)

    def one_seed(ts: TrainState, key):
        def body(ts, k):
            k_batch, k_step = jax.random.split(k)
            batch = train_sampler.sample_batch(k_batch, batch_size)
            return step_fn(ts, batch, k_step)

        keys = jax.random.split(key, n_steps)
        return jax.lax.scan(body, ts, keys)

    @jax.jit
    def fused(ts_stacked: TrainState, keys):
        return jax.vmap(one_seed)(ts_stacked, keys)

    return fused


def sweep_eval_mse(denoiser, ts_stacked: TrainState, batch: dict, scaler,
                   key, use_ema: bool = True, **eval_kwargs) -> jnp.ndarray:
    """Per-seed test MSE [S] on one shared batch (beso_agent.py:250-289)."""
    params = ts_stacked.ema.params if use_ema else ts_stacked.params
    S = jax.tree.leaves(params)[0].shape[0]

    def one(p, k):
        return evaluate_mse(denoiser, p, batch, scaler, k, **eval_kwargs)

    return jax.vmap(one)(params, jax.random.split(key, S))


def seed_state(ts_stacked: TrainState, i: int) -> TrainState:
    """Extract seed i's TrainState from the stacked sweep state."""
    return jax.tree.map(lambda x: x[i], ts_stacked)


def shard_sweep_state(ts_stacked: TrainState, mesh, axis: str = "dp"):
    """Distribute the seed axis over a device mesh: each device (group)
    trains its seed subset — the multi-chip form of the vmapped sweep.
    The per-seed programs are independent, so XLA partitions the vmapped
    train step along the seed axis with zero cross-device traffic. The
    seed count must be divisible by the mesh axis size."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    S = jax.tree.leaves(ts_stacked.params)[0].shape[0]
    n = mesh.shape[axis]
    if S % n:
        raise ValueError(f"{S} seeds not divisible over {n} '{axis}' devices")
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), ts_stacked)


def run_sweep(
    denoiser, optimizer, sample_density, scaler, train_sampler,
    test_batch: dict, seeds, *, batch_size: int = 1024,
    max_train_steps: int = 1000, eval_every_n_steps: int = 500,
    fused_steps: int = 50, key=None, use_ema: bool = True,
    num_sampling_steps: int = 3, sigma_min: float = 0.005,
    sigma_max: float = 1.0, sampler_type: str = "ddim",
    metrics_cb: Optional[Callable[[int, Any], None]] = None,
    **train_kwargs,
):
    """Train all seeds to max_train_steps; returns (ts_stacked, history).

    history: list of (step, per-seed train loss [S], per-seed test MSE [S]).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    seeds = list(seeds)
    sample_batch = train_sampler.sample_batch(jax.random.PRNGKey(0),
                                              min(batch_size, 64))
    ts = init_sweep_state(denoiser, optimizer, sample_batch, scaler, seeds)
    n_params = sum(x.size for x in jax.tree.leaves(seed_state(ts, 0).params))
    log.info("sweep: %d seeds x %d params, %d steps", len(seeds), n_params,
             max_train_steps)

    history = []
    step = 0
    # per-call cache of fused multi-step programs keyed on the only traced
    # shape parameters; scoped here (not module-global) so a finished sweep
    # cell's closures/executables can be garbage-collected (ADVICE r2)
    fused_cache: dict = {}
    while step < max_train_steps:
        to_eval = eval_every_n_steps - (step % eval_every_n_steps)
        n = min(fused_steps, to_eval, max_train_steps - step)
        if (batch_size, n) not in fused_cache:
            fused_cache[(batch_size, n)] = make_sweep_train_steps(
                denoiser, optimizer, sample_density, scaler, train_sampler,
                batch_size, n, **train_kwargs)
        fused = fused_cache[(batch_size, n)]
        key, k_run = jax.random.split(key)
        ts, losses = fused(ts, jax.random.split(k_run, len(seeds)))
        step += n
        if step % eval_every_n_steps == 0 or step >= max_train_steps:
            key, k_eval = jax.random.split(key)
            mse = sweep_eval_mse(denoiser, ts, test_batch, scaler, k_eval,
                                 use_ema=use_ema,
                                 num_sampling_steps=num_sampling_steps,
                                 sigma_min=sigma_min, sigma_max=sigma_max,
                                 sampler_type=sampler_type)
            entry = (step, jax.device_get(losses[:, -1]), jax.device_get(mse))
            history.append(entry)
            log.info("sweep step %d: loss %s | test MSE %s", step,
                     [f"{x:.4f}" for x in entry[1]],
                     [f"{x:.4f}" for x in entry[2]])
            if metrics_cb is not None:
                metrics_cb(step, entry)
    return ts, history
