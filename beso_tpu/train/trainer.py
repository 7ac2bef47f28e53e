"""Training loop: optax optimizers, EMA, eval-MSE, best-checkpoint logic.

Functional parity targets:
* BesoAgent.train_step (`beso_agent.py:215-248`): sigma ~ sample density,
  noise ~ N(0,1), EDM loss, optimizer step, per-step LR schedule, EMA update.
* BesoAgent.evaluate (`beso_agent.py:250-289`): generate with the EMA weights
  over a `num_sampling_steps`-step exponential sigma grid (hardcoded
  exponential, beso_agent.py:272) and report MSE against the ground truth.
* the torch optimizers of the shipped configs: AdamW(lr 1e-4, betas
  (0.9, 0.999), torch-default weight decay 0.01) for kitchen
  (configs/agents/beso_kitchen.yaml:11-14), Adam(lr 1e-4) for block push,
  both under StepLR(step_size=100, gamma=0.99) stepped EVERY train step
  (beso_agent.py:243), i.e. lr(t) = lr0 * 0.99^(t // 100).
* train_agent_on_steps (`beso_agent.py:177-213`): periodic full test-set
  sweep, best-test-MSE checkpointing.

TPU-first design: one jitted `train_step(state, batch, key)`; EMA is part of
the TrainState pytree; multi-device data parallelism shards the batch via
`jax.sharding` (see beso_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from beso_tpu.core.densities import SampleDensity
from beso_tpu.core.schedules import get_sigmas_exponential
from beso_tpu.models.denoiser import GCDenoiser
from beso_tpu.models.ema import EmaState, ema_init, ema_update
from beso_tpu.models.scaler import Scaler
from beso_tpu.sampling.samplers import sample_loop

log = logging.getLogger(__name__)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: EmaState
    step: jnp.ndarray  # int32


def step_lr_schedule(base_lr: float, step_size: int = 100, gamma: float = 0.99):
    """torch.optim.lr_scheduler.StepLR equivalent (stepped every train step)."""

    def schedule(count):
        return base_lr * gamma ** (count // step_size)

    return schedule


def make_optimizer(
    name: str = "adamw",
    lr: float = 1e-4,
    betas: tuple = (0.9, 0.999),
    weight_decay: float = 0.01,
    lr_step_size: int = 100,
    lr_gamma: float = 0.99,
) -> optax.GradientTransformation:
    schedule = step_lr_schedule(lr, lr_step_size, lr_gamma)
    if name == "adamw":
        return optax.adamw(schedule, b1=betas[0], b2=betas[1],
                           weight_decay=weight_decay)
    if name == "adam":
        return optax.adam(schedule, b1=betas[0], b2=betas[1])
    raise ValueError(f"unknown optimizer {name!r}")


def process_batch(batch: dict, scaler: Scaler):
    """Scale a raw batch (base_agent.py:111-142): standardize obs/goal/action;
    zero the non-block dims of 10-dim block-push goals."""
    state = scaler.scale_input(batch["observation"])
    goal = scaler.scale_input(batch["goal_observation"])
    if goal.shape[-1] == 10:
        goal = goal.at[..., jnp.asarray([2, 5, 6, 7, 8, 9])].set(0.0)
    action = scaler.scale_output(batch["action"])
    return state, action, goal


def make_train_step(
    denoiser: GCDenoiser,
    optimizer: optax.GradientTransformation,
    sample_density: SampleDensity,
    scaler: Scaler,
    ema_decay: float = 0.999,
    update_ema_every_n_steps: int = 1,
    pred_last_action_only: bool = False,
    cond_mask_prob: float = 0.0,
):
    """Build the jitted train step (beso_agent.py:215-248)."""

    def loss_fn(params, state_t, action_t, goal_t, noise, sigma, mask_key):
        k_cond, k_drop = jax.random.split(mask_key)
        rngs = {"dropout": k_drop}
        if cond_mask_prob > 0:
            rngs["cond_mask"] = k_cond
        return denoiser.loss(params, state_t, action_t, goal_t, noise, sigma,
                             pred_last_action_only=pred_last_action_only,
                             train=True, rngs=rngs)

    @jax.jit
    def train_step(ts: TrainState, batch: dict, key) -> tuple:
        k_sig, k_noise, k_mask = jax.random.split(key, 3)
        state_t, action_t, goal_t = process_batch(batch, scaler)
        sigma = sample_density(k_sig, (action_t.shape[0],))
        noise = jax.random.normal(k_noise, action_t.shape)
        loss, grads = jax.value_and_grad(loss_fn)(
            ts.params, state_t, action_t, goal_t, noise, sigma, k_mask)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1
        do_ema = (step % update_ema_every_n_steps) == 0
        ema_new = ema_update(ts.ema, params, ema_decay)
        ema = jax.tree.map(
            lambda a, b: jnp.where(do_ema, a, b), ema_new,
            EmaState(ts.ema.params, ts.ema.num_updates))
        return TrainState(params, opt_state, ema, step), loss

    return train_step


def make_fused_train_steps(
    denoiser, optimizer, sample_density, scaler, train_sampler,
    batch_size: int, n_steps: int, **kwargs):
    """Fuse `n_steps` train steps (batch sampling included) into ONE jitted
    lax.scan. The reference's python step loop pays a host round-trip per
    step (beso_agent.py:177-213); on TPU over a network tunnel that latency
    dominates a small model — fusing recovers compute-bound throughput."""
    step_fn = make_train_step(denoiser, optimizer, sample_density, scaler,
                              **kwargs)

    # the dataset arrays ride as jit ARGUMENTS, not closure constants: a
    # large demo set closed over would enter the compile payload and
    # overflow the remote-compile request (HTTP 413 at ~8k kitchen demos)
    arrays = (train_sampler.device_arrays()
              if hasattr(train_sampler, "device_arrays") else None)

    @jax.jit
    def fused(ts: TrainState, key, arrs):
        sampler = (train_sampler.with_arrays(arrs) if arrs is not None
                   else train_sampler)

        def body(ts, k):
            k_batch, k_step = jax.random.split(k)
            batch = sampler.sample_batch(k_batch, batch_size)
            return step_fn(ts, batch, k_step)

        keys = jax.random.split(key, n_steps)
        ts, losses = jax.lax.scan(body, ts, keys)
        return ts, losses

    return lambda ts, key: fused(ts, key, arrays)


def evaluate_mse(
    denoiser: GCDenoiser,
    params,
    batch: dict,
    scaler: Scaler,
    key,
    num_sampling_steps: int = 3,
    sigma_min: float = 0.005,
    sigma_max: float = 1.0,
    sampler_type: str = "ddim",
    pred_last_action_only: bool = False,
):
    """Test-set generation MSE (beso_agent.py:250-289); pass EMA params."""
    state_t, action_t, goal_t = process_batch(batch, scaler)
    sigmas = get_sigmas_exponential(num_sampling_steps, sigma_min, sigma_max)
    x = jax.random.normal(key, action_t.shape) * sigma_max

    def denoise(actions, sigma):
        return denoiser.apply(params, state_t, actions, goal_t, sigma)

    x_0 = sample_loop(sampler_type, denoise, x, sigmas, key)
    if pred_last_action_only:
        return jnp.mean((x_0[:, -1:] - action_t[:, -1:]) ** 2)
    return jnp.mean((x_0 - action_t) ** 2)


@dataclasses.dataclass
class Trainer:
    """Step-based training orchestration (beso_agent.py:177-213)."""

    denoiser: GCDenoiser
    optimizer: optax.GradientTransformation
    sample_density: SampleDensity
    scaler: Scaler
    max_train_steps: int = 1000
    eval_every_n_steps: int = 500
    ema_decay: float = 0.999
    update_ema_every_n_steps: int = 1
    num_sampling_steps: int = 3
    sigma_min: float = 0.005
    sigma_max: float = 1.0
    sampler_type: str = "ddim"
    use_ema: bool = True
    cond_mask_prob: float = 0.0
    pred_last_action_only: bool = False
    checkpoint_dir: Optional[str] = None
    log_every: int = 1000
    metrics_writer: Any = None
    fused_steps: int = 200  # train steps per device program (dispatch
    # amortization: 200 measured +6.6% steps/s over 50 at batch 1024 on
    # v5e — scripts/profile_train.py --scaling; clamped to
    # eval_every_n_steps below)

    def init_state(self, key, sample_batch: dict) -> TrainState:
        state_t, action_t, goal_t = process_batch(sample_batch, self.scaler)
        sigma = jnp.ones((action_t.shape[0],)) * 0.5
        params = self.denoiser.init(key, state_t, action_t, goal_t, sigma)
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            ema=ema_init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def eval_params(self, ts: TrainState):
        return ts.ema.params if self.use_ema else ts.params

    def train(self, ts: TrainState, train_sampler, test_batches_fn,
              key, batch_size: int = 1024) -> TrainState:
        """train_sampler: SlicedDataset-like with .sample_batch(key, n);
        test_batches_fn: () -> iterable of test batches."""
        kwargs = dict(ema_decay=self.ema_decay,
                      update_ema_every_n_steps=self.update_ema_every_n_steps,
                      pred_last_action_only=self.pred_last_action_only,
                      cond_mask_prob=self.cond_mask_prob)
        eval_fn = jax.jit(partial(
            evaluate_mse, self.denoiser, scaler=self.scaler,
            num_sampling_steps=self.num_sampling_steps,
            sigma_min=self.sigma_min, sigma_max=self.sigma_max,
            sampler_type=self.sampler_type,
            pred_last_action_only=self.pred_last_action_only))
        # fused multi-step programs: one device launch per `chunk` steps
        chunk = max(1, min(self.fused_steps, self.eval_every_n_steps))
        fused = make_fused_train_steps(
            self.denoiser, self.optimizer, self.sample_density, self.scaler,
            train_sampler, batch_size, chunk, **kwargs)
        single = make_train_step(self.denoiser, self.optimizer,
                                 self.sample_density, self.scaler, **kwargs)

        best_test_mse = float("inf")
        t0 = time.time()
        step = 0
        while step < self.max_train_steps:
            key, k_chunk = jax.random.split(key)
            if step % self.eval_every_n_steps == 0:
                mses = [float(eval_fn(self.eval_params(ts), batch=b,
                                      key=jax.random.fold_in(key, i)))
                        for i, b in enumerate(test_batches_fn())]
                test_mse = sum(mses) / max(len(mses), 1)
                log.info("step %d: mean test mse %.6f", step, test_mse)
                if self.metrics_writer is not None:
                    self.metrics_writer.log({"test_loss": test_mse}, step=step)
                if test_mse < best_test_mse:
                    best_test_mse = test_mse
                    if self.checkpoint_dir is not None:
                        self.save(ts, self.checkpoint_dir)
                        log.info("new best test loss; checkpoint stored")
            n = min(chunk, self.max_train_steps - step,
                    self.eval_every_n_steps - step % self.eval_every_n_steps)
            if n == chunk:
                ts, losses = fused(ts, k_chunk)
                loss = float(losses[-1])
            else:
                loss = None
                for i in range(n):
                    k_chunk, k_b, k_s = jax.random.split(k_chunk, 3)
                    batch = train_sampler.sample_batch(k_b, batch_size)
                    ts, loss_v = single(ts, batch, k_s)
                    loss = float(loss_v)
            step += n
            if step % self.log_every < n:
                log.info("step %d: batch loss %.6f (%.1f s)", step,
                         loss, time.time() - t0)
            if self.metrics_writer is not None:
                self.metrics_writer.log({"loss": loss}, step=step)
        if self.checkpoint_dir is not None:
            self.save(ts, self.checkpoint_dir, name="final")
        return ts

    def train_on_epochs(self, ts: TrainState, train_sampler, test_batches_fn,
                        key, epochs: int, batch_size: int = 1024,
                        steps_per_epoch: Optional[int] = None,
                        patience: int = 80) -> TrainState:
        """Epoch-mode training with early stopping on test MSE
        (beso_agent.py:130-175 + base_agent.py:144-157: stop after `patience`
        epochs without improvement, checkpointing the best)."""
        kwargs = dict(ema_decay=self.ema_decay,
                      update_ema_every_n_steps=self.update_ema_every_n_steps,
                      pred_last_action_only=self.pred_last_action_only,
                      cond_mask_prob=self.cond_mask_prob)
        eval_fn = jax.jit(partial(
            evaluate_mse, self.denoiser, scaler=self.scaler,
            num_sampling_steps=self.num_sampling_steps,
            sigma_min=self.sigma_min, sigma_max=self.sigma_max,
            sampler_type=self.sampler_type,
            pred_last_action_only=self.pred_last_action_only))
        spe = steps_per_epoch or max(1, len(train_sampler) // batch_size)
        fused = make_fused_train_steps(
            self.denoiser, self.optimizer, self.sample_density, self.scaler,
            train_sampler, batch_size, spe, **kwargs)

        best_test_mse = float("inf")
        epochs_no_improvement = 0
        for epoch in range(epochs):
            key, k_ep = jax.random.split(key)
            mses = [float(eval_fn(self.eval_params(ts), batch=b,
                                  key=jax.random.fold_in(key, i)))
                    for i, b in enumerate(test_batches_fn())]
            test_mse = sum(mses) / max(len(mses), 1)
            if test_mse < best_test_mse:
                best_test_mse = test_mse
                epochs_no_improvement = 0
                if self.checkpoint_dir is not None:
                    self.save(ts, self.checkpoint_dir)
            else:
                epochs_no_improvement += 1
            if epochs_no_improvement > patience:
                log.info("Early stopping!")
                break
            ts, losses = fused(ts, k_ep)
            log.info("Epoch %d: mean test mse %.6f, train loss %.6f",
                     epoch, test_mse, float(losses[-1]))
            if self.metrics_writer is not None:
                self.metrics_writer.log(
                    {"epoch_loss": float(jnp.mean(losses)),
                     "epoch_test_loss": test_mse, "epoch": epoch})
        return ts

    def save(self, ts: TrainState, directory: str, name: str = "best"):
        from beso_tpu.train.checkpoint import save_train_state

        save_train_state(ts, directory, name)

    def restore(self, ts_template: TrainState, directory: str,
                name: str = "best") -> TrainState:
        from beso_tpu.train.checkpoint import restore_train_state

        return restore_train_state(ts_template, directory, name)
