"""Block Push workspace: data wiring + batched evaluation + metrics.

Functional parity target: `BlockPushingManager`
(`beso/workspaces/block_push_workspace.py:21-240`):
* MinMaxScaler over the train split (or standard Scaler; the reference's
  non-minmax branch is a NameError, block_push_workspace.py:68 — fixed here),
* evaluation: eval_n_times episodes x eval_n_steps steps in
  BlockPushMultimodal, obs 16 -> first 10 dims when reduce_obs_dim,
* result = |completed ∩ expected| / 2 in {0, 0.5, 1} (:218-240).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.data.slicer import SlicedDataset
from beso_tpu.data.transforms import blockpush_mask_targets
from beso_tpu.data.trajectories import (load_multimodal_push,
                                        split_trajectories,
                                        synthetic_push_data)
from beso_tpu.envs.block_push.goals import block_push_goal_frames
from beso_tpu.models.scaler import fit_minmax_scaler, fit_scaler
from beso_tpu.rollout.rollout import rollout_block_push
from beso_tpu.workspaces.base import BaseWorkspace

log = logging.getLogger(__name__)


class BlockPushWorkspace(BaseWorkspace):
    def __init__(self, seed: int = 6, data_path: Optional[str] = None,
                 eval_n_times: int = 100, eval_n_steps: int = 300,
                 scale_data: bool = True, window_size: int = 5,
                 goal_seq_len: int = 1, use_minmax_scaler: bool = True,
                 mask_targets: bool = False, reduce_obs_dim: bool = True,
                 train_fraction: float = 0.95, metrics_writer=None,
                 data=None):
        self.seed = seed
        self.eval_n_times = eval_n_times
        self.eval_n_steps = eval_n_steps
        self.goal_seq_len = goal_seq_len
        self.train_fraction = train_fraction
        self.mask_targets = mask_targets
        self.reduce_obs_dim = reduce_obs_dim
        self.metrics_writer = metrics_writer

        if data is not None:
            self.full_data = data
        elif data_path is not None:
            # goal fns need the FULL 16-dim obs (flip fix reads targets)
            self.full_data = load_multimodal_push(data_path, onehot_goals=True,
                                                  reduce_obs_dim=False)
        else:
            log.warning("no block-push data_path given: using synthetic data")
            self.full_data = synthetic_push_data(n_traj=64, t_max=100, seed=seed)

        train, test = split_trajectories(self.full_data, seed=seed,
                                         train_fraction=train_fraction)
        transform = blockpush_mask_targets(mask_targets, reduce_obs_dim)

        def reduced(data):
            if not reduce_obs_dim:
                return data
            import dataclasses
            return dataclasses.replace(
                data, observations=data.observations[..., :10])

        slicer_kw = dict(window=window_size, future_conditional=True,
                         future_seq_len=goal_seq_len, transform=transform)
        self.train_set = SlicedDataset(reduced(train), **slicer_kw)
        self.test_set = SlicedDataset(reduced(test), **slicer_kw)
        fit = fit_minmax_scaler if use_minmax_scaler else fit_scaler
        self.scaler = fit(reduced(train).all_observations(),
                          train.all_actions(), scale_data=scale_data)
        self.data_loader = {"train": self.train_set, "test": self.test_set}

    def _policy_cfg(self, agent, new_sampler_type=None, n_inference_steps=None,
                    noise_scheduler=None, cond_lambda=None, get_mean=None,
                    aggregation=None, extra_args=None):
        extra_args = extra_args or {}
        return agent.policy_config(
            sampler_type=new_sampler_type,
            num_sampling_steps=n_inference_steps,
            noise_scheduler=noise_scheduler,
            cond_lambda=cond_lambda,
            n_action_samples=get_mean,
            aggregation=aggregation,
            s_churn=extra_args.get("s_churn"),
            s_tmin=extra_args.get("s_min"),
        )

    def test_agent(self, agent, evaluate_multigoal: bool = True,
                   evaluate_sequential: bool = True, key=None,
                   extra_args=None, log_metrics: bool = True, **overrides):
        # evaluate_multigoal/evaluate_sequential are accepted and ignored,
        # matching the reference's own signature quirk ("just for same input
        # as kitchen environment", block_push_workspace.py:90-99) — block
        # push has a single eval protocol.
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        frames, expected = block_push_goal_frames(
            self.full_data, self.eval_n_times, self.seed, self.train_fraction)
        cfg = self._policy_cfg(agent, extra_args=extra_args, **overrides)
        denoise = agent.make_denoise_fn()
        factory = agent.make_denoise_factory(cfg)
        metrics = jax.jit(
            lambda k: rollout_block_push(
                denoise, agent.scaler, cfg, jnp.asarray(frames),
                jnp.asarray(expected), k, n_steps=self.eval_n_steps,
                goal_seq_len=self.goal_seq_len,
                reduce_obs_dim=self.reduce_obs_dim,
                mask_targets=self.mask_targets,
                denoise_factory=factory)
        )(key)
        rewards = np.asarray(metrics.rewards)
        results = np.asarray(metrics.results)
        out = {
            "avrg_reward": float(rewards.mean()),
            "std_reward": float(rewards.std()),
            "avrg_result": float(results.mean()),
            "std_result": float(results.std()),
            "cond_success_ratio": float(results.mean() / (rewards.mean() + 1e-6)),
        }
        if log_metrics:
            log.info("avg reward %.3f +- %.3f | avg result %.3f +- %.3f",
                     out["avrg_reward"], out["std_reward"],
                     out["avrg_result"], out["std_result"])
            if self.metrics_writer is not None:
                self.metrics_writer.log({
                    "Average_reward": out["avrg_reward"],
                    "Average_result": out["avrg_result"],
                    "Cond_success_ratio": out["cond_success_ratio"],
                })
        return out
