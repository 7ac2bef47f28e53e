"""Franka Kitchen workspace: data wiring + batched evaluation + metrics.

Functional parity target: `FrankaKitchenManager`
(`beso/workspaces/kitchen_workspace_manager.py:27-708`):
* builds kitchen datasets + Scaler + train/test streams (:137-167),
* multigoal evaluation: eval_n_times episodes x eval_n_steps steps against
  dataset-tail goals; result = |completed ∩ expected| (:213-316, 527-578),
* sequential evaluation: 4 sub-goals with per-goal time budgets (:318-423),
* compute_performance: avg/std reward+result, Cond_success_ratio,
  success-rate-at-1..5, per-task solved/expected counts, trajectory
  multimodality census and the task-transition tree with conditional
  probabilities (:425-498, 596-708).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.data.slicer import SlicedDataset
from beso_tpu.data.trajectories import (TrajectoryData, load_relay_kitchen,
                                        split_trajectories,
                                        synthetic_kitchen_data)
from beso_tpu.envs.kitchen.goals import (ALL_TASKS, multigoal_kitchen_goals,
                                         sequential_kitchen_goals)
from beso_tpu.models.scaler import fit_scaler
from beso_tpu.rollout.rollout import rollout_kitchen, success_rate_histogram
from beso_tpu.rollout.sequential import rollout_kitchen_sequential
from beso_tpu.workspaces.base import BaseWorkspace

log = logging.getLogger(__name__)


class FrankaKitchenWorkspace(BaseWorkspace):
    def __init__(self, seed: int = 42, data_path: Optional[str] = None,
                 eval_n_times: int = 100, eval_n_steps: int = 280,
                 scale_data: bool = False, window_size: int = 4,
                 goal_seq_len: int = 2, min_future_sep: int = 0,
                 train_fraction: float = 0.95, metrics_writer=None,
                 data: Optional[TrajectoryData] = None):
        self.seed = seed
        self.eval_n_times = eval_n_times
        self.eval_n_steps = eval_n_steps
        self.goal_seq_len = goal_seq_len
        self.train_fraction = train_fraction
        self.metrics_writer = metrics_writer

        if data is not None:
            self.full_data = data
        elif data_path is not None:
            self.full_data = load_relay_kitchen(data_path, onehot_goals=True)
        else:  # datasets not vendored (osf.io/q3dx2) — synthetic stand-in
            log.warning("no kitchen data_path given: using synthetic data")
            self.full_data = synthetic_kitchen_data(n_traj=64, t_max=120,
                                                    seed=seed)
        train, test = split_trajectories(self.full_data, seed=seed,
                                         train_fraction=train_fraction)
        slicer_kw = dict(window=window_size, future_conditional=True,
                         future_seq_len=goal_seq_len,
                         min_future_sep=min_future_sep)
        self.train_set = SlicedDataset(train, **slicer_kw)
        self.test_set = SlicedDataset(test, **slicer_kw)
        # Scaler over the TRAIN split (kitchen_workspace_manager.py:144-147)
        self.scaler = fit_scaler(train.all_observations(), train.all_actions(),
                                 scale_data=scale_data)
        self.data_loader = {"train": self.train_set, "test": self.test_set}

    # -- evaluation ----------------------------------------------------------
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
                   evaluate_sequential: bool = False, key=None,
                   extra_args=None, log_metrics: bool = True,
                   physics_params=None, start_from_known: bool = False,
                   init_qpos=None, **overrides):
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        mg = seq = None
        if evaluate_multigoal:
            mg = self.test_agent_on_multigoal(agent, key=key,
                                              extra_args=extra_args,
                                              log_metrics=log_metrics,
                                              physics_params=physics_params,
                                              start_from_known=start_from_known,
                                              init_qpos=init_qpos,
                                              **overrides)
        if evaluate_sequential:
            seq = self.test_agent_on_sequential_tasks(agent, key=key,
                                                      extra_args=extra_args,
                                                      log_metrics=log_metrics,
                                                      physics_params=physics_params,
                                                      **overrides)
        if evaluate_multigoal and evaluate_sequential:
            return mg, seq
        return mg if mg is not None else seq

    def test_agent_on_multigoal(self, agent, key=None, extra_args=None,
                                log_metrics: bool = True,
                                physics_params=None,
                                start_from_known: bool = False,
                                init_qpos=None, **overrides):
        """Multigoal evaluation. `physics_params` evaluates under perturbed
        surrogate physics (robustness protocol). `start_from_known=True`
        starts each episode from a known demo configuration — the reference's
        `_setup_starting_state`/`_start_from_known`
        (kitchen_workspace_manager.py:500-525): pass `init_qpos` [N, 30]
        (e.g. from envs.kitchen.env.load_init_qpos) or the dataset's first
        frames are used."""
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        goals, expected = multigoal_kitchen_goals(
            self.full_data, self.goal_seq_len, self.eval_n_times,
            self.seed, self.train_fraction)
        starts = None
        if start_from_known:
            pool = (np.asarray(init_qpos) if init_qpos is not None
                    else np.asarray(self.full_data.observations[:, 0, :30]))
            starts = jnp.asarray(
                pool[np.arange(self.eval_n_times) % len(pool)])
        cfg = self._policy_cfg(agent, extra_args=extra_args, **overrides)
        denoise = agent.make_denoise_fn()
        factory = agent.make_denoise_factory(cfg)
        metrics = jax.jit(
            lambda k: rollout_kitchen(denoise, agent.scaler, cfg,
                                      jnp.asarray(goals), jnp.asarray(expected),
                                      k, n_steps=self.eval_n_steps,
                                      physics_params=physics_params,
                                      init_qpos=starts,
                                      denoise_factory=factory)
        )(key)
        return self.compute_performance(metrics, expected, "multigoal",
                                        log_metrics)

    def test_agent_on_sequential_tasks(self, agent, key=None, extra_args=None,
                                       log_metrics: bool = True,
                                       physics_params=None,
                                       budget_margin: int = 50, **overrides):
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        goals, timeframes, task_ids, expected = sequential_kitchen_goals(
            self.full_data, self.goal_seq_len, self.eval_n_times, self.seed,
            self.train_fraction)
        cfg = self._policy_cfg(agent, extra_args=extra_args, **overrides)
        denoise = agent.make_denoise_fn()
        metrics = jax.jit(
            lambda k: rollout_kitchen_sequential(
                denoise, agent.scaler, cfg, jnp.asarray(goals),
                jnp.asarray(timeframes), jnp.asarray(task_ids),
                jnp.asarray(expected), k, n_steps=self.eval_n_steps,
                physics_params=physics_params,
                budget_margin=budget_margin)
        )(key)
        return self.compute_performance(metrics, expected, "sequential",
                                        log_metrics)

    # -- metrics -------------------------------------------------------------
    def compute_performance(self, metrics, expected: np.ndarray,
                            eval_type: str, log_metrics: bool = True) -> dict:
        rewards = np.asarray(metrics.rewards)
        results = np.asarray(metrics.results)
        completed = np.asarray(metrics.completed)
        out = {
            "avrg_reward": float(rewards.mean()),
            "std_reward": float(rewards.std()),
            "avrg_result": float(results.mean()),
            "std_result": float(results.std()),
        }
        out["cond_success_ratio"] = out["avrg_result"] / (out["avrg_reward"] + 1e-6)
        out.update(success_rate_histogram(completed.sum(-1)))
        # per-task solved/expected counts (kitchen_workspace_manager.py:571-576)
        solved = {f"n_{t}": int(completed[:, i].sum())
                  for i, t in enumerate(ALL_TASKS)}
        exp_counts = {f"n_{t}": int(np.asarray(expected)[:, i].sum())
                      for i, t in enumerate(ALL_TASKS)}
        out["solved_tasks"] = solved
        out["expected_tasks"] = exp_counts
        out["traj_count"] = self.trajectory_census(metrics)
        out["task_tree"] = self.get_state_transitions(out["traj_count"])
        if log_metrics:
            log.info("[%s] avg reward %.3f +- %.3f | avg result %.3f +- %.3f",
                     eval_type, out["avrg_reward"], out["std_reward"],
                     out["avrg_result"], out["std_result"])
            for k in range(1, 6):
                log.info("Success rate %d: %.3f", k, out[f"success_rate_{k}"])
            if self.metrics_writer is not None:
                self.metrics_writer.log({
                    f"{eval_type}/Average_reward": out["avrg_reward"],
                    f"{eval_type}/Average_result": out["avrg_result"],
                    f"{eval_type}/Cond_success_ratio": out["cond_success_ratio"],
                })
        return out

    @staticmethod
    def trajectory_census(metrics) -> dict:
        """Counts of completed-task sequences keyed in COMPLETION ORDER —
        the reference census key is ', '.join(all_completions) in the order
        tasks were finished (kitchen_workspace_manager.py:564-570), which
        feeds the conditional-probability task tree. Episodes that complete
        {microwave, kettle} in opposite orders produce distinct keys."""
        completed = np.asarray(metrics.completed)
        order = np.asarray(metrics.completion_order)
        census: dict = {}
        for b in range(completed.shape[0]):
            done_idx = [i for i in range(completed.shape[1]) if completed[b, i]]
            done_idx.sort(key=lambda i: int(order[b, i]))
            key = ", ".join(ALL_TASKS[i] for i in done_idx)
            census[key] = census.get(key, 0) + 1
        return census

    @staticmethod
    def get_state_transitions(traj_count: dict) -> dict:
        """Task-transition tree with conditional probabilities
        (kitchen_workspace_manager.py:637-708), up to depth 4."""
        tree: dict = {}
        total = sum(traj_count.values()) or 1
        for traj, count in traj_count.items():
            tasks = [t.strip() for t in traj.split(",") if t.strip()][:4]
            node = tree
            for task in tasks:
                node = node.setdefault(task, {"count": 0})
                node["count"] += count

        def annotate(node: dict, parent_count: int):
            for k, child in node.items():
                if k in ("count", "prob"):
                    continue
                child["prob"] = child["count"] / max(parent_count, 1)
                annotate(child, child["count"])

        annotate(tree, total)
        return tree
