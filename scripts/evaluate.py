"""Evaluation CLI for trained checkpoints.

Functional parity target: `scripts/evaluate.py:20-128` of the reference:
reload the stored run config from `<model_store_path>/config.yaml`, rebuild
workspace + agent, load weights, override sigma-range/sampler/steps from the
eval config, and dispatch one of 5 study modes:
  test_single_variant | test_all_samplers |
  compare_samplers_over_diffent_steps [sic] |
  compare_classifier_free_guidance | compare_noisy_sampler.

Usage:
    python scripts/evaluate.py --config configs/evaluate_kitchen.yaml \
        [model_store_path=logs/.../run num_runs=100 ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s [%(levelname)s] %(message)s")

    from beso_tpu.agents.beso_agent import BesoAgent
    from beso_tpu.utils.config import load_config
    from scripts.training import build_agent_config, build_workspace

    eval_cfg = load_config(args.config, args.overrides)
    store = Path(eval_cfg["model_store_path"])
    # config round-trip: rebuild the exact trained model (evaluate.py:33-47)
    model_cfg = load_config(store / "config.yaml")

    workspace = build_workspace(model_cfg)
    agent_cfg = build_agent_config(model_cfg)
    # sigma-range override from the eval config (evaluate.py:49-50)
    agent_cfg = dataclasses.replace(
        agent_cfg,
        sigma_min=eval_cfg.get("sigma_min", agent_cfg.sigma_min),
        sigma_max=eval_cfg.get("sigma_max", agent_cfg.sigma_max))
    agent = BesoAgent(agent_cfg, workspace.scaler)

    key = jax.random.PRNGKey(eval_cfg.get("seed", model_cfg["seed"]))
    k_init, k_eval = jax.random.split(key)
    sample_batch = workspace.train_set.sample_batch(k_init, 8)
    agent.init(k_init, sample_batch)
    agent.load_pretrained_model(str(store))

    # CFG wrap when trained with goal dropout (evaluate.py:57-61)
    cond_lambda = (eval_cfg.get("cond_lambda", 1.0)
                   if model_cfg.get("cond_mask_prob", 0) > 0 else None)
    common = dict(
        new_sampler_type=eval_cfg.get("sampler_type"),
        n_inference_steps=eval_cfg.get("n_inference_steps"),
        noise_scheduler=eval_cfg.get("noise_scheduler"),
        cond_lambda=cond_lambda,
        # multi-sample action selection (reference get_mean/use_kde knobs)
        get_mean=eval_cfg.get("n_action_samples"),
        aggregation=eval_cfg.get("aggregation"),
    )
    num_runs = eval_cfg.get("num_runs", 100)
    num_steps = eval_cfg.get("num_steps_per_run", workspace.eval_n_steps)
    store_path = eval_cfg.get("store_path")

    if eval_cfg.get("test_all_samplers"):
        out = workspace.compare_sampler_types(
            agent, num_runs, num_steps,
            n_inference_steps=eval_cfg.get("n_inference_steps"),
            store_path=store_path)
    elif eval_cfg.get("compare_samplers_over_diffent_steps"):
        out = workspace.compare_sampler_types_over_n_steps(
            agent, num_runs, num_steps, store_path=store_path)
    elif eval_cfg.get("compare_classifier_free_guidance"):
        out = workspace.compare_classifier_free_guidance(
            agent, num_runs, num_steps,
            n_inference_steps=eval_cfg.get("n_inference_steps"),
            store_path=store_path)
    elif eval_cfg.get("compare_noisy_sampler"):
        out = workspace.compare_noisy_sampler(
            agent, num_runs, num_steps,
            n_inference_steps=eval_cfg.get("n_inference_steps"),
            store_path=store_path)
    else:  # test_single_variant
        workspace.eval_n_times = num_runs
        workspace.eval_n_steps = num_steps
        extra = {"s_churn": eval_cfg.get("s_churn", 0.0),
                 "s_min": eval_cfg.get("s_min", 0.0)}
        out = workspace.test_agent(agent, key=k_eval, extra_args=extra,
                                   **common)
    logging.info("evaluation results: %s", out)
    return out


if __name__ == "__main__":
    main()
