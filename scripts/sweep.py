"""Sweep CLI: the reference's `--multirun` equivalent, TPU-native.

The reference fans Hydra multiruns out as one process per (seed, override)
cell (README.md:94-98). Here the SEED axis is vmapped — all seeds of a cell
train simultaneously in one jitted program (beso_tpu/train/sweep.py) — and
non-seed grids (which change program structure) loop serially over cells.

Usage:
    python scripts/sweep.py --config configs/block_push.yaml \
        --seeds 1,2,3 [--grid lr=1e-4,3e-4 --grid n_timesteps=3,10] \
        [--run-dir logs/sweep1] [--final-eval] [max_train_steps=2000 ...]

Each cell/seed gets its own run dir (<run_dir>/<cell>/seed_<s>/) holding the
resolved config + full train state, loadable by scripts/evaluate.py.
"""

from __future__ import annotations

import argparse
import itertools
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from training import build_agent_config, build_workspace  # noqa: E402


def parse_grid(entries):
    """['lr=1e-4,3e-4', 'n_timesteps=3,10'] -> list of override dicts."""
    if not entries:
        return [{}]
    keys, value_lists = [], []
    for e in entries:
        k, _, vs = e.partition("=")
        keys.append(k)
        value_lists.append(vs.split(","))
    return [dict(zip(keys, combo))
            for combo in itertools.product(*value_lists)]


def cell_name(overrides: dict) -> str:
    if not overrides:
        return "base"
    return "_".join(f"{k.split('.')[-1]}-{v}" for k, v in overrides.items())


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--seeds", default="0",
                        help="comma-separated seeds; vmapped into ONE program")
    parser.add_argument("--grid", action="append", default=[],
                        help="key=v1,v2,... (repeatable); cells loop serially")
    parser.add_argument("--run-dir", default=None)
    parser.add_argument("--final-eval", action="store_true",
                        help="run the workspace evaluation per seed at the end")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s [%(levelname)s] %(message)s")
    from beso_tpu.agents.beso_agent import BesoAgent
    from beso_tpu.train.checkpoint import save_train_state
    from beso_tpu.train.sweep import run_sweep, seed_state
    from beso_tpu.utils.config import load_config, save_config

    seeds = [int(s) for s in args.seeds.split(",")]
    cells = parse_grid(args.grid)
    root = Path(args.run_dir or Path("logs") / "sweeps" /
                time.strftime("%Y-%m-%d/%H-%M-%S"))
    root.mkdir(parents=True, exist_ok=True)
    summary = {}

    for cell in cells:
        name = cell_name(cell)
        cell_over = [f"{k}={v}" for k, v in cell.items()]
        cfg = load_config(args.config, list(args.overrides) + cell_over)
        logging.info("=== sweep cell %s: seeds %s ===", name, seeds)

        np.random.seed(seeds[0])
        workspace = build_workspace(cfg)
        agent_cfg = build_agent_config(cfg)
        # one throwaway agent per cell provides denoiser/optimizer/density
        agent = BesoAgent(agent_cfg, workspace.scaler)

        test_batch = workspace.test_set.sample_batch(
            jax.random.PRNGKey(1), min(cfg.get("test_batch_size", 1024), 256))
        ts, history = run_sweep(
            agent.denoiser, agent.trainer.optimizer,
            agent.trainer.sample_density, workspace.scaler,
            workspace.train_set, test_batch, seeds,
            batch_size=cfg.get("train_batch_size", 1024),
            max_train_steps=cfg.get("max_train_steps", 1000),
            eval_every_n_steps=cfg.get("eval_every_n_steps", 500),
            key=jax.random.PRNGKey(cfg["seed"]),
            use_ema=cfg.get("use_ema", True),
            num_sampling_steps=cfg.get("n_timesteps", 3),
            sigma_min=cfg.get("sigma_min", 0.005),
            sigma_max=cfg.get("sigma_max", 1.0),
            sampler_type=cfg.get("sampler_type", "ddim"),
            cond_mask_prob=cfg.get("cond_mask_prob", 0.0),
            pred_last_action_only=cfg.get("pred_last_action_only", False),
            ema_decay=cfg.get("decay", 0.999),
            update_ema_every_n_steps=cfg.get("update_ema_every_n_steps", 1),
        )

        cell_summary = {"history": [(int(s), list(map(float, l)),
                                     list(map(float, m)))
                                    for s, l, m in history], "seeds": {}}
        for i, seed in enumerate(seeds):
            sdir = root / name / f"seed_{seed}"
            sdir.mkdir(parents=True, exist_ok=True)
            cfg_i = dict(cfg)
            cfg_i["seed"] = seed
            save_config(cfg_i, sdir)
            save_train_state(seed_state(ts, i), str(sdir), "train_state")
            entry = {"final_loss": float(history[-1][1][i]),
                     "final_test_mse": float(history[-1][2][i])}
            if args.final_eval:
                agent.state = seed_state(ts, i)
                results = workspace.test_agent(
                    agent,
                    evaluate_multigoal=cfg.get("evaluate_multigoal", True),
                    evaluate_sequential=cfg.get("evaluate_sequential", False),
                    key=jax.random.PRNGKey(seed))
                entry["eval"] = results
            cell_summary["seeds"][seed] = entry
        summary[name] = cell_summary
        (root / name / "summary.json").write_text(
            json.dumps(cell_summary, indent=2, default=str))

    (root / "summary.json").write_text(json.dumps(summary, indent=2,
                                                  default=str))
    logging.info("sweep complete: %s", root)
    return summary


if __name__ == "__main__":
    main()
