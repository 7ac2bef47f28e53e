"""Demo-set multimodality census: clean vs play-style generators.

VERDICT r4 missing #3: the play-style demo generator reproduced the
paper's CFG regime, but its multimodality had not been QUANTIFIED. This
tool runs the kitchen workspace's own census instruments (trajectory
census + conditional-probability task tree, the reference's
kitchen_workspace_manager.py:564-570,637-708 analyses) over DEMO SETS
instead of rollouts, plus execution-level dispersion statistics, so
"emulates human play" becomes a measurement:

* sequence census: distinct completed-task sequences, Shannon entropy of
  the sequence distribution, top-1 share;
* task tree: mean branching factor at depths 1-3 (how many distinct
  next-tasks follow each prefix, weighted by prefix mass);
* execution dispersion: per-episode steps-to-first-completion and
  fingertip path length (mean +- std) — the within-sequence diversity
  (detours, wandering, speed draws) that sequence keys cannot see.

Usage: python scripts/demo_census.py [--episodes 1024] [--seed 6]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# host-side analysis tool: force CPU before first backend use (the axon
# TPU plugin overrides the JAX_PLATFORMS env var, see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

ALL_TASKS = ["bottom burner", "top burner", "light switch", "slide cabinet",
             "hinge cabinet", "microwave", "kettle"]


def completion_census(onehot: np.ndarray) -> dict:
    """Trajectory census over demo onehot labels [N, T, 7]: key =
    completed tasks joined in COMPLETION ORDER (the reference census key,
    kitchen_workspace_manager.py:564-570)."""
    census: dict = {}
    for ep in onehot:
        t_idx, task_idx = np.nonzero(ep > 0.5)
        order = np.argsort(t_idx)
        key = ", ".join(ALL_TASKS[task_idx[k]] for k in order)
        census[key] = census.get(key, 0) + 1
    return census


def census_stats(census: dict) -> dict:
    counts = np.asarray(list(census.values()), float)
    p = counts / counts.sum()
    entropy = float(-(p * np.log2(p)).sum())
    return {
        "distinct_sequences": len(census),
        "entropy_bits": round(entropy, 2),
        "top1_share": round(float(p.max()), 3),
    }


def branching_factors(census: dict, max_depth: int = 3) -> list:
    """Mass-weighted mean branching factor at each prefix depth of the
    task tree (kitchen_workspace_manager.py:637-708 tree semantics)."""
    from beso_tpu.workspaces.kitchen_workspace import FrankaKitchenWorkspace

    tree = FrankaKitchenWorkspace.get_state_transitions(census)
    out = []
    level = [(tree, sum(census.values()))]
    for _ in range(max_depth):
        weights, branches, nxt = [], [], []
        for node, mass in level:
            kids = [(k, v) for k, v in node.items()
                    if k not in ("count", "prob")]
            if not kids:
                continue
            weights.append(mass)
            branches.append(len(kids))
            nxt.extend((v, v["count"]) for _, v in kids)
        if not weights:
            out.append(0.0)
            level = []
            continue
        w = np.asarray(weights, float)
        out.append(round(float((w * np.asarray(branches)).sum() / w.sum()), 2))
        level = nxt
    return out


def execution_stats(data) -> dict:
    """Within-sequence execution dispersion from the raw demos."""
    from beso_tpu.envs.kitchen.fk import panda_fk
    from beso_tpu.envs.kitchen.env import KITCHEN_BASE_POS

    onehot = np.asarray(data.onehot_goals)
    lengths = np.asarray(data.lengths)
    obs = np.asarray(data.observations)
    first = []
    path_len = []
    fk = jax.jit(jax.vmap(lambda q: panda_fk(q, KITCHEN_BASE_POS)))
    for i in range(onehot.shape[0]):
        t_idx, _ = np.nonzero(onehot[i] > 0.5)
        if t_idx.size:
            first.append(int(t_idx.min()))
        T = int(lengths[i])
        ee = np.asarray(fk(obs[i, :T, :7]))
        path_len.append(float(np.linalg.norm(np.diff(ee, axis=0),
                                             axis=-1).sum()))
    first = np.asarray(first, float)
    path_len = np.asarray(path_len)
    return {
        "steps_to_first_completion": f"{first.mean():.1f} +- {first.std():.1f}",
        "ee_path_length_m": f"{path_len.mean():.2f} +- {path_len.std():.2f}",
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--episodes", type=int, default=1024)
    parser.add_argument("--seed", type=int, default=6)
    args = parser.parse_args(argv)

    from beso_tpu.envs.kitchen.oracle import generate_kitchen_demonstrations

    out = {}
    for label, play in (("clean", False), ("play_style", True)):
        data = generate_kitchen_demonstrations(
            jax.random.PRNGKey(args.seed), n_episodes=args.episodes,
            n_steps=280, play_style=play)
        census = completion_census(np.asarray(data.onehot_goals))
        row = census_stats(census)
        row["branching_depth_1_2_3"] = branching_factors(census)
        row.update(execution_stats(data))
        out[label] = row
        print(label, json.dumps(row))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
