"""Synthesize scripted-oracle demonstrations into the reference dataset format.
Supports --play-style for human-play-grade execution diversity.

The public BESO datasets (osf.io/q3dx2) are not vendored; this CLI produces
drop-in replacements using the JAX oracles, written in the exact file layout
the reference's loaders (and ours) consume.

Usage:
    python scripts/generate_demos.py --env block_push --out data/push --episodes 1000
    python scripts/generate_demos.py --env kitchen --out data/kitchen --episodes 566
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", choices=["block_push", "kitchen"],
                        required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--episodes", type=int, default=512)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--play-style", action="store_true",
                        help="per-episode execution styles (approach angle,"
                             " speed, detours, wandering, pauses)")
    parser.add_argument("--kettle-boost", type=float, default=0.0,
                        help="kitchen: probability of leading the task"
                             " sequence with the kettle (data curriculum)")
    parser.add_argument("--census", action="store_true",
                        help="print demo-diversity statistics: completion-"
                             "order census entropy + execution dispersion"
                             " (mean pairwise trajectory distance among"
                             " episodes with the SAME completion order)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    key = jax.random.PRNGKey(args.seed)
    if args.env == "block_push":
        from beso_tpu.data.export import export_multimodal_push
        from beso_tpu.envs.block_push.oracle import generate_demonstrations

        data = generate_demonstrations(key, n_episodes=args.episodes,
                                       n_steps=args.steps or 160,
                                       play_style=args.play_style)
        out = export_multimodal_push(data, args.out)
    else:
        from beso_tpu.data.export import export_relay_kitchen
        from beso_tpu.envs.kitchen.oracle import generate_kitchen_demonstrations

        data = generate_kitchen_demonstrations(key, n_episodes=args.episodes,
                                               n_steps=args.steps or 280,
                                               play_style=args.play_style,
                                               kettle_boost=args.kettle_boost)
        out = export_relay_kitchen(data, args.out)
    logging.info("wrote %d episodes to %s (labels/ep %.2f)", args.episodes,
                 out, float(data.onehot_goals.sum()) / args.episodes)
    if args.census:
        _print_census(data)
    return out


def _print_census(data):
    """Demo-diversity statistics (quantifies the play-style generator,
    VERDICT r3 #2): the completion-order census measures TASK-level
    multimodality (which the clean oracle already randomizes); the
    execution-dispersion stat measures EXECUTION-level multimodality —
    mean pairwise distance between (downsampled) trajectories that share
    the SAME completion order, which only play-style diversity raises."""
    import numpy as np

    onehot = np.asarray(data.onehot_goals)
    obs = np.asarray(data.observations)
    N = onehot.shape[0]
    orders = {}
    for i in range(N):
        frames, tasks = np.nonzero(onehot[i])
        key = tuple(tasks[np.argsort(frames)])
        orders.setdefault(key, []).append(i)
    counts = np.asarray([len(v) for v in orders.values()], float)
    p = counts / counts.sum()
    entropy = float(-(p * np.log2(p)).sum())
    print(f"census: {len(orders)} distinct completion orders over {N} "
          f"episodes, entropy {entropy:.2f} bits")
    # execution dispersion within same-order groups (>= 4 members)
    disps = []
    rng = np.random.default_rng(0)
    for key, idxs in orders.items():
        if len(idxs) < 4:
            continue
        pick = rng.choice(idxs, size=min(8, len(idxs)), replace=False)
        trajs = obs[pick, ::10, :2]          # downsampled leading dims
        d = [np.linalg.norm(trajs[a] - trajs[b], axis=-1).mean()
             for a in range(len(pick)) for b in range(a + 1, len(pick))]
        disps.append(np.mean(d))
    if disps:
        print(f"execution dispersion (same-order groups): "
              f"{np.mean(disps):.4f} mean pairwise traj distance "
              f"({len(disps)} groups)")


if __name__ == "__main__":
    main()
