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
    return out


if __name__ == "__main__":
    main()
