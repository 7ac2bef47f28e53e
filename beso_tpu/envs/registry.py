"""Environment registry mapping the reference's gym env ids.

Functional parity target: the gym registrations of
`beso/envs/__init__.py:6-37` (kitchen) and
`beso/envs/block_pushing/block_pushing.py:1020-1097` +
`block_pushing_multimodal.py:706-730` (12 block-push ids). Instead of gym's
global registry, `make(env_id)` returns a functional (reset_fn, step_fn,
obs_fn, episode_steps, render_fn) bundle; every env is batched via vmap by
the caller.

Variant semantics (each id is behaviorally distinct, not an alias):
* `*Normalized-v0`: the reference's BlockPushNormalized wrapper
  (block_pushing.py:790-1003) — observations RESTRUCTURED into relative
  translations + cos/sin orientations normalized with the published
  per-feature stats, actions taken in [-1, 1] (unnormalized with
  ACTION_MIN/MAX inside step), reward x100.
* `BlockInsert*`: the slotted-target INSERT task (block_pushing.py:170,
  370-371): the block only enters the target region along the slot opening.
* `*Rgb-v0`: ships a host-side `render_fn(state) -> uint8 RGB` (the
  schematic replacement for the reference's GL camera,
  block_pushing.py:604-679).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional


class EnvSpec(NamedTuple):
    reset_fn: Callable
    step_fn: Callable
    obs_fn: Callable
    max_episode_steps: int
    render_fn: Optional[Callable] = None


def _kitchen_spec(task_mask=None, steps=280) -> EnvSpec:
    from beso_tpu.envs.kitchen.env import (kitchen_obs, kitchen_reset,
                                           kitchen_step)

    return EnvSpec(partial(kitchen_reset, task_mask=task_mask), kitchen_step,
                   kitchen_obs, steps)


def _multimodal_spec(steps=350, horizontal=False, rgb=False) -> EnvSpec:
    from beso_tpu.envs.block_push.env import (block_push_obs,
                                              block_push_reset,
                                              block_push_step)

    render_fn = None
    if rgb:
        from beso_tpu.envs.block_push.render import render_frame
        render_fn = render_frame
    return EnvSpec(partial(block_push_reset, horizontal=horizontal),
                   block_push_step, block_push_obs, steps, render_fn)


def _single_spec(task: str, steps=100, normalized=False, rgb=False) -> EnvSpec:
    from beso_tpu.envs.block_push.single import (denormalize_action,
                                                 normalized_obs,
                                                 single_block_push_obs,
                                                 single_block_push_reset,
                                                 single_block_push_step)

    reset_fn = partial(single_block_push_reset, task=task)
    step_fn = partial(single_block_push_step, task=task)
    obs_fn = single_block_push_obs
    if normalized:
        raw_step = step_fn
        obs_fn = normalized_obs  # restructured features, published stats

        def step_fn(state, action):  # noqa: F811
            s, _, r, d = raw_step(state, denormalize_action(action))
            # "Keep returns in [0, 100]" (block_pushing.py:860)
            return s, normalized_obs(s), r * 100.0, d

    render_fn = None
    if rgb:
        from beso_tpu.envs.block_push.render import render_single_frame
        render_fn = partial(render_single_frame, task=task)
    return EnvSpec(reset_fn, step_fn, obs_fn, steps, render_fn)


# kitchen task-subset variants (envs/franka_kitchen/v0.py:4-20): the three
# fixed 4-task subsets + the evaluated all-7 variant
_KITCHEN_SUBSETS = {
    "kitchen-all-v0": None,
    "kitchen-microwave-kettle-light-slider-v0": (0, 0, 1, 1, 0, 1, 1),
    "kitchen-microwave-kettle-burner-light-v0": (1, 0, 1, 0, 0, 1, 1),
    "kitchen-kettle-microwave-light-slider-v0": (0, 0, 1, 1, 0, 1, 1),
}

_REGISTRY = {
    **{k: (lambda m=v: _kitchen_spec(m)) for k, v in _KITCHEN_SUBSETS.items()},
    # block push ids (block_pushing.py:1020-1097, multimodal:706-730)
    "BlockPush-v0": lambda: _single_spec("PUSH"),
    "BlockPushNormalized-v0": lambda: _single_spec("PUSH", normalized=True),
    "BlockPushRgb-v0": lambda: _single_spec("PUSH", rgb=True),
    "BlockReach-v0": lambda: _single_spec("REACH"),
    "BlockReachNormalized-v0": lambda: _single_spec("REACH", normalized=True),
    "BlockReachRgb-v0": lambda: _single_spec("REACH", rgb=True),
    "BlockInsert-v0": lambda: _single_spec("INSERT"),
    "BlockInsertRgb-v0": lambda: _single_spec("INSERT", rgb=True),
    "BlockPushMultimodal-v0": _multimodal_spec,
    # Flipped = the horizontal variant at a 25-step limit
    # (block_pushing_multimodal.py:713-717)
    "BlockPushMultimodalFlipped-v0": lambda: _multimodal_spec(
        steps=25, horizontal=True),
    "BlockPushHorizontalMultimodal-v0": lambda: _multimodal_spec(horizontal=True),
    "BlockPushMultimodalRgb-v0": lambda: _multimodal_spec(rgb=True),
    # SHARED_MEMORY connection mode is a pybullet process detail with no
    # behavioral difference on the JAX side
    "SharedBlockPushMultimodal-v0": _multimodal_spec,
}


def make(env_id: str) -> EnvSpec:
    try:
        return _REGISTRY[env_id]()
    except KeyError:
        raise ValueError(f"unknown env id {env_id!r}; known: "
                         f"{sorted(_REGISTRY)}") from None


def registered_ids():
    return sorted(_REGISTRY)
