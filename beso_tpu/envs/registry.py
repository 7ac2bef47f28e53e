"""Environment registry mapping the reference's gym env ids.

Functional parity target: the gym registrations of
`beso/envs/__init__.py:6-37` (kitchen) and
`beso/envs/block_pushing/block_pushing.py:1020-1097` +
`block_pushing_multimodal.py:706-730` (12 block-push ids). Instead of gym's
global registry, `make(env_id)` returns a functional (reset_fn, step_fn,
obs_fn, episode_steps) bundle; every env is batched via vmap by the caller.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple


class EnvSpec(NamedTuple):
    reset_fn: Callable
    step_fn: Callable
    obs_fn: Callable
    max_episode_steps: int


def _kitchen_spec(task_mask=None, steps=280) -> EnvSpec:
    from beso_tpu.envs.kitchen.env import (kitchen_obs, kitchen_reset,
                                           kitchen_step)

    return EnvSpec(partial(kitchen_reset, task_mask=task_mask), kitchen_step,
                   kitchen_obs, steps)


def _multimodal_spec(steps=350, horizontal=False) -> EnvSpec:
    from beso_tpu.envs.block_push.env import (block_push_obs,
                                              block_push_reset,
                                              block_push_step)

    return EnvSpec(partial(block_push_reset, horizontal=horizontal),
                   block_push_step, block_push_obs, steps)


def _single_spec(task: str, steps=100) -> EnvSpec:
    from beso_tpu.envs.block_push.single import (single_block_push_obs,
                                                 single_block_push_reset,
                                                 single_block_push_step)

    return EnvSpec(partial(single_block_push_reset, task=task),
                   partial(single_block_push_step, task=task),
                   single_block_push_obs, steps)


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
    "BlockPushNormalized-v0": lambda: _single_spec("PUSH"),
    "BlockPushRgb-v0": lambda: _single_spec("PUSH"),
    "BlockReach-v0": lambda: _single_spec("REACH"),
    "BlockReachNormalized-v0": lambda: _single_spec("REACH"),
    "BlockReachRgb-v0": lambda: _single_spec("REACH"),
    "BlockInsert-v0": lambda: _single_spec("PUSH"),
    "BlockInsertRgb-v0": lambda: _single_spec("PUSH"),
    "BlockPushMultimodal-v0": _multimodal_spec,
    "BlockPushMultimodalFlipped-v0": _multimodal_spec,
    "BlockPushHorizontalMultimodal-v0": lambda: _multimodal_spec(horizontal=True),
    "BlockPushMultimodalRgb-v0": _multimodal_spec,
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
