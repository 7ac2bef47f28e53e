"""Single-block BlockPush env (PUSH / REACH variants + normalized wrapper).

Functional parity target: `BlockPush` (`beso/envs/block_pushing/
block_pushing.py:165-787,790-1003`):
* one block + one target zone; reset: block at x=0.4+U(+-0.1),
  y=-0.2+U(+-0.15), target at x=0.4+U(+-0.1), y=0.2+U(+-0.15),
  yaw ~ pi+U(+-pi/6) (block_pushing.py:400-436),
* obs = [block_xy, block_yaw, effector_xy, effector_target_xy, target_xy,
  target_yaw] (10 dims, block_pushing.py:497-511),
* reward = best fraction of goal-distance reduced so far; success (reward 1,
  done) when goal distance < goal_dist_tolerance (0.01)
  (block_pushing.py:569-589),
* REACH variant: the goal is a point 5 cm before the block on the
  block->target line (block_pushing.py:481-489),
* `BlockPushNormalized` (block_pushing.py:790-1003): obs/action mapped to
  [-1, 1] with the reference's published min/max stats.

Shares the quasi-static physics of the multimodal env (env.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from beso_tpu.envs.block_push.env import (EFFECTOR_START, WORKSPACE_BOUNDS,
                                          WORKSPACE_CENTER_X, _push_block,
                                          CONTROL_DT, EFFECTOR_SPEED,
                                          N_SUBSTEPS, EFFECTOR_RADIUS,
                                          RANDOM_X_SHIFT, RANDOM_Y_SHIFT)

GOAL_DIST_TOLERANCE = 0.01  # block_pushing.py:193

# INSERT task (block_pushing.py:170,370-371,1023): the target is a slotted
# fixture (insert.urdf) — the block can only enter along the slot's opening
# axis. The surrogate gates entry: inside SLOT_RADIUS of the target, the
# block is held out at the rim unless its bearing from the target is within
# SLOT_HALF_ANGLE of the slot opening (target yaw direction).
SLOT_RADIUS = 0.05
SLOT_HALF_ANGLE = jnp.pi / 5
SLOT_INNER = 0.02   # slot interior: once inside (only reachable through the
#                     opening) the block sits in the fixture unconstrained


class SingleBlockPushState(NamedTuple):
    effector: jnp.ndarray
    effector_target: jnp.ndarray
    block_pos: jnp.ndarray     # [2]
    block_yaw: jnp.ndarray
    target_pos: jnp.ndarray    # [2]
    target_yaw: jnp.ndarray
    reach_target: jnp.ndarray  # [2] (REACH variant)
    init_goal_distance: jnp.ndarray
    best_fraction: jnp.ndarray
    done: jnp.ndarray
    steps: jnp.ndarray


def single_block_push_reset(key, task: str = "PUSH") -> SingleBlockPushState:
    kb, kby, kt, kty = jax.random.split(key, 4)
    block_x = WORKSPACE_CENTER_X + jax.random.uniform(kb, minval=-0.1, maxval=0.1)
    block_y = -0.2 + jax.random.uniform(kb, minval=-0.15, maxval=0.15)
    block = jnp.stack([block_x, block_y])
    byaw = jax.random.uniform(kby, minval=0.0, maxval=jnp.pi)
    tx = WORKSPACE_CENTER_X + jax.random.uniform(kt, minval=-0.10, maxval=0.10)
    ty = 0.2 + jax.random.uniform(kt, minval=-0.15, maxval=0.15)
    target = jnp.stack([tx, ty])
    tyaw = jnp.pi + jax.random.uniform(kty, minval=-jnp.pi / 6, maxval=jnp.pi / 6)

    # REACH: target point 5cm before the block on the block->target line
    # (block_pushing.py:481-489)
    d = target - block
    dir_bt = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
    reach_target = block - dir_bt * 0.05

    goal = reach_target if task == "REACH" else target
    ref = EFFECTOR_START if task == "REACH" else block
    init_dist = jnp.linalg.norm(goal - ref)
    return SingleBlockPushState(
        effector=EFFECTOR_START, effector_target=EFFECTOR_START,
        block_pos=block, block_yaw=byaw, target_pos=target, target_yaw=tyaw,
        reach_target=reach_target, init_goal_distance=init_dist,
        best_fraction=jnp.zeros(()), done=jnp.asarray(False),
        steps=jnp.zeros((), jnp.int32))


def single_block_push_obs(state: SingleBlockPushState) -> jnp.ndarray:
    """10-dim obs in OrderedDict order (block_pushing.py:497-511)."""
    return jnp.concatenate([
        state.block_pos, state.block_yaw[None], state.effector,
        state.effector_target, state.target_pos, state.target_yaw[None]])


def single_block_push_step(state: SingleBlockPushState, action: jnp.ndarray,
                           task: str = "PUSH"
                           ) -> Tuple[SingleBlockPushState, jnp.ndarray,
                                      jnp.ndarray, jnp.ndarray]:
    tgt = jnp.clip(state.effector_target + action,
                   WORKSPACE_BOUNDS[0], WORKSPACE_BOUNDS[1])

    def _slot_gate(bpos):
        """INSERT slot walls: hold the block at the rim unless its bearing
        from the target aligns with the slot opening (the insert.urdf
        fixture's behavioral difference). Applied per SUBSTEP so the block
        cannot tunnel through the fixture within one control step."""
        to_block = bpos - state.target_pos
        dist = jnp.linalg.norm(to_block)
        bearing = jnp.arctan2(to_block[1], to_block[0])
        opening = state.target_yaw  # slot opens along the target yaw
        mis = jnp.abs(jnp.mod(bearing - opening + jnp.pi, 2 * jnp.pi) - jnp.pi)
        blocked = ((dist < SLOT_RADIUS) & (dist > SLOT_INNER)
                   & (mis > SLOT_HALF_ANGLE))
        rim = state.target_pos + to_block / jnp.maximum(dist, 1e-9) * SLOT_RADIUS
        return jnp.where(blocked, rim, bpos)

    def substep(carry, _):
        eff, bpos, byaw = carry
        to_tgt = tgt - eff
        d = jnp.linalg.norm(to_tgt)
        step_len = jnp.minimum(d, EFFECTOR_SPEED * CONTROL_DT / N_SUBSTEPS)
        eff = eff + to_tgt / jnp.maximum(d, 1e-9) * step_len
        # single-block variants stay purely quasi-static (no coast state);
        # the motion-cone contact law is shared with the multimodal env
        bpos, byaw, _contact = _push_block(bpos, byaw, eff, EFFECTOR_RADIUS)
        if task == "INSERT":
            bpos = _slot_gate(bpos)
        return (eff, bpos, byaw), None

    (eff, bpos, byaw), _ = jax.lax.scan(
        substep, (state.effector, state.block_pos, state.block_yaw),
        None, length=N_SUBSTEPS)

    if task == "REACH":
        goal_distance = jnp.linalg.norm(state.reach_target - eff)
    else:
        goal_distance = jnp.linalg.norm(state.target_pos - bpos)
    fraction = 1.0 - goal_distance / state.init_goal_distance
    best = jnp.maximum(state.best_fraction, fraction)
    success = goal_distance < GOAL_DIST_TOLERANCE
    reward = jnp.where(success, 1.0, best)
    done = state.done | success

    new_state = SingleBlockPushState(
        effector=eff, effector_target=tgt, block_pos=bpos, block_yaw=byaw,
        target_pos=state.target_pos, target_yaw=state.target_yaw,
        reach_target=state.reach_target,
        init_goal_distance=state.init_goal_distance, best_fraction=best,
        done=done, steps=state.steps + 1)
    frozen = jax.tree.map(
        lambda new, old: jnp.where(
            jnp.reshape(state.done, state.done.shape + (1,) * (new.ndim - state.done.ndim)),
            old, new), new_state, state)
    reward = jnp.where(state.done, 0.0, reward)
    return frozen, single_block_push_obs(frozen), reward, frozen.done


# ---------------------------------------------------------------------------
# BlockPushNormalized wrapper (block_pushing.py:790-1003): the observation is
# RESTRUCTURED into relative translations + cos/sin orientations and mapped
# to ~[-1, 1] with the reference's PUBLISHED per-feature stats
# (block_pushing.py:55-86, "[mean-3*std, mean+3*std] -> [-1, 1]"); actions
# are taken in [-1, 1] and unnormalized with ACTION_MIN/MAX; reward is x100.
# ---------------------------------------------------------------------------

ACTION_MIN = jnp.asarray([-0.02547718, -0.02090043])
ACTION_MAX = jnp.asarray([0.02869084, 0.04272365])
_EFF_TGT_MIN = jnp.asarray([0.1774151772260666, -0.6287994794547558])
_EFF_TGT_MAX = jnp.asarray([0.5654461532831192, 0.5441607423126698])
_TO_BLOCK_MIN = jnp.asarray([-0.07369826920330524, -0.11395704373717308])
_TO_BLOCK_MAX = jnp.asarray([0.10131562314927578, 0.19391131028532982])
_TO_TARGET_MIN = jnp.asarray([-0.17813862301409245, -0.3309651017189026])
_TO_TARGET_MAX = jnp.asarray([0.23726161383092403, 0.8404090404510498])
_BLOCK_CS_MIN = jnp.asarray([-2.0649861991405487, -0.6154364347457886])
_BLOCK_CS_MAX = jnp.asarray([1.6590178310871124, 1.8811014890670776])
_TARGET_CS_MIN = jnp.asarray([-1.0761439241468906, -0.8846937336493284])
_TARGET_CS_MAX = jnp.asarray([-0.8344330154359341, 0.8786859593819827])


def _norm(v, lo, hi):
    """[min, max] -> [-1, 1] (block_pushing.py:869-873)."""
    offset = (hi + lo) * 0.5
    scale = (hi - lo) * 0.5
    return (v - offset) / scale


def normalized_obs(state: SingleBlockPushState) -> jnp.ndarray:
    """The reference's normalized state, flattened in its OrderedDict order
    (calc_normalized_state, block_pushing.py:885-935): [effector_target(2),
    effector_target->block(2), block cos/sin(2), effector_target->target(2),
    target cos/sin(2)]. effector_translation is deliberately dropped (the
    mapping is non-invertible, block_pushing.py:917-918)."""
    et = state.effector_target
    block_cs = jnp.stack([jnp.cos(state.block_yaw), jnp.sin(state.block_yaw)])
    target_cs = jnp.stack([jnp.cos(state.target_yaw), jnp.sin(state.target_yaw)])
    return jnp.concatenate([
        _norm(et, _EFF_TGT_MIN, _EFF_TGT_MAX),
        _norm(state.block_pos - et, _TO_BLOCK_MIN, _TO_BLOCK_MAX),
        _norm(block_cs, _BLOCK_CS_MIN, _BLOCK_CS_MAX),
        _norm(state.target_pos - et, _TO_TARGET_MIN, _TO_TARGET_MAX),
        _norm(target_cs, _TARGET_CS_MIN, _TARGET_CS_MAX),
    ])


def denormalize_action(action: jnp.ndarray) -> jnp.ndarray:
    """clip to [-1, 1] then map to [ACTION_MIN, ACTION_MAX]
    (block_pushing.py:853-856, 875-880)."""
    a = jnp.clip(action, -1.0, 1.0)
    offset = (ACTION_MAX + ACTION_MIN) * 0.5
    scale = (ACTION_MAX - ACTION_MIN) * 0.5
    return a * scale + offset
