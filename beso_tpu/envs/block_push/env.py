"""Batched planar Block Push Multimodal environment in pure JAX.

Functional parity targets (behavioral, not bitwise — the reference runs
Bullet rigid-body physics on CPU):
* scene, reset distributions, observation layout and reward/completion logic
  of `BlockPushMultimodal`
  (`beso/envs/block_pushing/block_pushing_multimodal.py:80-438`) and its base
  `BlockPush` (`beso/envs/block_pushing/block_pushing.py:183-600`):
  - action = delta-xy of the effector TARGET, clipped to the workspace
    (block_pushing.py:516-534), 10 Hz control over 240 Hz substeps,
  - obs dict (flattened to 16 dims in the reference workspace) =
    [block_xy, block_yaw, block2_xy, block2_yaw, effector_xy,
     effector_target_xy, target_xy, target_yaw, target2_xy, target2_yaw]
    (block_pushing_multimodal.py:332-382),
  - reward: +0.49 the first time a block enters a target zone, 0.51 when both
    blocks sit in two DIFFERENT targets -> done
    (block_pushing_multimodal.py:395-438); goal_dist_tolerance = 0.05,
  - completions: task id 2*block + target appended on first entry
    (block_pushing_multimodal.py:416-430),
  - reset: blocks at x=0.4+U(+-0.1), y=-0.2+U(+-0.15), rejected until the
    |x|-distance exceeds 0.1; targets mirrored at x=0.4+-0.12 (+U small),
    y=0.2+U small, yaw ~ pi+U(+-pi/30)
    (block_pushing_multimodal.py:163-273).

TPU-first design: the env is a pure function of (state, action, key) on
stacked arrays — `reset(key)`/`step(state, action)` vmap over thousands of
envs and fuse into the policy's denoise scan (see beso_tpu.rollout). The
XArm IK + Bullet contact solve is replaced by a quasi-static planar push
model: the effector is a velocity-limited point-tracker (the 24-substep
position-controlled arm behaves as a critically damped tracker,
SURVEY.md 7.3#2) and block/effector and block/block contacts resolve by
minimal-penetration projection with a lever-arm yaw response. Rejection
sampling at reset becomes a masked first-valid pick over a fixed candidate
batch (no data-dependent control flow).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# scene constants (block_pushing.py:46-49, block_pushing_multimodal.py:45-52)
EFFECTOR_HEIGHT = 0.06
WORKSPACE_BOUNDS = jnp.asarray(((0.15, -0.5), (0.7, 0.5)))
MIN_BLOCK_DIST = 0.1
MIN_TARGET_DIST = 0.12
RANDOM_X_SHIFT = 0.1
RANDOM_Y_SHIFT = 0.15
GOAL_DIST_TOLERANCE = 0.05          # block_pushing_multimodal.py:90
WORKSPACE_CENTER_X = 0.4            # block_pushing_multimodal.py:291
EFFECTOR_START = jnp.asarray((0.3, -0.4))  # block_pushing_multimodal.py:296

# contact-model constants, from the vendored reference assets:
# block.urdf/block2.urdf = 0.04 m cube (mass 0.01, lateral friction 1.0);
# suction/cylinder_real.urdf = 0.0127 m radius cylinder effector.
# YAW_GAIN / BLOCK_BLOCK_RADIUS are calibrated against host-MuJoCo golden
# rollouts of the same scene (scripts/calibrate_block_push.py;
# tests/golden/block_push_mujoco.npz pins the fidelity level).
BLOCK_HALF = 0.02
EFFECTOR_RADIUS = 0.0127
BLOCK_BLOCK_RADIUS = 0.026          # disk approximation for block-block
EFFECTOR_SPEED = 1.0                # m/s tracking-speed cap
CONTROL_DT = 0.1                    # 10 Hz (block_pushing.py:188)
N_SUBSTEPS = 24                     # matches Bullet: 240 Hz / 10 Hz control
# friction radius of gyration squared for the quasi-static (Mason/Lynch)
# push model: k^2 = a^2/6 for a uniform square of side a = 2*BLOCK_HALF
FRICTION_K2 = (2.0 / 3.0) * BLOCK_HALF * BLOCK_HALF

_RESET_CANDIDATES = 64


class BlockPushState(NamedTuple):
    """Per-env physics + bookkeeping state (batched: leading dim B)."""

    effector: jnp.ndarray          # [..., 2]
    effector_target: jnp.ndarray   # [..., 2]
    block_pos: jnp.ndarray         # [..., 2, 2]
    block_yaw: jnp.ndarray         # [..., 2]
    target_pos: jnp.ndarray        # [..., 2, 2]
    target_yaw: jnp.ndarray        # [..., 2]
    in_target: jnp.ndarray         # [..., 2, 2] bool, first-entry latch [t, b]
    completed: jnp.ndarray         # [..., 4] bool, task ids 2*b + t
    done: jnp.ndarray              # [...] bool
    steps: jnp.ndarray             # [...] int32


def _sample_block_positions(key) -> jnp.ndarray:
    """Two block xy positions with |x1-x2| > MIN_BLOCK_DIST via masked
    first-valid pick over _RESET_CANDIDATES candidate pairs."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (_RESET_CANDIDATES, 2, 2))
    x = WORKSPACE_CENTER_X + (u[:, :, 0] * 2 - 1) * RANDOM_X_SHIFT
    y = -0.2 + (u[:, :, 1] * 2 - 1) * RANDOM_Y_SHIFT
    valid = jnp.abs(x[:, 0] - x[:, 1]) > MIN_BLOCK_DIST
    idx = jnp.argmax(valid)  # first valid candidate
    pos = jnp.stack([x[idx], y[idx]], axis=-1)  # [2 blocks, 2]
    return pos


def block_push_reset(key, horizontal: bool = False) -> BlockPushState:
    """Single-env reset; vmap for a batch (block_pushing_multimodal.py:163-310).

    `horizontal=True` gives the BlockPushHorizontalMultimodal layout
    (block_pushing_multimodal.py:583-703): blocks spawn left/right of center
    (y = +-0.2 + noise, x ~ 0.35) and both targets sit at x ~ 0.5 mirrored in
    y, instead of the bottom-blocks / top-targets arrangement.
    """
    k_block, k_byaw, k_flip, k_tx, k_ty, k_tyaw = jax.random.split(key, 6)
    if horizontal:
        kb1, kb2, kadd = jax.random.split(k_block, 3)
        add = 0.2 * jnp.where(jax.random.bernoulli(kadd), 1.0, -1.0)
        u = jax.random.uniform(kb1, (2, 2))
        bx = 0.35 + 0.5 * (u[:, 0] * 2 - 1) * RANDOM_X_SHIFT
        by = (jnp.asarray([1.0, -1.0]) * add
              + 0.5 * (u[:, 1] * 2 - 1) * RANDOM_Y_SHIFT)
        block_pos = jnp.stack([bx, by], axis=-1)
    else:
        block_pos = _sample_block_positions(k_block)
    block_yaw = jax.random.uniform(k_byaw, (2,), minval=0.0, maxval=jnp.pi)

    if horizontal:
        add = 0.2 * jnp.where(jax.random.bernoulli(k_flip), 1.0, -1.0)
        tx = 0.5 + (jax.random.uniform(k_tx, (2,)) * 2 - 1) * 0.05 * RANDOM_X_SHIFT
        ty = (jnp.asarray([1.0, -1.0]) * add
              + (jax.random.uniform(k_ty, (2,)) * 2 - 1) * 0.05 * RANDOM_Y_SHIFT)
    else:
        add = 0.12 * jnp.where(jax.random.bernoulli(k_flip), 1.0, -1.0)
        tx = (WORKSPACE_CENTER_X + jnp.asarray([1.0, -1.0]) * add
              + (jax.random.uniform(k_tx, (2,)) * 2 - 1) * 0.05 * RANDOM_X_SHIFT)
        ty = 0.2 + (jax.random.uniform(k_ty, (2,)) * 2 - 1) * 0.05 * RANDOM_Y_SHIFT
    tyaw = jnp.pi + (jax.random.uniform(k_tyaw, (2,)) * 2 - 1) * jnp.pi / 30

    return BlockPushState(
        effector=EFFECTOR_START,
        effector_target=EFFECTOR_START,
        block_pos=block_pos,
        block_yaw=block_yaw,
        target_pos=jnp.stack([tx, ty], axis=-1),
        target_yaw=tyaw,
        in_target=jnp.zeros((2, 2), bool),
        completed=jnp.zeros((4,), bool),
        done=jnp.asarray(False),
        steps=jnp.zeros((), jnp.int32),
    )


def block_push_obs(state: BlockPushState) -> jnp.ndarray:
    """Flatten to the 16-dim obs vector in the reference's OrderedDict order
    (block_pushing_multimodal.py:332-366 + block_push_workspace.py:147-148)."""
    return jnp.concatenate([
        state.block_pos[..., 0, :],
        state.block_yaw[..., 0:1],
        state.block_pos[..., 1, :],
        state.block_yaw[..., 1:2],
        state.effector,
        state.effector_target,
        state.target_pos[..., 0, :],
        state.target_yaw[..., 0:1],
        state.target_pos[..., 1, :],
        state.target_yaw[..., 1:2],
    ], axis=-1)


def _rot(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.asarray([[c, -s], [s, c]])


def _push_block(block_pos, block_yaw, point, radius, k2=None):
    """Quasi-static point-push of an oriented box — Mason/Lynch pushing
    mechanics. For a friction-dominated block pushed at contact point c
    (local frame) along the inward normal n, the motion that resolves a
    penetration `pen` at the contact is, in closed form,

        v     = pen * (k^2 n + (c.n) c) / (k^2 + |c|^2)
        dyaw  = pen * (c x n)_z        / (k^2 + |c|^2)

    where k^2 is the friction distribution's radius of gyration squared
    (a^2/6 for a uniform square). Central pushes reduce to pure projection
    (v = pen*n); off-center pushes split into translation + rotation, so
    blocks shed sideways around the pusher exactly like the rigid-body
    golden rollouts (calibrated against host MuJoCo,
    scripts/calibrate_block_push.py — an earlier ad-hoc lever model
    under-rotated by >10x). Returns (new_pos, new_yaw)."""
    k2 = FRICTION_K2 if k2 is None else k2
    R = _rot(block_yaw)
    local = R.T @ (point - block_pos)
    # closest point on the box to the effector center
    clamped = jnp.clip(local, -BLOCK_HALF, BLOCK_HALF)
    delta = local - clamped
    dist = jnp.linalg.norm(delta)
    inside = dist < 1e-9
    face = jnp.where(local >= 0, BLOCK_HALF - local, -BLOCK_HALF - local)
    pen = jnp.where(inside, radius + jnp.min(jnp.abs(face)), radius - dist)
    # cap the per-substep penetration at the effector's substep advance:
    # without it, corner contacts where the block ROTATES into the pusher
    # spike pen and feed back into runaway rotation (the rigid-body golden
    # rollouts resolve these by slipping around the corner instead)
    pen = jnp.clip(pen, 0.0, EFFECTOR_SPEED * CONTROL_DT / N_SUBSTEPS)
    # inward contact normal; center direction for the degenerate inside case
    n_out = delta / jnp.maximum(dist, 1e-9)            # surface -> effector
    to_center = -local / jnp.maximum(jnp.linalg.norm(local), 1e-9)
    n_in = jnp.where(inside, to_center, -n_out)
    c = clamped
    denom = k2 + jnp.sum(c * c)
    v_local = pen * (k2 * n_in + jnp.dot(c, n_in) * c) / denom
    dyaw = pen * (c[0] * n_in[1] - c[1] * n_in[0]) / denom
    new_pos = block_pos + R @ v_local
    new_yaw = block_yaw + dyaw
    return new_pos, new_yaw


def _separate_blocks(pos_a, pos_b):
    """Disk-disk separation for block-block contact (both move half-way)."""
    d = pos_b - pos_a
    dist = jnp.linalg.norm(d)
    pen = jnp.maximum(2 * BLOCK_BLOCK_RADIUS - dist, 0.0)
    n = d / jnp.maximum(dist, 1e-9)
    return pos_a - n * pen / 2, pos_b + n * pen / 2


def block_push_step(state: BlockPushState, action: jnp.ndarray,
                    friction_k2: float = None,
                    ) -> Tuple[BlockPushState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One 10 Hz control step. Returns (state, obs16, reward, done).

    Steps with done=True hold the state frozen (fixed-length scan semantics);
    the caller masks metrics with `done`. `friction_k2` overrides the push
    model's friction radius-of-gyration (perturbed-physics robustness
    protocol: larger k2 -> stiffer rotation response).
    """
    # move the effector target by the action, clipped (block_pushing.py:516-534)
    tgt = jnp.clip(state.effector_target + action,
                   WORKSPACE_BOUNDS[0], WORKSPACE_BOUNDS[1])

    def substep(carry, _):
        eff, bpos, byaw = carry
        # velocity-limited tracking of the target
        to_tgt = tgt - eff
        d = jnp.linalg.norm(to_tgt)
        step_len = jnp.minimum(d, EFFECTOR_SPEED * CONTROL_DT / N_SUBSTEPS)
        eff = eff + to_tgt / jnp.maximum(d, 1e-9) * step_len
        # effector pushes each block
        p0, y0 = _push_block(bpos[0], byaw[0], eff, EFFECTOR_RADIUS,
                             friction_k2)
        p1, y1 = _push_block(bpos[1], byaw[1], eff, EFFECTOR_RADIUS,
                             friction_k2)
        # block-block separation
        p0, p1 = _separate_blocks(p0, p1)
        return (eff, jnp.stack([p0, p1]), jnp.stack([y0, y1])), None

    (eff, bpos, byaw), _ = jax.lax.scan(
        substep, (state.effector, state.block_pos, state.block_yaw),
        None, length=N_SUBSTEPS)

    # ---- reward & completion (block_pushing_multimodal.py:395-438) ----
    # dists[t, b] = || block_b - target_t ||
    dists = jnp.linalg.norm(bpos[None, :, :] - state.target_pos[:, None, :],
                            axis=-1)
    entered = (dists < GOAL_DIST_TOLERANCE) & ~state.in_target
    in_target = state.in_target | (dists < GOAL_DIST_TOLERANCE)
    reward = 0.49 * jnp.sum(entered)

    # completions: task id 2*b + t on first entry
    task_entered = jnp.zeros((4,), bool)
    for t in range(2):
        for b in range(2):
            task_entered = task_entered.at[2 * b + t].set(entered[t, b])
    completed = state.completed | task_entered

    # both blocks in DIFFERENT targets -> reward 0.51, done
    closest_t = jnp.argmin(dists, axis=0)          # per block
    closest_d = jnp.min(dists, axis=0)
    both_in = jnp.all(closest_d < GOAL_DIST_TOLERANCE)
    different = closest_t[0] != closest_t[1]
    success = both_in & different
    reward = jnp.where(success, 0.51, reward)
    done = state.done | success

    new_state = BlockPushState(
        effector=eff, effector_target=tgt, block_pos=bpos, block_yaw=byaw,
        target_pos=state.target_pos, target_yaw=state.target_yaw,
        in_target=in_target, completed=completed, done=done,
        steps=state.steps + 1)

    # freeze finished envs
    frozen = jax.tree.map(
        lambda new, old: jnp.where(
            jnp.reshape(state.done, state.done.shape + (1,) * (new.ndim - state.done.ndim)),
            old, new),
        new_state, state)
    reward = jnp.where(state.done, 0.0, reward)
    return frozen, block_push_obs(frozen), reward, frozen.done
