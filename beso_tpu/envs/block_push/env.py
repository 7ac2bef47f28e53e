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
# pusher-block friction coefficient for the sticking/slipping motion cone
# (both URDFs specify lateral friction 1.0; the calibration sweep against
# the MuJoCo ensemble selects the shipped value — calibrate_block_push.py)
PUSHER_MU = 0.5
# ground Coulomb deceleration mu*g for the post-contact coast: the 10-gram
# block is KNOCKED AWAY by the 1 m/s pusher and coasts v^2/(2*mu*g) before
# stopping — the escape dynamics that bound how long a push can torque the
# block (the pure quasi-static model kept blocks glued to the pusher for
# the whole stroke, integrating ~3x MuJoCo's ensemble rotation)
GROUND_DECEL = 9.81            # m/s^2 (URDF lateral friction 1.0)
# rotational Coulomb decel ~ mu*g*r_mean/k^2 (r_mean ~ half width)
YAW_DECEL = GROUND_DECEL * BLOCK_HALF / FRICTION_K2   # rad/s^2
SUB_DT = CONTROL_DT / N_SUBSTEPS
# per-substep low-pass factor for the contact-implied coast velocity
# (chattering-contact duty cycle; calibrated vs the MuJoCo golden
# step-level and ensemble statistics)
KICK_ALPHA = 0.15

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
    # knock-away coast state (round 3; zero-filled defaults keep older
    # single-env construction sites source-compatible)
    block_vel: jnp.ndarray = jnp.zeros((2, 2))      # [..., 2, 2] m/s
    block_yawrate: jnp.ndarray = jnp.zeros((2,))    # [..., 2] rad/s


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
        block_vel=jnp.zeros((2, 2)),
        block_yawrate=jnp.zeros((2,)),
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


def _push_block(block_pos, block_yaw, point, radius, k2=None, de=None,
                mu=None):
    """Quasi-static point-push of an oriented box — Mason/Lynch pushing
    mechanics WITH the sticking/slipping motion cone (round 3: the
    contact-migration refinement VERDICT r2 #3 asked for).

    Limit-surface mobility at contact point c (local frame): an applied
    contact impulse f moves the contact point by

        v_c = A f,   A = (k^2 I + p p^T) / (k^2 + |c|^2),  p = perp(c)

    where k^2 is the friction distribution's radius of gyration squared
    (a^2/6 for a uniform square). The imposed contact displacement is the
    penetration resolution `pen` along the inward normal n PLUS the
    pusher's own tangential substep motion u_t (contact migration drive):

    * STICK: f = A^-1 (pen n + u_t t) lies inside the friction cone
      (|f.t| <= mu f.n) -> the FULL solved force is applied (norm-capped
      at 4x pen), so the contact point tracks the pusher tangentially as
      well as normally. Dropping the tangential component (as the first
      round-3 model did) artificially stabilized face-aligned plowing:
      the tangential drag is the term that torques a slightly misaligned
      block AWAY from alignment, as in the measured MuJoCo rollouts
      (scripted yaw RMSE 17.0 -> 8.7 deg from this change alone).
    * SLIP: the sticking force leaves the cone -> the impulse tilts to
      the cone edge (n + mu sign(ft) t)/sqrt(1+mu^2) with magnitude pen;
      the friction component OPPOSES the contact's sliding (typically
      the block's rotation sweeping its corner past the pusher), damping
      the corner-escape spin the round-2 always-normal model over-ran
      (ensemble |dyaw| 36 deg vs MuJoCo's 12 deg).

    Contact normal: face normal of the deepest-crossed face slab, ALSO in
    the corner region (MuJoCo's box-cylinder collider reports face-aligned
    normals there; traced on the golden ensemble — a corner-touched block
    slides out along its oblique FACE normal, not the rounded-corner
    radial). The radial direction is kept only for the degenerate
    inside-the-box case.

    Calibrated against host-MuJoCo golden rollouts
    (scripts/calibrate_block_push.py; an earlier ad-hoc lever model
    under-rotated by >10x, the round-2 frictionless-pusher model
    over-rotated 3x in corner escape). Returns (new_pos, new_yaw)."""
    k2 = FRICTION_K2 if k2 is None else k2
    mu = PUSHER_MU if mu is None else mu
    R = _rot(block_yaw)
    local = R.T @ (point - block_pos)
    # closest point on the box to the effector center
    clamped = jnp.clip(local, -BLOCK_HALF, BLOCK_HALF)
    delta = local - clamped
    dist = jnp.linalg.norm(delta)
    inside = dist < 1e-9
    face = jnp.where(local >= 0, BLOCK_HALF - local, -BLOCK_HALF - local)
    pen = jnp.where(inside, radius + jnp.min(jnp.abs(face)), radius - dist)
    # cap the per-substep penetration at the effector's substep advance
    # (rotation feeding back into penetration is resolved by slip, but the
    # cap also bounds the one-substep impulse for deep spawn overlaps)
    pen = jnp.clip(pen, 0.0, EFFECTOR_SPEED * CONTROL_DT / N_SUBSTEPS)
    # inward contact normal: deepest-crossed face slab (corner region
    # included — matches MuJoCo's face-aligned box-cylinder normals);
    # center direction for the degenerate inside case
    p_ax = jnp.abs(local) - BLOCK_HALF
    corner = jnp.all(p_ax > 0)
    ax = jnp.argmin(p_ax)
    n_face = -jnp.sign(local[ax]) * jnp.eye(2)[ax]
    n_out = delta / jnp.maximum(dist, 1e-9)            # surface -> effector
    to_center = -local / jnp.maximum(jnp.linalg.norm(local), 1e-9)
    n_in = jnp.where(inside, to_center, jnp.where(corner, n_face, -n_out))
    t_dir = jnp.asarray([-n_in[1], n_in[0]])           # contact tangent
    c = clamped
    p = jnp.asarray([-c[1], c[0]])
    D = k2 + jnp.sum(c * c)
    A = (k2 * jnp.eye(2) + jnp.outer(p, p)) / D

    # tangential migration drive: the pusher's substep displacement at the
    # contact, in the local frame (zero if the caller has no motion info)
    u_t = 0.0 if de is None else jnp.dot(R.T @ de, t_dir)
    u = pen * n_in + jnp.where(pen > 0, u_t, 0.0) * t_dir

    f_stick = jnp.linalg.solve(A, u)
    fn = jnp.dot(f_stick, n_in)
    ft = jnp.dot(f_stick, t_dir)
    stick = jnp.abs(ft) <= mu * jnp.maximum(fn, 0.0)
    edge = (n_in + mu * jnp.sign(ft) * t_dir) * jax.lax.rsqrt(1.0 + mu * mu)
    # sticking applies the FULL solved force (norm-capped at 4x pen so
    # near-singular corner solves cannot blow up a substep); slipping
    # applies the cone-edge force at the penetration-relaxation magnitude
    fmax = 4.0 * jnp.maximum(pen, 1e-9)
    f_st = f_stick * jnp.minimum(
        1.0, fmax / jnp.maximum(jnp.linalg.norm(f_stick), 1e-9))
    f = jnp.where(stick, f_st, pen * edge)

    # quasi-static twist for applied impulse f (identical to the round-2
    # calibrated law when sticking: v = pen(k^2 n + (c.n)c)/D)
    v_local = (k2 * f + jnp.dot(c, f) * c) / D
    dyaw = jnp.dot(p, f) / D
    new_pos = block_pos + R @ v_local
    new_yaw = block_yaw + dyaw
    return new_pos, new_yaw, pen > 0


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
        eff, bpos, byaw, bvel, byr = carry
        # velocity-limited tracking of the target
        to_tgt = tgt - eff
        d = jnp.linalg.norm(to_tgt)
        step_len = jnp.minimum(d, EFFECTOR_SPEED * CONTROL_DT / N_SUBSTEPS)
        de = to_tgt / jnp.maximum(d, 1e-9) * step_len
        eff = eff + de

        # 1) knock-away coast: blocks keep their contact-implied velocity
        # after separation, decaying under Coulomb ground friction — the
        # 10-gram block escapes the pusher's path instead of staying glued
        speed = jnp.linalg.norm(bvel, axis=-1, keepdims=True)
        bvel = bvel * jnp.maximum(
            0.0, 1.0 - GROUND_DECEL * SUB_DT / jnp.maximum(speed, 1e-9))
        byr = byr * jnp.maximum(
            0.0, 1.0 - YAW_DECEL * SUB_DT / jnp.maximum(jnp.abs(byr), 1e-9))
        pos_start = bpos + bvel * SUB_DT
        yaw_start = byaw + byr * SUB_DT

        # 2) quasi-static contact resolution (motion-cone push model)
        p0, y0, c0 = _push_block(pos_start[0], yaw_start[0], eff,
                                 EFFECTOR_RADIUS, friction_k2, de)
        p1, y1, c1 = _push_block(pos_start[1], yaw_start[1], eff,
                                 EFFECTOR_RADIUS, friction_k2, de)
        # block-block separation
        bb_pen = 2 * BLOCK_BLOCK_RADIUS - jnp.linalg.norm(p1 - p0)
        p0, p1 = _separate_blocks(p0, p1)
        pos_new = jnp.stack([p0, p1])
        yaw_new = jnp.stack([y0, y1])

        # 3) contact implies velocity: a touched block moves WITH the
        # resolution this substep and keeps that velocity when contact
        # ends — capped at the pusher's own speed (restitution-0 contact
        # cannot fling the block faster than the thing pushing it; the
        # penetration-resolution spikes of corner contacts would otherwise
        # kick at the full substep cap)
        touched = jnp.stack([c0, c1]) | (bb_pen > 0)
        v_imp = (pos_new - bpos) / SUB_DT
        eff_speed = step_len / SUB_DT
        v_mag = jnp.linalg.norm(v_imp, axis=-1, keepdims=True)
        v_imp = v_imp * jnp.minimum(1.0, eff_speed / jnp.maximum(v_mag, 1e-9))
        w_imp = (yaw_new - byaw) / SUB_DT
        w_imp = jnp.clip(w_imp, -eff_speed / BLOCK_HALF,
                         eff_speed / BLOCK_HALF)
        # low-pass toward the implied velocity: real pushing is chattering
        # contact whose duty cycle holds the block near the pusher's
        # AVERAGE speed; refreshing to the instantaneous substep speed
        # would launch the block at the effector's burst speed (1 m/s)
        # when the stroke ends, coasting ~5 cm past the MuJoCo block
        bvel = jnp.where(touched[:, None],
                         KICK_ALPHA * v_imp + (1 - KICK_ALPHA) * bvel, bvel)
        byr = jnp.where(jnp.stack([c0, c1]),
                        KICK_ALPHA * w_imp + (1 - KICK_ALPHA) * byr, byr)
        return (eff, pos_new, yaw_new, bvel, byr), None

    (eff, bpos, byaw, bvel, byr), _ = jax.lax.scan(
        substep, (state.effector, state.block_pos, state.block_yaw,
                  state.block_vel, state.block_yawrate),
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
        steps=state.steps + 1, block_vel=bvel, block_yawrate=byr)

    # freeze finished envs
    frozen = jax.tree.map(
        lambda new, old: jnp.where(
            jnp.reshape(state.done, state.done.shape + (1,) * (new.ndim - state.done.ndim)),
            old, new),
        new_state, state)
    reward = jnp.where(state.done, 0.0, reward)
    return frozen, block_push_obs(frozen), reward, frozen.done
