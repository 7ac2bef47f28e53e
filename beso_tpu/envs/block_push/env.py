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
XArm IK + Bullet contact solve is replaced by a PLANAR RIGID-BODY
integrator at the same 240 Hz substep rate (round 4): blocks carry
(velocity, yaw-rate) state; the effector is a velocity-limited kinematic
point-tracker (the 24-substep position-controlled arm behaves as a
critically damped tracker, SURVEY.md 7.3#2) exerting a soft spring-damper
contact force with a tipping-plateau law; ground friction acts at the 4
face corners (a discrete limit surface coupling translation/rotation).
Every constant is URDF-derived or calibrated against instrumented
host-MuJoCo golden rollouts of the identical scene — see
_solve_contact_velocities and scripts/calibrate_block_push.py. Rejection
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
SUB_DT = CONTROL_DT / N_SUBSTEPS

# ---- rigid-body dynamics constants (round 4: velocity-level contact) ----
# The multimodal env integrates full planar rigid-body dynamics per 240 Hz
# substep (explicit contact forces + 4-point ground friction), matching
# the KIND of simulation the reference evaluates in (Bullet stepping at
# 240 Hz, block_pushing.py:269-281,564-567) instead of a quasi-static
# surrogate. Every constant below is either a URDF value or calibrated
# against instrumented host-MuJoCo golden rollouts of the same scene
# (scripts/calibrate_block_push.py).
BLOCK_MASS = 0.01              # kg (block2.urdf)
GRAVITY = 9.81
GROUND_MU = 1.0                # floor lateral friction (URDF / golden scene)
# Effective pusher-block Coulomb friction. The URDFs specify 1.0, but the
# golden scene's contact is chattering and pitch-rocking (intermittent,
# partial-footprint), so the EFFECTIVE tangential drag over a control
# step is far below the nominal cone (at 1.0 the block is dragged along
# with the pusher and the measured lateral escape — vx to -0.34 m/s in
# the instrumented off-center burst — never happens). The round-5
# rotational-leg sweep (calibrate_block_push.py --rot-sweep, VERDICT r4
# #4a) selects 0.05: the round-4 value 0.1 over-torqued every stable
# scripted push (yaw RMSE 13.2 deg; tangential drag at the contact arm is
# the dominant spin injector). With the full round-5 config (0.05 +
# TIP_TORQUE_LEAK 0 + gated dithers) the stable-5 lands yaw RMSE 9.5 deg
# with pos RMSE 4.0 mm held, and the randomized-ensemble stats sit at
# carry 20.4 vs MuJoCo 26.6 mm, |dyaw| 9.5 vs 12.2 deg (RESULTS.md r5).
CONTACT_MU = 0.05
# Tipping-plateau force law: pushing a cube at ~center height tips it
# once F > m g a / h_c ~ 2x the block weight — beyond that the block
# pitches onto its leading edge and the pusher overruns while the block
# sheds the push (the per-substep instrumented golden scene shows Fn
# plateauing at 0.1-0.3 N with deep apparent xy-overlap and z-lift /
# pitch rocking). A tipped block still transmits a FRACTION of the excess
# (TIP_LEAK), which is what lets sustained two-block trains plow and
# prevents pass-through at deep penetration.
FN_CAP = 0.16                  # N: the tipping plateau (~1.6x block weight)
TIP_LEAK = 0.1                 # fraction of force above the plateau kept
# BACKED blocks are exempt from the plateau: the plateau models ESCAPE
# (an over-pushed free cube pitch-rocks onto its leading edge and sheds
# the stroke), and a block braced by another block ahead cannot tip —
# the rotation about its leading bottom edge is blocked. The MuJoCo bib
# golden shows the consequence: the pusher drives the two-block TRAIN at
# full stroke speed (b0 -0.200 -> +0.148 over 12 steps, both blocks
# together), while a capped-force surrogate stalls the train and then
# TUNNELS the pusher through the stalled block. When the far-side block
# sits within this margin of contact inside a cone around the push
# direction, the above-plateau excess transmits in full.
# (An alternative mechanism — ground-grip LOSS while tipped, TIP_GRIP —
# measured NEGATIVE: it sent stable-scenario yaw RMSE to 16-37 deg while
# moving the train only ~5 mm; see RESULTS.md round 5.)
BACKED_MARGIN = 0.005          # m beyond bb contact distance
BACKED_COS = 0.6               # cone: dot(push dir, dir to other block)
# Range within which a block ahead in the push cone preempts the free-plow
# escape (the angle-dither gate below): the MuJoCo central plow develops
# its pitch-rock escape over ~100 mm of carry, so a collision closer than
# that terminates the plow before the escape can develop. block_into_block
# starts at 90 mm separation (gated); the central scenario's far block is
# 0.89 m away (ungated).
PLOW_RANGE = 0.12
# Contact stiffness multiplier while backed. MuJoCo's solref constraint
# is an IMPEDANCE spec: the solver supplies whatever force removes the
# violation within tau = 0.02 s against the EFFECTIVE resisting inertia,
# so pushing a braced two-block train doubles the delivered force at the
# same penetration. A fixed k = m/tau^2 (one free block's impedance)
# under-delivers against the train, the pusher overruns ever deeper and
# eventually passes the block center, where the face-slab normal flips —
# a tunneling ratchet the golden trace showed as the train freezing at
# y=-0.10..-0.15 while MuJoCo's train rides the full stroke.
BACKED_STIFF = 8.0
# The TORQUE leg of the pusher contact carries its own above-plateau leak
# knob (hypothesis: a tipped block pitch-rocks onto its leading edge,
# moving the support line and shedding the leaked force's yaw moment).
# The round-5 sweep (calibrate_block_push.py --rot-sweep) measured the
# split's effect at only ~0.4-0.6 deg of stable yaw RMSE — CONTACT_MU is
# the dominant rotational leg — and the MuJoCo-closest config keeps the
# torque leak equal to TIP_LEAK (i.e. no split); the knob stays for the
# calibration tool. Round-5 band selection: the torque leg keeps NONE of
# the above-plateau force (TIP_TORQUE_LEAK = 0): with the force leg's 0.1
# leak also coupled into yaw, the stable-5 scripted yaw RMSE sat at
# 10.1 deg (off-center pushes over-rotate CCW); decoupling it lands
# 9.1-9.5 deg with pos RMSE 4.1 mm held (calibrate_block_push.py
# --rot-sweep table, RESULTS.md round 5).
TIP_TORQUE_LEAK = 0.0
DAMP_RATIO = 1.0               # damper bound as a multiple of the spring
CORNER_RADIAL = False          # corner-region normal: face slab vs radial
# SOFT spring-damper contact, the MuJoCo default solref = (0.02 s, zeta 1)
# the golden scenes run: k = m / tau^2, b = 2 m / tau. Instrumenting the
# golden scene per-substep (scripts/calibrate_block_push.py --burst) shows
# this softness DOMINATES the macroscopic behavior: the 10-gram block lags
# the 1 m/s pusher (peaks ~0.67 m/s face-on), the pusher deeply overruns,
# and the block sheds the push by sliding off obliquely within 1-2 control
# steps — even a face-on 420 mm stroke carries the block only ~44 mm. A
# hard non-penetration constraint (and the round-3 positional projection)
# glues the block to the pusher instead, which was the root cause of the
# 2.3x push-parallel carry residual (VERDICT r3 #1).
CONTACT_K = BLOCK_MASS / (0.02 * 0.02)      # 25 N/m   (m / tau^2)
CONTACT_B = 2.0 * BLOCK_MASS / 0.02         # 1 N s/m  (2 m / tau)
# Coulomb smoothing velocity for tanh(v / V_EPS) friction regularization
# (small enough that resting-contact creep stalls; the per-point impulse
# cap prevents stop-reverse oscillation at this sharpness)
V_EPS = 0.002
# Contact-point dither (m, std-scale): zero-mean state-hashed jitter of the
# pusher contact point, the symmetry-breaking the real sim has and the
# round-4 surrogate lacked (VERDICT r4 #4b). MuJoCo's aligned plows shed
# the block at an unpredictable point via numerical symmetry-breaking
# (self-dispersion 30-50 mm under +-0.5 mm initial perturbation); the
# deterministic surrogate plow stayed on-axis and over-carried with 7x
# too little dispersion (block_into_block band -0.139+-0.007 vs MuJoCo
# -0.061+-0.050). The dither is DETERMINISTIC in the state (a sin-hash of
# block pose + pusher position, not an RNG), so identical states replay
# identically — chaos emulation, not stochastic physics. Magnitude set by
# the dispersion-band sweep (calibrate_block_push.py --dither-sweep).
CONTACT_DITHER = 5e-4
# Normal-angle dither at the pusher contact (rad, uniform scale): the
# golden scene's pitch-rocking block presents a wobbling face to the
# pusher, steering the push off-axis — the escape mechanism that sheds
# MuJoCo's aligned central plows mid-stroke (their measured carry is
# SHORTER and more dispersed than a stable on-axis plow).
DITHER_ANG = 0.08
# Block-block face-normal dither (rad): zero-mean rotation of the
# box-disk block-block contact normal — the residual wobble of MuJoCo's
# box-box contact whose normal jumps between candidate faces as the
# touching blocks pitch-rock. Rides the same state-hash stream as the
# pusher dithers.
BB_DITHER_ANG = 0.08
# Block-block contact geometry: True = 2-point box-box manifold
# (_box_box_manifold — transmits contact torque, damping the relative
# spin of a shedding train); False = the single-point symmetric
# box-vs-disk pair it replaced (kept for A/B measurement).
BB_BOX_BOX = True
# Ground friction: the box-on-plane contact discretized at the 4 FACE
# CORNERS (+-half, +-half), each carrying m g / 4 — exactly where MuJoCo
# places the box-plane contact points in the golden scene. The corner
# placement (arm 28 mm vs the gyration-matched 16 mm) gives the stronger
# rotational leg of the friction limit surface the measured rollouts
# show: it is what keeps ensemble |dyaw| near MuJoCo's 12 deg instead of
# letting knocked blocks spin out (calibration sweep; gyration-matched
# points measured ensemble yaw 6 deg higher).
_GROUND_PTS = jnp.asarray([[1.0, 1.0], [1.0, -1.0], [-1.0, 1.0],
                           [-1.0, -1.0]]) * BLOCK_HALF
F_G_MAX = GROUND_MU * BLOCK_MASS * GRAVITY / 4.0   # per-point Coulomb limit

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


def _perp(v):
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


_HASH_W = jnp.asarray([[12.9898, 78.233, 37.719, 93.989, 53.711],
                       [26.651, 9.271, 61.423, 41.339, 83.155],
                       [7.151, 94.673, 17.923, 57.341, 31.117],
                       [68.237, 23.989, 88.409, 11.131, 47.777]])
_HASH_F = jnp.asarray([43.7585453, 24.6346345, 36.1274199, 52.9832117])


def _hash_noise(bpos, byaw, eff):
    """Zero-mean pseudo-noise in [-1, 1]^4, a pure sin-hash of the contact
    configuration (block pose + pusher position). Deterministic chaos
    seeding for the contact dithers: any two trajectories that differ by
    even 0.5 mm see decorrelated dither streams, while identical states
    replay identically (determinism tests stay exact)."""
    u = jnp.concatenate([bpos, byaw[None], eff])
    s = jnp.sin((_HASH_W @ u) * _HASH_F)
    return 2.0 * jnp.mod(s * 10.0 * _HASH_F[::-1], 1.0) - 1.0


def _box_point_geom(block_pos, block_yaw, point, radius,
                    radial_corner: bool = False):
    """Disk-vs-oriented-box closest-point geometry (shared by the
    quasi-static law and the dynamic solver).

    Returns (pen, n_in, c_local, R): penetration depth, inward contact
    normal in the LOCAL frame (the direction the block moves to separate),
    the closest point on the box in the local frame, and the rotation.
    The normal is the face normal of the deepest-crossed slab ALSO in the
    corner region — MuJoCo's box-cylinder collider reports face-aligned
    normals there (traced on the golden ensemble); the center direction is
    kept only for the degenerate inside-the-box case."""
    R = _rot(block_yaw)
    local = R.T @ (point - block_pos)
    clamped = jnp.clip(local, -BLOCK_HALF, BLOCK_HALF)
    delta = local - clamped
    dist = jnp.linalg.norm(delta)
    inside = dist < 1e-9
    face = jnp.where(local >= 0, BLOCK_HALF - local, -BLOCK_HALF - local)
    pen = jnp.where(inside, radius + jnp.min(jnp.abs(face)), radius - dist)
    p_ax = jnp.abs(local) - BLOCK_HALF
    corner = jnp.all(p_ax > 0)
    ax = jnp.argmin(p_ax)
    n_face = -jnp.sign(local[ax]) * jnp.eye(2)[ax]
    n_out = delta / jnp.maximum(dist, 1e-9)            # surface -> effector
    to_center = -local / jnp.maximum(jnp.linalg.norm(local), 1e-9)
    corner_n = -n_out if radial_corner else n_face
    n_in = jnp.where(inside, to_center, jnp.where(corner, corner_n, -n_out))
    return pen, n_in, clamped, R


def _box_box_manifold(pos_a, yaw_a, pos_b, yaw_b, half):
    """Two-point contact manifold between two oriented squares of
    half-extent `half` — 2-D SAT reference-face selection + incident-face
    clipping (the classic Box2D box-box algorithm, planarized).

    Round-5 upgrade over the box-vs-disk pair: a SINGLE-point block-block
    contact cannot resist relative yaw, so a shedding two-block train
    spun ~2.4x wilder than MuJoCo's box-box train (RESULTS round 5:
    block_into_block yaw std 28.3 vs 11.8 deg at n=64). A 2-point face
    manifold transmits the contact torque that damps relative spin while
    keeping the face-normal geometry whose positive feedback lets a
    rotated train shed (the round-5 fix for the r4 train stall).

    Returns (pen[2], n[2], pts[2,2], live[2]): up to two world-frame
    contact points with a shared unit normal pointing from box A toward
    box B; a point is active iff `live[k]` (pen already folded in).
    """
    Ra, Rb = _rot(yaw_a), _rot(yaw_b)
    d = pos_b - pos_a
    axes = jnp.stack([Ra[:, 0], Ra[:, 1], Rb[:, 0], Rb[:, 1]])   # [4, 2]
    ra = half * (jnp.abs(axes @ Ra[:, 0]) + jnp.abs(axes @ Ra[:, 1]))
    rb = half * (jnp.abs(axes @ Rb[:, 0]) + jnp.abs(axes @ Rb[:, 1]))
    sep = jnp.abs(axes @ d) - (ra + rb)              # < 0 on overlap
    overlap = jnp.all(sep < 0)
    k = jnp.argmax(sep)                              # minimal penetration
    axis = axes[k]
    n = axis * jnp.where(jnp.dot(axis, d) >= 0, 1.0, -1.0)      # A -> B
    a_is_ref = k < 2
    pos_ref = jnp.where(a_is_ref, pos_a, pos_b)
    pos_inc = jnp.where(a_is_ref, pos_b, pos_a)
    R_inc = jnp.where(a_is_ref, Rb, Ra)
    n_out = jnp.where(a_is_ref, n, -n)               # ref -> incident
    t_ref = _perp(n_out)
    # incident face: the face of the incident box whose outward normal is
    # most anti-parallel to the reference normal
    cand_n = jnp.stack([R_inc[:, 0], -R_inc[:, 0],
                        R_inc[:, 1], -R_inc[:, 1]])
    face_n = cand_n[jnp.argmin(cand_n @ n_out)]
    face_t = _perp(face_n)
    face_c = pos_inc + face_n * half
    # clip the incident segment p(s) = face_c + s*half*face_t, s in [-1,1],
    # to the reference face's side slab |t_ref . (p - pos_ref)| <= half
    c0 = jnp.dot(t_ref, face_c - pos_ref)
    dc = half * jnp.dot(t_ref, face_t)
    par = jnp.abs(dc) < 1e-9                         # faces ~parallel in t
    denom = jnp.where(par, jnp.where(dc < 0, -1e-9, 1e-9), dc)
    s1 = (-half - c0) / denom
    s2 = (half - c0) / denom
    s_lo = jnp.maximum(jnp.minimum(s1, s2), -1.0)
    s_hi = jnp.minimum(jnp.maximum(s1, s2), 1.0)
    inside_par = jnp.abs(c0) <= half
    s_lo = jnp.where(par, jnp.where(inside_par, -1.0, 1.0), s_lo)
    s_hi = jnp.where(par, jnp.where(inside_par, 1.0, -1.0), s_hi)
    svals = jnp.stack([s_lo, s_hi])
    pts = face_c[None, :] + svals[:, None] * (half * face_t)[None, :]
    pen = half - (pts - pos_ref[None, :]) @ n_out
    live = overlap & (s_lo <= s_hi) & (pen > 0)
    return pen, n, pts, live


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
    pen, n_in, clamped, R = _box_point_geom(block_pos, block_yaw, point,
                                            radius)
    # cap the per-substep penetration at the effector's substep advance
    # (rotation feeding back into penetration is resolved by slip, but the
    # cap also bounds the one-substep impulse for deep spawn overlaps)
    pen = jnp.clip(pen, 0.0, EFFECTOR_SPEED * CONTROL_DT / N_SUBSTEPS)
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


def _solve_contact_velocities(bpos, byaw, bvel, byr, eff, v_push, inv_i):
    """One substep's contact-force integration (round 4, VERDICT r3 #1).

    Explicit planar rigid-body forces at 240 Hz, the same regime the
    reference evaluates in (`block_pushing.py:269-281,564-567`; golden
    data from the identical MuJoCo scene):

    * pusher-block: SOFT spring-damper normal force Fn = max(0, k pen +
      b closing_speed) with the golden scene's solref (0.02 s, zeta 1)
      constants — the compliance is load-bearing: the block LAGS the
      1 m/s pusher, the pusher overruns, and the block sheds the stroke
      by sliding off obliquely (a hard constraint glues it and carries
      2.3x too far). Tangential Coulomb force mu Fn tanh(v_t / V_EPS).
    * block-block: same spring-damper law between the two disks.
    * ground friction: 4 points per block at the face corners (the golden
      scene's box-plane contact placement), each Coulomb-clamped toward
      zero point velocity — a discrete limit surface coupling
      translational and rotational friction. Per-point impulses are
      capped so friction can stop but never reverse a point's motion
      within a substep.

    Returns (bvel, byr) after force integration; caller advances poses."""
    inv_m = 1.0 / BLOCK_MASS
    forces = jnp.zeros((2, 2))
    torques = jnp.zeros((2,))

    # block-block adjacency (the backed-block plateau exemption below)
    d01 = bpos[1] - bpos[0]
    dist01 = jnp.linalg.norm(d01)
    dir01 = d01 / jnp.maximum(dist01, 1e-9)
    near_bb = dist01 < 2 * BLOCK_BLOCK_RADIUS + BACKED_MARGIN

    # pusher-block spring-damper + Coulomb tangent
    for b in range(2):
        pen, n_l, c_l, R_b = _box_point_geom(bpos[b], byaw[b], eff,
                                             EFFECTOR_RADIUS,
                                             radial_corner=CORNER_RADIAL)
        to_other = dir01 if b == 0 else -dir01
        ahead = jnp.dot(R_b @ n_l, to_other) > BACKED_COS
        backed = near_bb & ahead
        plow_blocked = ahead & (dist01 < PLOW_RANGE)
        if CONTACT_DITHER > 0.0 or DITHER_ANG > 0.0:
            # symmetry-breaking contact dithers (see the constants). The
            # ANGLE dither is gated off whenever the OTHER block lies
            # ahead in the push cone within PLOW_RANGE: the
            # wobbling contact face it models is the pitch-rocking escape
            # of a long FREE plow, and a plow aimed at another block
            # terminates in that collision instead — while a braced block
            # cannot pitch-rock at all (same argument as the plateau
            # exemption). Ungated, the angle dither threw the braced
            # block_into_block yaw to +7.9+-22.5 deg vs MuJoCo's
            # -5.0+-3.7 band; gating only on contact (`backed`) still
            # left +10.2+-22.8 — the yaw was injected during the 33 mm
            # approach BEFORE the blocks touched. The range bound keeps
            # the gate away from the central scenario, whose far block
            # sits 0.89 m off yet inside the 0.6 cone.
            h = _hash_noise(bpos[b], byaw[b], eff)
            live = pen > 0
            c_l = c_l + jnp.where(live, CONTACT_DITHER, 0.0) * h[0:2]
            ang = jnp.where(live & ~plow_blocked, DITHER_ANG, 0.0)
            n_l = _rot(ang * h[2]) @ n_l
        n = R_b @ n_l                        # direction block separates
        r = R_b @ c_l                        # contact arm (world)
        u = bvel[b] + byr[b] * _perp(r) - v_push
        closing = -jnp.dot(n, u)             # >0 when approaching
        k_eff = CONTACT_K * jnp.where(backed, BACKED_STIFF, 1.0)
        spring = k_eff * pen
        # damper bounded by the elastic term (first-touch forces ramp from
        # zero; a raw b*closing term at 1 m/s would inject ~1 N bursts)
        damper = jnp.minimum(CONTACT_B * closing, DAMP_RATIO * spring)
        # tipping plateau with leak-through (see the constants above)
        raw = jnp.maximum(spring + damper, 0.0)
        capped = jnp.minimum(raw, FN_CAP)
        excess = jnp.maximum(raw - FN_CAP, 0.0)
        # backed-block exemption: braced against the other block along the
        # push direction -> tipping is blocked, full force transmits
        leak = jnp.where(backed, 1.0, TIP_LEAK)
        fn = jnp.where(pen > 0, capped + leak * excess, 0.0)
        # torque leg: own above-plateau leak (pitch-rocking sheds the yaw
        # moment of the leaked force; see the TIP_TORQUE_LEAK constant)
        fn_tq = jnp.where(pen > 0,
                          capped + jnp.where(backed, 1.0, TIP_TORQUE_LEAK)
                          * excess, 0.0)
        t = _perp(n)
        vt = jnp.dot(t, u)
        ft = -CONTACT_MU * fn * jnp.tanh(vt / V_EPS)
        f = fn * n + ft * t
        forces = forces.at[b].add(f)
        torques = torques.at[b].add(_cross2(r, fn_tq * n + ft * t))

    # block-block contact. The round-4 disk-disk law was center-aligned
    # and RESTORING — the normal always pointed center-to-center, so a
    # pushed two-block train was PERFECTLY stable and stalled against
    # doubled ground friction where MuJoCo's train wedges apart (its
    # box-box contact reports the FACE normal of the touched box: once
    # the pusher-side block rotates even slightly, its face normal
    # deflects the far block sideways, the offset grows the deflection —
    # positive feedback — and the far block escapes, letting the pushed
    # block carry on at single-block resistance). Round 5 first replaced
    # it with a symmetric box-vs-disk pair (face normals, the escape
    # feedback above), then upgraded to the full 2-point box-box manifold
    # (BB_BOX_BOX): the single-point pair could not resist relative yaw,
    # shedding with 2.4x MuJoCo's spin dispersion. The effective
    # half-extent keeps the calibrated face-on contact distance of the
    # disk-disk law (2 * BLOCK_BLOCK_RADIUS).
    if BB_BOX_BOX:
        h_eff = BLOCK_BLOCK_RADIUS            # = BLOCK_HALF + margin
        pen_bb, n, pts, live = _box_box_manifold(bpos[0], byaw[0],
                                                 bpos[1], byaw[1], h_eff)
        if BB_DITHER_ANG > 0.0:
            h_bb = _hash_noise(bpos[0], byaw[0] - byaw[1], bpos[1])
            n = _rot(jnp.where(jnp.any(live), BB_DITHER_ANG, 0.0)
                     * h_bb[2]) @ n
        n_a = -n                              # direction block 0 separates
        t = _perp(n_a)
        for p in range(2):
            r_i = pts[p] - bpos[0]            # arm on block 0 (world)
            r_j = pts[p] - bpos[1]            # arm on block 1 (world)
            u = ((bvel[0] + byr[0] * _perp(r_i))
                 - (bvel[1] + byr[1] * _perp(r_j)))
            closing_bb = -jnp.dot(n_a, u)
            spring_bb = CONTACT_K * pen_bb[p]
            damper_bb = jnp.minimum(CONTACT_B * closing_bb,
                                    DAMP_RATIO * spring_bb)
            fn_bb = jnp.where(live[p],
                              0.5 * jnp.maximum(spring_bb + damper_bb, 0.0),
                              0.0)
            ft_bb = -CONTACT_MU * fn_bb * jnp.tanh(jnp.dot(t, u) / V_EPS)
            f = fn_bb * n_a + ft_bb * t
            forces = forces.at[0].add(f).at[1].add(-f)
            torques = (torques.at[0].add(_cross2(r_i, f))
                       .at[1].add(_cross2(r_j, -f)))
    else:
        r_bb = 2 * BLOCK_BLOCK_RADIUS - BLOCK_HALF
        for i, j in ((0, 1), (1, 0)):
            pen_bb, n_l, c_l, R_i = _box_point_geom(bpos[i], byaw[i],
                                                    bpos[j], r_bb)
            live_bb = pen_bb > 0
            if BB_DITHER_ANG > 0.0:
                h_bb = _hash_noise(bpos[i], byaw[i] - byaw[j], bpos[j])
                n_l = _rot(jnp.where(live_bb, BB_DITHER_ANG, 0.0)
                           * h_bb[2]) @ n_l
            n = R_i @ n_l                  # direction block i separates
            r_i = R_i @ c_l                # contact arm on i (world)
            r_j = bpos[i] + r_i - bpos[j]  # contact arm on j (world)
            u = ((bvel[i] + byr[i] * _perp(r_i))
                 - (bvel[j] + byr[j] * _perp(r_j)))
            closing_bb = -jnp.dot(n, u)
            spring_bb = CONTACT_K * pen_bb
            damper_bb = jnp.minimum(CONTACT_B * closing_bb,
                                    DAMP_RATIO * spring_bb)
            fn_bb = jnp.where(live_bb,
                              0.5 * jnp.maximum(spring_bb + damper_bb, 0.0),
                              0.0)
            t = _perp(n)
            ft_bb = -CONTACT_MU * fn_bb * jnp.tanh(jnp.dot(t, u) / V_EPS)
            f = fn_bb * n + ft_bb * t
            forces = forces.at[i].add(f).at[j].add(-f)
            torques = (torques.at[i].add(_cross2(r_i, f))
                       .at[j].add(_cross2(r_j, -f)))

    bvel = bvel + forces * (SUB_DT * inv_m)
    byr = byr + torques * (SUB_DT * inv_i)

    # ground friction: 4-point limit surface solved by sequential impulses
    # with accumulated-impulse Coulomb clamping (3 iterations) — proper
    # STATIC friction: each point's impulse drives its material-point
    # velocity to zero (2x2 effective-mass solve) and the accumulator is
    # clamped to mu (m g / 4) h. One un-iterated pass leaves ~20% of an
    # injected spin per substep, which integrates into a slow parasitic
    # pivot of blocks resting against the pusher.
    lam_max = F_G_MAX * SUB_DT
    for b in range(2):
        r_g = _GROUND_PTS @ _rot(byaw[b]).T          # [4, 2] world arms
        vb, wb = bvel[b], byr[b]
        lam = jnp.zeros((4, 2))
        for _ in range(3):
            for i in range(4):
                rp = r_g[i]
                p = _perp(rp)
                u = vb + wb * p
                k00 = inv_m + inv_i * p[0] * p[0]
                k11 = inv_m + inv_i * p[1] * p[1]
                k01 = inv_i * p[0] * p[1]
                det = k00 * k11 - k01 * k01
                dj = -jnp.stack([k11 * u[0] - k01 * u[1],
                                 k00 * u[1] - k01 * u[0]]) / det
                newj = lam[i] + dj
                nrm = jnp.linalg.norm(newj)
                newj = newj * jnp.minimum(1.0, lam_max /
                                          jnp.maximum(nrm, 1e-12))
                d = newj - lam[i]
                vb = vb + d * inv_m
                wb = wb + _cross2(rp, d) * inv_i
                lam = lam.at[i].set(newj)
        bvel = bvel.at[b].set(vb)
        byr = byr.at[b].set(wb)
    return bvel, byr


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

    k2 = FRICTION_K2 if friction_k2 is None else friction_k2
    inv_i = 1.0 / (BLOCK_MASS * k2)

    def substep(carry, _):
        eff, bpos, byaw, bvel, byr = carry
        # velocity-limited tracking of the target (kinematic pusher)
        to_tgt = tgt - eff
        d = jnp.linalg.norm(to_tgt)
        step_len = jnp.minimum(d, EFFECTOR_SPEED * SUB_DT)
        de = to_tgt / jnp.maximum(d, 1e-9) * step_len
        eff = eff + de

        # velocity-level contact solve (pusher, block-block, ground
        # friction limit surface), then semi-implicit pose integration
        bvel, byr = _solve_contact_velocities(bpos, byaw, bvel, byr,
                                              eff, de / SUB_DT, inv_i)
        bpos = bpos + bvel * SUB_DT
        byaw = byaw + byr * SUB_DT
        return (eff, bpos, byaw, bvel, byr), None

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
