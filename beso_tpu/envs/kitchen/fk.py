"""Franka Emika Panda forward kinematics in JAX.

The adept_envs Franka Kitchen robot is a 7-DoF Panda; its published
(modified-DH, Craig convention) parameters are used to compute the
end-effector position for the kitchen surrogate dynamics — replacing the
MuJoCo site lookup of the external `adept_envs` dependency
(reference `beso/envs/franka_kitchen/kitchen_env.py:2-3` imports it).

Parity test anchor: the zero-pose flange position and reach radius match the
published Panda geometry (see tests/test_envs.py).
"""

from __future__ import annotations

import jax.numpy as jnp

# modified DH rows: (a_{i-1}, d_i, alpha_{i-1}) for joints 1..7 + flange
_PANDA_DH = (
    (0.0, 0.333, 0.0),
    (0.0, 0.0, -jnp.pi / 2),
    (0.0, 0.316, jnp.pi / 2),
    (0.0825, 0.0, jnp.pi / 2),
    (-0.0825, 0.384, -jnp.pi / 2),
    (0.0, 0.0, jnp.pi / 2),
    (0.088, 0.0, jnp.pi / 2),
)
_FLANGE_D = 0.107
_GRIPPER_TIP_D = 0.103  # flange -> fingertip (Franka hand)


def _mdh_transform(a, d, alpha, theta):
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    return jnp.asarray([
        [ct, -st, 0.0, a],
        [st * ca, ct * ca, -sa, -d * sa],
        [st * sa, ct * sa, ca, d * ca],
        [0.0, 0.0, 0.0, 1.0],
    ])


def panda_fk(q: jnp.ndarray, base_pos=(0.0, 0.0, 0.0),
             tip_offset: float = _FLANGE_D + _GRIPPER_TIP_D) -> jnp.ndarray:
    """End-effector (fingertip) world position for joint angles q[7]."""
    T = jnp.eye(4)
    for i, (a, d, alpha) in enumerate(_PANDA_DH):
        T = T @ _mdh_transform(a, d, alpha, q[i])
    T = T @ _mdh_transform(0.0, tip_offset, 0.0, 0.0)
    return T[:3, 3] + jnp.asarray(base_pos)
