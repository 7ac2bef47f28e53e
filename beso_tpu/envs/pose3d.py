"""Minimal 3D pose math in JAX: quaternions (x, y, z, w), rotvecs, yaw.

Functional parity target: `Pose3d`
(`beso/envs/block_pushing/utils/pose3d.py:40-70`), which wraps
scipy.spatial.transform.Rotation — replaced by pure jnp quaternion ops so
pose math vmaps/jits on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Pose3d(NamedTuple):
    rotation: jnp.ndarray     # quaternion [x, y, z, w]
    translation: jnp.ndarray  # [3]

    @property
    def vec7(self) -> jnp.ndarray:
        """[tx, ty, tz, qx, qy, qz, qw] (pose3d.py:55-58)."""
        return jnp.concatenate([self.translation, self.rotation])


def quat_from_rotvec(rotvec: jnp.ndarray) -> jnp.ndarray:
    angle = jnp.linalg.norm(rotvec)
    safe = jnp.maximum(angle, 1e-12)
    axis = rotvec / safe
    half = angle / 2.0
    xyz = axis * jnp.sin(half)
    return jnp.concatenate([jnp.where(angle > 1e-12, xyz, rotvec / 2.0),
                            jnp.cos(half)[None]])


def quat_to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    q = q * jnp.sign(q[3] + 1e-30)  # shortest arc
    xyz, w = q[:3], q[3]
    n = jnp.linalg.norm(xyz)
    angle = 2.0 * jnp.arctan2(n, w)
    return jnp.where(n > 1e-12, xyz / jnp.maximum(n, 1e-12) * angle, 2.0 * xyz)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return jnp.asarray([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.asarray([-q[0], -q[1], -q[2], q[3]])


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (robust trace-based form)."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick by the largest pivot
    q0 = jnp.asarray([m21 - m12, m02 - m20, m10 - m01, 1 + tr])
    q1 = jnp.asarray([1 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12])
    q2 = jnp.asarray([m01 + m10, 1 - m00 + m11 - m22, m12 + m21, m02 - m20])
    q3 = jnp.asarray([m02 + m20, m12 + m21, 1 - m00 - m11 + m22, m10 - m01])
    cands = jnp.stack([q0, q1, q2, q3])
    pivots = jnp.asarray([1 + tr, 1 + m00 - m11 - m22,
                          1 - m00 + m11 - m22, 1 - m00 - m11 + m22])
    q = cands[jnp.argmax(pivots)]
    return q / jnp.linalg.norm(q)


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    x, y, z, w = q
    return jnp.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def yaw_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Z euler angle ('xyz' convention last component, block_pushing.py:500-501)."""
    x, y, z, w = q
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
