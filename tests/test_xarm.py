"""xArm6 FK/IK + pose math tests, mirroring the reference's ONLY test files
(`beso/envs/block_pushing/utils/xarm_sim_robot_test.py`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.envs.block_push.xarm import HOME_JOINTS, xarm_fk, xarm_fk_pose, xarm_ik
from beso_tpu.envs.pose3d import (
    Pose3d,
    matrix_from_quat,
    quat_from_matrix,
    quat_from_rotvec,
    quat_mul,
    quat_to_rotvec,
    yaw_from_quat,
)


class TestXArmFK:
    def test_forward_kinematics_golden(self):
        """Golden values from the reference test (xarm_sim_robot_test.py:47-62)."""
        # pointing down the X axis
        pos, _ = xarm_fk(jnp.asarray([0.0, math.pi / 2, math.pi, 0, 0, 0]))
        assert abs(float(pos[0]) - 0.714479) < 1e-3
        assert abs(float(pos[1]) - (-0.0006)) < 1e-3
        # pointing down the Y axis
        pos, _ = xarm_fk(jnp.asarray([math.pi / 2, math.pi / 2, math.pi, 0, 0, 0]))
        assert abs(float(pos[0]) - 0.0006) < 1e-3
        assert abs(float(pos[1]) - 0.714479) < 1e-3

    def test_ik_fk_roundtrip(self):
        """IK -> FK round-trips a target pose to 2 decimals
        (xarm_sim_robot_test.py:64-76)."""
        target = Pose3d(rotation=quat_from_rotvec(jnp.asarray([0.0, math.pi / 2, 0.0])),
                        translation=jnp.asarray([0.5, 0.0, 0.10]))
        q = xarm_ik(target, HOME_JOINTS)
        pose = xarm_fk_pose(q)
        np.testing.assert_allclose(pose.translation, target.translation, atol=1e-2)
        # compare orientations via the relative rotation angle (sign-free)
        from beso_tpu.envs.pose3d import quat_conj
        dq = quat_mul(target.rotation, quat_conj(pose.rotation))
        angle = float(jnp.linalg.norm(quat_to_rotvec(dq)))
        assert angle < 0.05

    def test_fk_jittable_and_batched(self):
        qs = jax.random.uniform(jax.random.PRNGKey(0), (8, 6), minval=-1, maxval=1)
        pos = jax.jit(jax.vmap(lambda q: xarm_fk(q)[0]))(qs)
        assert pos.shape == (8, 3)
        assert float(jnp.linalg.norm(pos, axis=1).max()) < 1.2  # reach bound


class TestPose3d:
    def test_quat_matrix_roundtrip(self):
        rv = jnp.asarray([0.3, -0.5, 0.7])
        q = quat_from_rotvec(rv)
        R = matrix_from_quat(q)
        q2 = quat_from_matrix(R)
        # q and -q are the same rotation
        assert min(float(jnp.linalg.norm(q - q2)),
                   float(jnp.linalg.norm(q + q2))) < 1e-5
        np.testing.assert_allclose(quat_to_rotvec(q), rv, atol=1e-5)

    def test_yaw(self):
        q = quat_from_rotvec(jnp.asarray([0.0, 0.0, 1.1]))
        assert abs(float(yaw_from_quat(q)) - 1.1) < 1e-5

    def test_vec7(self):
        p = Pose3d(rotation=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                   translation=jnp.asarray([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(p.vec7, [1, 2, 3, 0, 0, 0, 1])

    def test_scipy_cross_check(self):
        from scipy.spatial.transform import Rotation

        rv = np.asarray([0.2, 0.9, -0.4])
        want = Rotation.from_rotvec(rv).as_quat()
        got = np.asarray(quat_from_rotvec(jnp.asarray(rv)))
        np.testing.assert_allclose(got, want, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(matrix_from_quat(jnp.asarray(want))),
            Rotation.from_rotvec(rv).as_matrix(), atol=1e-6)
