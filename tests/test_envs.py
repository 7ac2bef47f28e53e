"""Tests for the JAX kitchen and block-push environments + fused rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beso_tpu.envs.block_push.env import (
    GOAL_DIST_TOLERANCE,
    MIN_BLOCK_DIST,
    BlockPushState,
    block_push_obs,
    block_push_reset,
    block_push_step,
)
from beso_tpu.envs.block_push.goals import (
    block_push_goal_frames,
    build_block_push_goals,
    demo_task_order,
)
from beso_tpu.envs.kitchen.env import (
    BONUS_THRESH,
    GOAL_VEC,
    INIT_QPOS,
    OBS_ELEMENT_GOALS,
    OBS_ELEMENT_INDICES,
    kitchen_obs,
    kitchen_reset,
    kitchen_step,
)
from beso_tpu.envs.kitchen.fk import panda_fk
from beso_tpu.envs.kitchen.goals import (
    multigoal_kitchen_goals,
    onehot_kitchen_goals,
    sequential_kitchen_goals,
)
from beso_tpu.data.trajectories import synthetic_kitchen_data, synthetic_push_data


class TestPandaFK:
    def test_zero_pose_height(self):
        # upright zero pose: x = a4 contributions, z ~ d1+d3+d5 minus wrist
        p = np.asarray(panda_fk(jnp.zeros(7)))
        assert 0.7 < p[2] < 1.2  # plausible upright reach
        assert np.isfinite(p).all()

    def test_reach_radius_bound(self):
        # no configuration can exceed the sum of link offsets (~1.2 m)
        keys = jax.random.split(jax.random.PRNGKey(0), 32)
        qs = jax.vmap(lambda k: jax.random.uniform(k, (7,), minval=-2.8, maxval=2.8))(keys)
        ps = jax.vmap(panda_fk)(qs)
        assert float(jnp.linalg.norm(ps, axis=1).max()) < 1.25

    def test_moves_continuously(self):
        q = jnp.zeros(7)
        p0 = panda_fk(q)
        p1 = panda_fk(q.at[0].add(0.01))
        assert 0 < float(jnp.linalg.norm(p1 - p0)) < 0.02


class TestKitchenEnv:
    def test_reset(self):
        s = kitchen_reset(jax.random.PRNGKey(0))
        np.testing.assert_allclose(s.qpos, INIT_QPOS, atol=1e-6)
        assert kitchen_obs(s).shape == (30,)
        assert bool(s.tasks_to_complete.all())
        assert not bool(s.done)

    def test_no_tasks_complete_at_reset(self):
        s = kitchen_reset(jax.random.PRNGKey(0))
        s2, obs, reward, done = kitchen_step(s, jnp.zeros(9))
        assert float(reward) == 0.0
        assert not bool(done)

    def test_completion_logic_exact(self):
        """Manually place the microwave joint at its goal -> reward 1, task
        removed, recompletion does not re-reward (kitchen_env.py:87-120)."""
        s = kitchen_reset(jax.random.PRNGKey(0))
        qpos = s.qpos.at[22].set(float(OBS_ELEMENT_GOALS["microwave"][0]))
        s = s._replace(qpos=qpos)
        s2, _, reward, done = kitchen_step(s, jnp.zeros(9))
        assert float(reward) == 1.0
        assert bool(s2.completed[5])           # microwave is task index 5
        assert not bool(s2.tasks_to_complete[5])
        s3, _, reward2, _ = kitchen_step(s2, jnp.zeros(9))
        assert float(reward2) == 0.0           # no double counting

    def test_all_complete_terminates(self):
        s = kitchen_reset(jax.random.PRNGKey(0))
        s = s._replace(qpos=GOAL_VEC + s.qpos * (GOAL_VEC == 0))
        qpos = jnp.where(jnp.asarray(
            sum([np.isin(np.arange(30), OBS_ELEMENT_INDICES[t]).astype(int)
                 for t in OBS_ELEMENT_GOALS], np.zeros(30, int)) > 0),
            GOAL_VEC, s.qpos)
        s = s._replace(qpos=qpos)
        s2, _, reward, done = kitchen_step(s, jnp.zeros(9))
        assert float(reward) == 7.0
        assert bool(done)

    def test_batched_via_vmap(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 16)
        states = jax.vmap(kitchen_reset)(keys)
        actions = jnp.zeros((16, 9))
        s2, obs, r, d = jax.vmap(kitchen_step)(states, actions)
        assert obs.shape == (16, 30) and r.shape == (16,)

    def test_frozen_after_done(self):
        s = kitchen_reset(jax.random.PRNGKey(0))
        s = s._replace(done=jnp.asarray(True))
        s2, _, r, _ = kitchen_step(s, jnp.ones(9))
        np.testing.assert_allclose(s2.qpos, s.qpos)
        assert float(r) == 0.0

    def test_object_interaction_moves_joint(self):
        """Driving the arm near a handle with motion along the drive dir
        changes the object joint; far away it does not."""
        s = kitchen_reset(jax.random.PRNGKey(0))
        obj_before = np.asarray(s.qpos[9:])
        # random arm wiggling far from handles should leave objects alone
        s2, _, _, _ = kitchen_step(s, jnp.zeros(9).at[7].set(1.0))
        np.testing.assert_allclose(np.asarray(s2.qpos[9:23]),
                                   obj_before[:14], atol=1e-6)


class TestBlockPushEnv:
    def test_reset_distribution(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        states = jax.vmap(block_push_reset)(keys)
        bx = np.asarray(states.block_pos)[..., 0]   # [64, 2]
        assert (np.abs(bx[:, 0] - bx[:, 1]) > MIN_BLOCK_DIST).all()
        assert (np.abs(bx - 0.4) <= 0.1 + 1e-6).all()
        ty = np.asarray(states.target_pos)[..., 1]
        assert (np.abs(ty - 0.2) < 0.01).all()
        tx = np.asarray(states.target_pos)[..., 0]
        # mirrored targets ~0.24 apart in x
        assert (np.abs(tx[:, 0] - tx[:, 1]) > 0.2).all()
        # both orders occur (random flip)
        assert (tx[:, 0] > tx[:, 1]).any() and (tx[:, 0] < tx[:, 1]).any()

    def test_obs_layout(self):
        s = block_push_reset(jax.random.PRNGKey(1))
        obs = np.asarray(block_push_obs(s))
        assert obs.shape == (16,)
        np.testing.assert_allclose(obs[0:2], np.asarray(s.block_pos[0]))
        np.testing.assert_allclose(obs[3:5], np.asarray(s.block_pos[1]))
        np.testing.assert_allclose(obs[6:8], np.asarray(s.effector))
        np.testing.assert_allclose(obs[10:12], np.asarray(s.target_pos[0]))

    def test_effector_tracks_action(self):
        s = block_push_reset(jax.random.PRNGKey(2))
        s2, obs, _, _ = block_push_step(s, jnp.asarray([0.05, 0.05]))
        np.testing.assert_allclose(np.asarray(s2.effector_target),
                                   np.asarray(s.effector_target) + 0.05,
                                   atol=1e-6)
        # effector moved toward the target
        d_before = np.linalg.norm(np.asarray(s.effector - s2.effector_target))
        d_after = np.linalg.norm(np.asarray(s2.effector - s2.effector_target))
        assert d_after < d_before

    def test_pushing_moves_block(self):
        """Drive the effector straight through a block; the block must move."""
        s = block_push_reset(jax.random.PRNGKey(3))
        block0 = np.asarray(s.block_pos[0])
        s = s._replace(effector=jnp.asarray(block0 - np.array([0.06, 0.0])),
                       effector_target=jnp.asarray(block0 - np.array([0.06, 0.0])))
        moved = s
        for _ in range(4):
            moved, _, _, _ = block_push_step(moved, jnp.asarray([0.05, 0.0]))
        assert np.asarray(moved.block_pos[0])[0] > block0[0] + 0.005

    def test_reward_and_completion(self):
        s = block_push_reset(jax.random.PRNGKey(4))
        # teleport block 0 into target 0
        bpos = s.block_pos.at[0].set(s.target_pos[0])
        s = s._replace(block_pos=bpos,
                       effector=jnp.asarray([0.6, -0.45]),
                       effector_target=jnp.asarray([0.6, -0.45]))
        s2, _, reward, done = block_push_step(s, jnp.zeros(2))
        assert reward == pytest.approx(0.49)
        assert bool(s2.completed[0])  # task 2*0+0
        assert not bool(done)
        # teleport block 1 into target 1 -> 0.51 and done
        bpos = s2.block_pos.at[1].set(s2.target_pos[1])
        s3 = s2._replace(block_pos=bpos)
        s4, _, reward2, done2 = block_push_step(s3, jnp.zeros(2))
        assert reward2 == pytest.approx(0.51)
        assert bool(done2)
        assert bool(s4.completed[3])  # task 2*1+1

    def test_same_target_no_success(self):
        s = block_push_reset(jax.random.PRNGKey(5))
        bpos = s.block_pos.at[0].set(s.target_pos[0]).at[1].set(
            s.target_pos[0] + 0.01)
        s = s._replace(block_pos=bpos, effector=jnp.asarray([0.6, -0.45]),
                       effector_target=jnp.asarray([0.6, -0.45]))
        s2, _, reward, done = block_push_step(s, jnp.zeros(2))
        assert not bool(done)
        assert reward == pytest.approx(0.49 * 2)  # both entered target 0


class TestGoalFns:
    def test_kitchen_multigoal(self):
        data = synthetic_kitchen_data(n_traj=24, t_max=60)
        goals, expected = multigoal_kitchen_goals(data, 2, 10, seed=42)
        assert goals.shape == (10, 2, 30) and expected.shape == (10, 7)
        # goals are trajectory tails
        from beso_tpu.data.trajectories import get_split_idx
        train_idx, _ = get_split_idx(24, 42, 0.95)
        T = int(data.lengths[train_idx[0]])
        np.testing.assert_allclose(
            goals[0], data.observations[train_idx[0], T - 2:T])

    def test_kitchen_sequential_and_onehot(self):
        data = synthetic_kitchen_data(n_traj=24, t_max=60)
        g, tf, ids, exp = sequential_kitchen_goals(data, 2, 6, seed=42)
        assert g.shape == (6, 4, 2, 30) and tf.shape == (6, 4)
        assert (tf[:, 3] == 280).all()
        table, exp2 = onehot_kitchen_goals(data, 6, seed=42)
        assert table.shape[0] == 6 and table.shape[2] == 7

    def test_block_push_flip_fix(self):
        data = synthetic_push_data(n_traj=24, t_max=40)
        frames, expected = block_push_goal_frames(data, 8, seed=6)
        assert frames.shape == (8, 16) and expected.shape == (8, 4)
        # construct live obs where target0 matches -> no flip
        obs0 = jnp.asarray(np.tile(frames[0], (2, 1)))
        goals = build_block_push_goals(obs0, jnp.asarray(frames[:2]), 1,
                                       reduce_obs_dim=False)
        np.testing.assert_allclose(np.asarray(goals)[0, 0, 0:2],
                                   frames[0, 0:2], atol=1e-6)
        # live obs with target0 far away -> blocks swapped
        obs_far = obs0.at[:, 10:12].add(1.0)
        goals_f = build_block_push_goals(obs_far, jnp.asarray(frames[:2]), 1,
                                         reduce_obs_dim=False)
        np.testing.assert_allclose(np.asarray(goals_f)[0, 0, 0:2],
                                   frames[0, 3:5], atol=1e-6)

    def test_demo_task_order(self):
        data = synthetic_push_data(n_traj=24, t_max=40)
        order = demo_task_order(data, 8, seed=6)
        assert order.shape == (8, 4)
        assert ((order >= -1) & (order < 4)).all()


class TestKitchenPhysicsV1:
    """Surrogate v1 semantics: gripper-latched kettle grasp, fingertip
    collision, door-tracking handles, parameterized physics."""

    def _run_oracle_kettle(self, force_fingers_open: bool, n_steps: int = 120):
        from beso_tpu.envs.kitchen.oracle import (kitchen_oracle_policy,
                                                  oracle_reset)

        env = kitchen_reset(jax.random.PRNGKey(0))
        carry = oracle_reset()
        seq = jnp.asarray([6, -1, -1, -1], jnp.int32)  # kettle only
        step = jax.jit(lambda e, a: kitchen_step(e, a))
        pol = jax.jit(lambda e, c: kitchen_oracle_policy(e, c, seq))
        for _ in range(n_steps):
            a, carry = pol(env, carry)
            if force_fingers_open:
                a = a.at[7:9].set(1.0)
            env, _, _, _ = step(env, a)
        return env

    def test_kettle_needs_closed_gripper(self):
        """With the fingers forced open the kettle must never move — the
        round-1 teleport-grasp (any nearby fingertip dragged it) is gone."""
        env_open = self._run_oracle_kettle(force_fingers_open=True)
        np.testing.assert_allclose(np.asarray(env_open.qpos[23:26]),
                                   np.asarray(INIT_QPOS[23:26]), atol=1e-5)
        assert not bool(env_open.kettle_grasped)
        assert not bool(env_open.completed[6])

    def test_kettle_grasp_carries_to_goal(self):
        env = self._run_oracle_kettle(force_fingers_open=False)
        assert bool(env.completed[6]), "oracle failed to carry the kettle"

    def test_wall_blocks_fingertip(self):
        """Pushing straight at the cabinet face must stop at the wall plane
        instead of passing through the furniture."""
        from beso_tpu.envs.kitchen.env import (DEFAULT_KITCHEN_PARAMS,
                                               KITCHEN_BASE_POS)
        from beso_tpu.envs.kitchen.fk import panda_fk

        env = kitchen_reset(jax.random.PRNGKey(0))
        step = jax.jit(lambda e, a: kitchen_step(e, a))
        wall_y = float(DEFAULT_KITCHEN_PARAMS.wall_y)
        max_y = -np.inf
        for _ in range(60):
            J = jax.jacfwd(lambda q: panda_fk(q, KITCHEN_BASE_POS))(env.qpos[:7])
            H = J @ J.T + 1e-4 * jnp.eye(3)
            dq = J.T @ jnp.linalg.solve(H, jnp.asarray([0.0, 0.08, 0.0]))
            a = jnp.clip(jnp.concatenate([dq / 0.16, jnp.zeros(2)]), -1, 1)
            env, _, _, _ = step(env, a)
            max_y = max(max_y, float(env.ee_pos[1]))
        assert max_y <= wall_y + 1e-5, f"fingertip penetrated wall: y={max_y}"

    def test_handles_ride_true_arcs(self):
        """v2 arc kinematics: a rotary handle at joint value q sits at the
        Rodrigues rotation of its rest offset about the pivot axis — at
        constant radius, NOT on a line (the round-2 linearization)."""
        from beso_tpu.envs.kitchen.env import (DEFAULT_KITCHEN_PARAMS,
                                               kitchen_handles)

        P = DEFAULT_KITCHEN_PARAMS
        base = kitchen_handles(INIT_QPOS, P)
        q = INIT_QPOS.at[21].set(1.0)  # hinge cabinet primary joint
        moved = kitchen_handles(q, P)

        def in_plane_radius(h):
            r = np.asarray(h - P.pivots[4])
            ax = np.asarray(P.axes[4])
            return np.linalg.norm(r - ax * np.dot(r, ax))

        # constant radius about the hinge
        assert in_plane_radius(moved[4]) == pytest.approx(
            in_plane_radius(base[4]), abs=1e-5)
        # swept angle equals the joint angle
        r0 = np.asarray(base[4] - P.pivots[4])
        r1 = np.asarray(moved[4] - P.pivots[4])
        ax = np.asarray(P.axes[4])
        p0 = r0 - ax * np.dot(r0, ax)
        p1 = r1 - ax * np.dot(r1, ax)
        ang = np.arctan2(np.dot(ax, np.cross(p0, p1)), np.dot(p0, p1))
        assert ang == pytest.approx(1.0 - float(INIT_QPOS[21]), abs=1e-5)
        # other handles unaffected; slide handle translates along its axis
        np.testing.assert_allclose(np.asarray(moved[3]), np.asarray(base[3]),
                                   atol=1e-5)
        q2 = INIT_QPOS.at[19].set(0.3)
        slid = kitchen_handles(q2, P)
        want = np.asarray(base[3]) + np.asarray(P.axes[3]) * (
            0.3 - float(INIT_QPOS[19]))
        np.testing.assert_allclose(np.asarray(slid[3]), want, atol=1e-5)

    def test_perturb_params(self):
        from beso_tpu.envs.kitchen.env import (DEFAULT_KITCHEN_PARAMS,
                                               perturb_kitchen_params)

        P = perturb_kitchen_params(gain_scale=1.2, radius_scale=0.8)
        np.testing.assert_allclose(
            np.asarray(P.drive_eff),
            np.asarray(DEFAULT_KITCHEN_PARAMS.drive_eff) * 1.2)
        assert float(P.interact_radius) == pytest.approx(
            float(DEFAULT_KITCHEN_PARAMS.interact_radius) * 0.8)
