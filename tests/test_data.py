"""Tests for trajectory containers, slicing, goal sampling, transforms."""

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.data import (
    SlicedDataset,
    TrajectoryData,
    blockpush_mask_targets,
    get_split_idx,
    make_slices,
    split_trajectories,
    synthetic_kitchen_data,
    synthetic_push_data,
)


class TestSplit:
    def test_matches_torch_randperm(self):
        import torch

        train, val = get_split_idx(100, seed=42, train_fraction=0.95)
        rng = torch.Generator().manual_seed(42)
        want = torch.randperm(100, generator=rng).tolist()
        assert train == want[:95] and val == want[95:]

    def test_split_trajectories(self):
        data = synthetic_kitchen_data(n_traj=20)
        tr, va = split_trajectories(data, seed=42, train_fraction=0.95)
        assert tr.num_trajectories == 19 and va.num_trajectories == 1


class TestSlices:
    def test_slice_count(self):
        # a trajectory of length T yields T - window + 1 slices
        # (trajectory_loader.py:129-138)
        lengths = np.array([10, 5, 3])
        slices = make_slices(lengths, window=4)
        assert len(slices) == (10 - 4 + 1) + (5 - 4 + 1) + 0
        # short sequence #2 skipped entirely
        assert set(slices[:, 0].tolist()) == {0, 1}

    def test_batch_shapes_and_goal(self):
        data = synthetic_push_data(n_traj=8, t_max=60)
        ds = SlicedDataset(data, window=5, future_conditional=True,
                           future_seq_len=1, min_future_sep=0)
        batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
        assert batch["observation"].shape == (16, 5, 16)
        assert batch["action"].shape == (16, 5, 2)
        assert batch["goal_observation"].shape == (16, 1, 16)

    def test_goal_is_future_frame(self):
        """The sampled goal must be an actual frame from the same trajectory,
        at least min_future_sep past the window end."""
        data = synthetic_kitchen_data(n_traj=4, t_max=50)
        ds = SlicedDataset(data, window=4, future_conditional=True,
                           future_seq_len=2, min_future_sep=3)
        idx = jnp.arange(8)
        batch = ds.batch_at(idx, jax.random.PRNGKey(1))
        slices = np.asarray(ds.slices)[:8]
        obs_np = data.observations
        for b in range(8):
            traj, start = slices[b]
            g = np.asarray(batch["goal_observation"][b])
            T = int(data.lengths[traj])
            # find the goal frame inside the source trajectory
            dists = np.abs(obs_np[traj, :T, None, :] - g[None]).sum((1, 2))
            t_goal = int(dists.argmin())
            assert t_goal >= start + 4 + 3 - 1  # window end + sep (2-frame window)

    def test_tail_goal(self):
        data = synthetic_kitchen_data(n_traj=3, t_max=40)
        ds = SlicedDataset(data, window=4, future_conditional=True,
                           future_seq_len=2, only_sample_tail=True)
        batch = ds.batch_at(jnp.arange(4), jax.random.PRNGKey(0))
        slices = np.asarray(ds.slices)[:4]
        for b in range(4):
            traj = slices[b, 0]
            T = int(data.lengths[traj])
            want = data.observations[traj, T - 2:T]
            np.testing.assert_allclose(batch["goal_observation"][b], want,
                                       rtol=1e-6)

    def test_zero_goal_fallback(self):
        """Slices whose future range is empty get zero goals
        (trajectory_loader.py:183-186)."""
        obs = np.random.RandomState(0).randn(1, 10, 3).astype(np.float32)
        data = TrajectoryData(obs, obs[..., :2].copy(),
                              np.array([10], np.int32))
        ds = SlicedDataset(data, window=8, future_conditional=True,
                           future_seq_len=4, min_future_sep=0)
        # slice starting at 2 ends at 10; future range empty -> zeros
        batch = ds.batch_at(jnp.asarray([2]), jax.random.PRNGKey(0))
        np.testing.assert_allclose(batch["goal_observation"][0], 0.0)


class TestTransforms:
    def test_mask_targets(self):
        tf = blockpush_mask_targets(mask_targets=True, reduce_obs_dim=False)
        batch = {
            "observation": jnp.ones((2, 5, 16)),
            "action": jnp.ones((2, 5, 2)),
            "goal_observation": jnp.ones((2, 1, 16)),
        }
        out = tf(batch)
        np.testing.assert_allclose(out["observation"][..., 10:], 0.0)
        np.testing.assert_allclose(out["observation"][..., :10], 1.0)
        g = np.asarray(out["goal_observation"])[0, 0]
        assert g[0] == 1 and g[1] == 1 and g[3] == 1 and g[4] == 1
        assert g[2] == 0 and g[5:].sum() == 0

    def test_no_mask_keeps_obs(self):
        tf = blockpush_mask_targets(mask_targets=False)
        batch = {"observation": jnp.ones((2, 5, 16)),
                 "action": jnp.ones((2, 5, 2)),
                 "goal_observation": jnp.ones((2, 1, 10))}
        out = tf(batch)
        np.testing.assert_allclose(out["observation"], 1.0)
        g = np.asarray(out["goal_observation"])[0, 0]
        assert g[2] == 0 and g[5] == 0 and g[0] == 1
