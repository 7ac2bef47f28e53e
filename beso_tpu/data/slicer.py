"""Window slicing + future-goal sampling, device-resident.

Functional parity target: `TrajectorySlicerDataset`
(`beso/envs/dataloaders/trajectory_loader.py:79-197`):

* every trajectory is cut into all overlapping windows of length `window`
  (slice table built once, trajectory_loader.py:129-138),
* each item is a dict {observation[W], action[W], goal_observation[G]},
* the future-conditional goal is a random window at least `min_future_sep`
  after the slice end (trajectory_loader.py:169-182), or the trajectory tail
  (`only_sample_tail`), or the immediately-following window
  (`only_sample_seq_end`); zeros if the trajectory is too short
  (trajectory_loader.py:183-186).

TPU-first design: the slice table is a static int array; `sample_batch` is a
pure jit-able function (key) -> batch performing gathers on device arrays.
The reference's 4 DataLoader worker processes + pinned-memory H2D copies
disappear: the dataset lives on device and a batch is one fused gather.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.data.trajectories import TrajectoryData


def make_slices(lengths: np.ndarray, window: int) -> np.ndarray:
    """All (traj, start) pairs with start + window <= length
    (trajectory_loader.py:129-138)."""
    out = []
    for i, T in enumerate(np.asarray(lengths)):
        if T - window < 0:
            continue
        for start in range(int(T) - window + 1):
            out.append((i, start))
    return np.asarray(out, dtype=np.int32).reshape(-1, 2)


class SlicedDataset:
    """Batched window sampler over a TrajectoryData."""

    def __init__(
        self,
        data: TrajectoryData,
        window: int,
        future_conditional: bool = True,
        min_future_sep: int = 0,
        future_seq_len: Optional[int] = None,
        only_sample_tail: bool = False,
        only_sample_seq_end: bool = False,
        transform: Optional[Callable[[dict], dict]] = None,
    ):
        if future_conditional:
            assert future_seq_len is not None, "must specify a future_seq_len"
        self.window = window
        self.future_conditional = future_conditional
        self.min_future_sep = min_future_sep
        self.future_seq_len = future_seq_len or 1
        self.only_sample_tail = only_sample_tail
        self.only_sample_seq_end = only_sample_seq_end
        self.transform = transform

        self.slices = jnp.asarray(make_slices(data.lengths, window))
        self.observations = jnp.asarray(data.observations)
        self.actions = jnp.asarray(data.actions)
        self.lengths = jnp.asarray(data.lengths)

    def __len__(self) -> int:
        return int(self.slices.shape[0])

    def device_arrays(self) -> dict:
        """The dataset's device-resident arrays, as a pytree. Pass these as
        jit ARGUMENTS (rebinding with `with_arrays`) instead of closing
        over the dataset inside a jitted function: closure arrays become
        compile-payload constants, and on a remote-compile backend a
        multi-hundred-MB dataset overflows the request (HTTP 413) — the
        argument path ships them once as device buffers."""
        return {"slices": self.slices, "observations": self.observations,
                "actions": self.actions, "lengths": self.lengths}

    def with_arrays(self, arrays: dict) -> "SlicedDataset":
        """Shallow rebind of the device arrays (see `device_arrays`)."""
        import copy

        ds = copy.copy(self)
        ds.slices = arrays["slices"]
        ds.observations = arrays["observations"]
        ds.actions = arrays["actions"]
        ds.lengths = arrays["lengths"]
        return ds

    def _gather(self, slice_idx: jnp.ndarray, goal_key) -> dict:
        traj = self.slices[slice_idx, 0]           # [B]
        start = self.slices[slice_idx, 1]          # [B]
        W = self.window
        w_ar = jnp.arange(W)
        t_idx = start[:, None] + w_ar[None, :]     # [B, W]
        obs = self.observations[traj[:, None], t_idx]
        act = self.actions[traj[:, None], t_idx]
        batch = {"observation": obs, "action": act}

        if self.future_conditional:
            G = self.future_seq_len
            end = start + W
            T = self.lengths[traj]
            lo = end + self.min_future_sep
            hi = T - G                               # exclusive upper start
            valid = lo < hi
            if self.only_sample_tail:
                g_start = T - G
            elif self.only_sample_seq_end:
                g_start = end
            else:
                span = jnp.maximum(hi - lo, 1)
                u = jax.random.randint(goal_key, lo.shape, 0, 1 << 30)
                g_start = lo + u % span
            g_idx = g_start[:, None] + jnp.arange(G)[None, :]
            g_idx = jnp.clip(g_idx, 0, self.observations.shape[1] - 1)
            goal = self.observations[traj[:, None], g_idx]
            goal = jnp.where(valid[:, None, None], goal, 0.0)  # zeros fallback
            batch["goal_observation"] = goal

        if self.transform is not None:
            batch = self.transform(batch)
        return batch

    def sample_batch(self, key, batch_size: int) -> dict:
        """Random batch of windows (shuffled training stream)."""
        k_idx, k_goal = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch_size,), 0, len(self))
        return self._gather(idx, k_goal)

    def batch_at(self, indices, key) -> dict:
        """Deterministic batch at explicit slice indices (test stream)."""
        return self._gather(jnp.asarray(indices, jnp.int32), key)

    def epoch_batches(self, batch_size: int, key=None):
        """Sequential full-epoch iteration (drops the ragged tail)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        n = len(self) // batch_size
        for b in range(n):
            idx = jnp.arange(b * batch_size, (b + 1) * batch_size)
            yield self._gather(idx, jax.random.fold_in(key, b))
