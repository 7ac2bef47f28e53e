"""Native (C++) windowed-trajectory loader tests.

Pins: slice-table parity with the JAX SlicedDataset, window-content
correctness, future-goal semantics (range, tail, seq-end, zero fallback),
counter-based determinism, and the prefetch ring's stream equivalence.
"""

import numpy as np
import pytest

from beso_tpu.data import SlicedDataset, synthetic_kitchen_data
from beso_tpu.data.native import NativeSlicedLoader
from beso_tpu.data.slicer import make_slices


@pytest.fixture(scope="module")
def data():
    return synthetic_kitchen_data(n_traj=6, t_max=40, seed=3)


def _loader(data, **kw):
    base = dict(window=4, future_conditional=True, future_seq_len=2,
                n_threads=2)
    base.update(kw)
    return NativeSlicedLoader(np.asarray(data.observations),
                              np.asarray(data.actions),
                              np.asarray(data.lengths), **base)


class TestNativeLoader:
    def test_slice_table_parity(self, data):
        nl = _loader(data)
        ref = make_slices(np.asarray(data.lengths), 4)
        np.testing.assert_array_equal(nl.slices, ref)
        assert len(nl) == len(ref)

    def test_window_contents(self, data):
        nl = _loader(data)
        batch = nl.sample_batch_host(seed=7, batch_id=0, batch_size=64)
        obs = np.asarray(data.observations)
        act = np.asarray(data.actions)
        slices = nl.slices
        # every sampled window must exactly match SOME slice of the data
        for b in range(64):
            hits = [
                (i, s) for i, s in slices
                if np.array_equal(obs[i, s:s + 4], batch["observation"][b])
            ]
            assert hits, f"row {b} is not a valid window"
            i, s = hits[0]
            np.testing.assert_array_equal(act[i, s:s + 4],
                                          batch["action"][b])

    def test_goal_semantics(self, data):
        nl = _loader(data, min_future_sep=1)
        lengths = np.asarray(data.lengths)
        obs = np.asarray(data.observations)
        batch = nl.sample_batch_host(seed=1, batch_id=5, batch_size=128)
        slices = nl.slices
        for b in range(128):
            g = batch["goal_observation"][b]
            row_obs = batch["observation"][b]
            cand = [(i, s) for i, s in slices
                    if np.array_equal(obs[i, s:s + 4], row_obs)]
            i, s = cand[0]
            lo, hi = s + 4 + 1, lengths[i] - 2
            if lo >= hi:
                np.testing.assert_array_equal(g, 0.0)
                continue
            # goal must be a contiguous window starting in [lo, hi)
            found = any(np.array_equal(obs[i, t:t + 2], g)
                        for t in range(lo, hi))
            assert found, f"goal of row {b} outside the valid future range"

    def test_tail_and_seq_end_variants(self, data):
        obs = np.asarray(data.observations)
        lengths = np.asarray(data.lengths)
        nl_tail = _loader(data, only_sample_tail=True)
        batch = nl_tail.sample_batch_host(seed=2, batch_id=0, batch_size=32)
        slices = nl_tail.slices
        for b in range(32):
            row_obs = batch["observation"][b]
            i, s = next((i, s) for i, s in slices
                        if np.array_equal(obs[i, s:s + 4], row_obs))
            T = lengths[i]
            if s + 4 + 0 < T - 2:
                np.testing.assert_array_equal(batch["goal_observation"][b],
                                              obs[i, T - 2:T])

        nl_end = _loader(data, only_sample_seq_end=True)
        batch = nl_end.sample_batch_host(seed=2, batch_id=0, batch_size=32)
        for b in range(32):
            row_obs = batch["observation"][b]
            i, s = next((i, s) for i, s in slices
                        if np.array_equal(obs[i, s:s + 4], row_obs))
            if s + 4 < lengths[i] - 2:
                np.testing.assert_array_equal(batch["goal_observation"][b],
                                              obs[i, s + 4:s + 6])

    def test_deterministic_and_batch_id_varies(self, data):
        nl = _loader(data)
        b1 = nl.sample_batch_host(seed=9, batch_id=3, batch_size=16)
        b2 = nl.sample_batch_host(seed=9, batch_id=3, batch_size=16)
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k])
        b3 = nl.sample_batch_host(seed=9, batch_id=4, batch_size=16)
        assert not np.array_equal(b1["observation"], b3["observation"])
        # thread count must not change the stream
        nl1 = _loader(data, n_threads=1)
        b4 = nl1.sample_batch_host(seed=9, batch_id=3, batch_size=16)
        np.testing.assert_array_equal(b1["observation"], b4["observation"])

    def test_prefetch_stream_matches_direct(self, data):
        nl = _loader(data)
        stream = list(nl.batches(seed=11, batch_size=8, n_batches=4,
                                 device_put=False))
        for k, batch in enumerate(stream):
            direct = nl.sample_batch_host(seed=11, batch_id=k, batch_size=8)
            for key in direct:
                np.testing.assert_array_equal(np.asarray(batch[key]),
                                              direct[key])

    def test_device_put_stream(self, data):
        import jax

        nl = _loader(data)
        for batch in nl.batches(seed=0, batch_size=8, n_batches=2):
            assert isinstance(batch["observation"], jax.Array)
            assert batch["observation"].shape == (8, 4, 30)

    def test_same_distribution_as_jax_slicer(self, data):
        """The native loader draws from the same slice population."""
        ds = SlicedDataset(data, window=4, future_conditional=True,
                           future_seq_len=2)
        nl = _loader(data)
        assert len(ds) == len(nl)
