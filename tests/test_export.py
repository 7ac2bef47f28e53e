"""Dataset export round-trip tests: our writers -> the reference's file
formats -> our loaders."""

import numpy as np
import pytest

from beso_tpu.data.export import export_multimodal_push, export_relay_kitchen
from beso_tpu.data.trajectories import (
    load_multimodal_push,
    load_relay_kitchen,
    synthetic_kitchen_data,
    synthetic_push_data,
)


class TestExportRoundtrip:
    def test_kitchen_roundtrip(self, tmp_path):
        data = synthetic_kitchen_data(n_traj=4, t_max=30)
        export_relay_kitchen(data, tmp_path)
        # reference layout present
        for f in ["observations_seq.npy", "actions_seq.npy",
                  "existence_mask.npy", "onehot_goals.pth"]:
            assert (tmp_path / f).exists()
        # reference stores T x N x 60
        assert np.load(tmp_path / "observations_seq.npy").shape == (30, 4, 60)
        back = load_relay_kitchen(tmp_path, onehot_goals=True)
        np.testing.assert_allclose(back.observations, data.observations,
                                   atol=1e-6)
        np.testing.assert_allclose(back.actions, data.actions, atol=1e-6)
        np.testing.assert_array_equal(back.lengths, data.lengths)
        np.testing.assert_allclose(back.onehot_goals, data.onehot_goals)

    def test_push_roundtrip(self, tmp_path):
        data = synthetic_push_data(n_traj=4, t_max=25)
        export_multimodal_push(data, tmp_path)
        back = load_multimodal_push(tmp_path, onehot_goals=True)
        np.testing.assert_allclose(back.observations, data.observations,
                                   atol=1e-6)
        np.testing.assert_array_equal(back.lengths, data.lengths)

    @pytest.mark.slow
    def test_generate_demos_cli(self, tmp_path):
        import scripts.generate_demos as gd

        out = gd.main(["--env", "block_push", "--out", str(tmp_path / "d"),
                       "--episodes", "4", "--steps", "60"])
        back = load_multimodal_push(out, onehot_goals=True)
        assert back.num_trajectories == 4
