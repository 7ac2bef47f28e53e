"""Tests for video recording, metrics writer, and profiling utilities."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.utils.metrics import MetricsWriter, step_timer


class TestMetricsWriter:
    def test_jsonl_logging(self, tmp_path):
        w = MetricsWriter(log_dir=str(tmp_path))
        w.log({"loss": 0.5}, step=1)
        w.log({"loss": 0.25}, step=2)
        w.finish()
        lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
        assert len(lines) == 2
        rec = json.loads(lines[1])
        assert rec["loss"] == 0.25 and rec["_step"] == 2

    def test_step_timer(self, tmp_path):
        w = MetricsWriter(log_dir=str(tmp_path))
        with step_timer(w, "phase", step=0):
            pass
        w.finish()
        rec = json.loads((tmp_path / "metrics.jsonl").read_text().strip())
        assert "time/phase_s" in rec


class TestVideo:
    def test_record_block_push_video(self, tmp_path):
        from beso_tpu.agents.policy import PolicyConfig
        from beso_tpu.data.trajectories import synthetic_push_data
        from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_minmax_scaler
        from beso_tpu.rollout.video import record_block_push_video

        data = synthetic_push_data(8, 40)
        scaler = fit_minmax_scaler(data.all_observations()[:, :10],
                                   data.all_actions())
        model = DiffusionGPT(state_dim=10, action_dim=2, embed_dim=24,
                             n_layers=1, n_heads=2, goal_seq_len=1,
                             obs_seq_len=5)
        den = GCDenoiser(model, 0.5)
        params = den.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 10)),
                          jnp.zeros((1, 5, 2)), jnp.zeros((1, 1, 10)),
                          jnp.full((1,), 0.5))
        cfg = PolicyConfig(window_size=5, obs_dim=10, action_dim=2,
                           sigma_min=0.05, num_sampling_steps=2)
        path = tmp_path / "rollout.gif"
        frames = record_block_push_video(
            lambda s, a, g, sig: den.apply(params, s, a, g, sig), scaler,
            cfg, np.zeros(16, np.float32), jax.random.PRNGKey(1), str(path),
            n_steps=3)
        assert path.exists()
        assert len(frames) >= 2
        assert frames[0].shape[-1] == 3
