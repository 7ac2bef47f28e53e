"""Workspace + config-system + CLI integration tests (synthetic data, tiny)."""

import jax
import numpy as np
import pytest

from beso_tpu.agents.beso_agent import BesoAgent, BesoAgentConfig
from beso_tpu.utils.config import Config, load_config, save_config
from beso_tpu.workspaces import BlockPushWorkspace, FrankaKitchenWorkspace


@pytest.fixture(scope="module")
def bp_setup():
    ws = BlockPushWorkspace(seed=6, eval_n_times=4, eval_n_steps=3,
                            window_size=5, goal_seq_len=1)
    cfg = BesoAgentConfig(
        obs_dim=10, action_dim=2, hidden_dim=24, n_layers=1, n_heads=2,
        goal_seq_len=1, window_size=5, sigma_min=0.05, max_train_steps=3,
        eval_every_n_steps=2, train_batch_size=16, cond_mask_prob=0.1,
        optimizer="adam")
    agent = BesoAgent(cfg, ws.scaler)
    batch = ws.train_set.sample_batch(jax.random.PRNGKey(0), 8)
    agent.init(jax.random.PRNGKey(1), batch)
    return ws, agent


class TestBlockPushWorkspace:
    def test_data_wiring(self, bp_setup):
        ws, _ = bp_setup
        batch = ws.train_set.sample_batch(jax.random.PRNGKey(0), 4)
        assert batch["observation"].shape == (4, 5, 10)
        assert batch["goal_observation"].shape == (4, 1, 10)
        assert ws.scaler.kind == "minmax"

    def test_test_agent(self, bp_setup):
        ws, agent = bp_setup
        out = ws.test_agent(agent, log_metrics=False)
        assert set(out) >= {"avrg_reward", "std_reward", "avrg_result",
                            "std_result"}
        assert 0 <= out["avrg_result"] <= 1

    def test_sampler_study(self, bp_setup, tmp_path):
        ws, agent = bp_setup
        # restrict to 2 samplers via the generic sweep to keep it fast
        out = ws._sweep(agent,
                        [dict(new_sampler_type="ddim"),
                         dict(new_sampler_type="euler")],
                        ["ddim", "euler"], num_runs=4, num_steps_per_run=2,
                        store_path=str(tmp_path), plot_name="mini",
                        log_metrics=False)
        assert len(out["results"]) == 2
        assert (tmp_path / "mini.png").exists()
        assert (tmp_path / "mini_results.npy").exists()

    def test_cfg_study(self, bp_setup):
        ws, agent = bp_setup
        out = ws.compare_classifier_free_guidance(
            agent, 4, 2, cond_lambda_list=[0.0, 2.0], log_metrics=False)
        assert len(out["results"]) == 2


class TestKitchenWorkspace:
    def test_multigoal_and_sequential(self):
        ws = FrankaKitchenWorkspace(seed=42, eval_n_times=4, eval_n_steps=3,
                                    window_size=4, goal_seq_len=2)
        cfg = BesoAgentConfig(
            obs_dim=30, action_dim=9, hidden_dim=24, n_layers=1, n_heads=2,
            goal_seq_len=2, window_size=4, max_train_steps=2,
            eval_every_n_steps=2, train_batch_size=8)
        agent = BesoAgent(cfg, ws.scaler)
        batch = ws.train_set.sample_batch(jax.random.PRNGKey(0), 8)
        agent.init(jax.random.PRNGKey(1), batch)
        mg, seq = ws.test_agent(agent, evaluate_multigoal=True,
                                evaluate_sequential=True, log_metrics=False)
        for out in (mg, seq):
            assert "success_rate_1" in out
            assert "solved_tasks" in out and "expected_tasks" in out
            assert isinstance(out["task_tree"], dict)


class TestConfig:
    def test_load_override_interp(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a: 1\nb: ${a}\nnest:\n  c: ${a}\n  d: 'x_${a}'\n")
        cfg = load_config(p)
        assert cfg["b"] == 1 and cfg["nest"]["c"] == 1
        assert cfg["nest"]["d"] == "x_1"
        cfg2 = load_config(p, ["a=5", "nest.c=7"])
        assert cfg2["a"] == 5 and cfg2["b"] == 5 and cfg2["nest"]["c"] == 7

    def test_save_roundtrip(self, tmp_path):
        cfg = Config({"x": 1, "y": {"z": [1, 2]}})
        out = save_config(cfg, tmp_path)
        back = load_config(out)
        assert back["x"] == 1 and back["y"]["z"] == [1, 2]


class TestCLIs:
    def test_training_and_evaluate_cli(self, tmp_path):
        import scripts.training as tr
        import scripts.evaluate as ev

        run_dir = tmp_path / "run"
        tr.main(["--config", "configs/block_push.yaml",
                 "--run-dir", str(run_dir),
                 "max_train_steps=2", "eval_every_n_steps=2",
                 "train_batch_size=8", "eval_n_times=2", "eval_n_steps=2",
                 "evaluate_sequential=false", "hidden_dim=24",
                 "num_hidden_layers=1", "n_heads=2"])
        assert (run_dir / "config.yaml").exists()
        out = ev.main(["--config", "configs/evaluate_blocks.yaml",
                       f"model_store_path={run_dir}", "num_runs=2",
                       "num_steps_per_run=2", "sigma_min=0.05"])
        assert "avrg_result" in out
