"""Workspace + config-system + CLI integration tests (synthetic data, tiny)."""

import jax
import jax.numpy as jnp
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


class TestCompletionOrderedCensus:
    def test_opposite_orders_are_distinct_keys(self):
        """Two episodes completing {microwave, kettle} in opposite orders
        must produce two distinct census keys — the reference keys its
        census by COMPLETION order (kitchen_workspace_manager.py:564-570)."""
        from beso_tpu.rollout.rollout import RolloutMetrics
        from beso_tpu.workspaces.kitchen_workspace import FrankaKitchenWorkspace

        completed = np.zeros((2, 7), bool)
        completed[:, 5] = True  # microwave
        completed[:, 6] = True  # kettle
        order = np.full((2, 7), -1, np.int32)
        order[0, 5], order[0, 6] = 10, 50   # microwave first
        order[1, 5], order[1, 6] = 90, 20   # kettle first
        metrics = RolloutMetrics(
            rewards=jnp.zeros(2), results=jnp.zeros(2),
            completed=jnp.asarray(completed), env_steps=jnp.asarray(0),
            completion_order=jnp.asarray(order))
        census = FrankaKitchenWorkspace.trajectory_census(metrics)
        assert census == {"microwave, kettle": 1, "kettle, microwave": 1}

    def test_rollout_reports_completion_order(self):
        """The fused rollout must carry per-task completion steps out of the
        env (round-1 gap: RolloutMetrics dropped the order)."""
        from beso_tpu.data import synthetic_kitchen_data
        from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals
        from beso_tpu.agents.policy import PolicyConfig
        from beso_tpu.rollout import rollout_kitchen
        from beso_tpu.models import fit_scaler

        data = synthetic_kitchen_data(n_traj=6, t_max=30)
        scaler = fit_scaler(data.all_observations(), data.all_actions())
        goals, expected = multigoal_kitchen_goals(data, 2, 4, seed=0)
        cfg = PolicyConfig(window_size=2, obs_dim=30, action_dim=9,
                           num_sampling_steps=2)

        def denoise(s, a, g, sig):  # trivial stand-in policy
            return jnp.zeros_like(a)

        m = rollout_kitchen(denoise, scaler, cfg, jnp.asarray(goals),
                            jnp.asarray(expected), jax.random.PRNGKey(0),
                            n_steps=3)
        assert m.completion_order.shape == (4, 7)
        # nothing completes under a zero policy in 3 steps -> all -1
        assert (np.asarray(m.completion_order) == -1).all()

    def test_known_start_and_perturbed_physics(self):
        """start_from_known pins episode starts to given qpos rows; perturbed
        physics_params flow through the jitted rollout."""
        from beso_tpu.agents.policy import PolicyConfig
        from beso_tpu.data import synthetic_kitchen_data
        from beso_tpu.envs.kitchen.env import (INIT_QPOS,
                                               perturb_kitchen_params)
        from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals
        from beso_tpu.models import fit_scaler
        from beso_tpu.rollout import rollout_kitchen

        data = synthetic_kitchen_data(n_traj=6, t_max=30)
        scaler = fit_scaler(data.all_observations(), data.all_actions())
        goals, expected = multigoal_kitchen_goals(data, 2, 3, seed=0)
        cfg = PolicyConfig(window_size=2, obs_dim=30, action_dim=9,
                           num_sampling_steps=2)
        starts = jnp.tile(INIT_QPOS[None], (3, 1)).at[:, 0].add(
            jnp.asarray([0.0, 0.05, -0.05]))

        def denoise(s, a, g, sig):
            return jnp.zeros_like(a)

        m = rollout_kitchen(denoise, scaler, cfg, jnp.asarray(goals),
                            jnp.asarray(expected), jax.random.PRNGKey(0),
                            n_steps=2,
                            physics_params=perturb_kitchen_params(
                                gain_scale=0.8, radius_scale=1.2),
                            init_qpos=starts)
        assert np.isfinite(np.asarray(m.rewards)).all()
