"""Coverage for the remaining comparison-study drivers (tiny settings)."""

import jax
import pytest

from beso_tpu.agents.beso_agent import BesoAgent, BesoAgentConfig
from beso_tpu.workspaces import BlockPushWorkspace


@pytest.fixture(scope="module")
def setup():
    ws = BlockPushWorkspace(seed=6, eval_n_times=2, eval_n_steps=2,
                            window_size=5, goal_seq_len=1)
    cfg = BesoAgentConfig(
        obs_dim=10, action_dim=2, hidden_dim=24, n_layers=1, n_heads=2,
        goal_seq_len=1, window_size=5, sigma_min=0.05, max_train_steps=2,
        eval_every_n_steps=2, train_batch_size=8, optimizer="adam")
    agent = BesoAgent(cfg, ws.scaler)
    agent.init(jax.random.PRNGKey(1),
               ws.train_set.sample_batch(jax.random.PRNGKey(0), 8))
    return ws, agent


def test_compare_sde_sampling(setup):
    ws, agent = setup
    out = ws.compare_sde_sampling(agent, 2, 2, churn_list=[0.0, 0.5],
                                  n_inference_steps=2, log_metrics=False)
    assert len(out["results"]) == 2


def test_compare_noisy_sampler(setup):
    ws, agent = setup
    # restrict via the generic sweep (full list = 6 recompiles, too slow here)
    out = ws._sweep(agent,
                    [dict(new_sampler_type="euler"),
                     dict(new_sampler_type="euler_ancestral")],
                    ["euler", "euler_ancestral"], 2, 2,
                    n_inference_steps=2, log_metrics=False)
    assert len(out["results"]) == 2


def test_compare_kde_vs_mean_vs_single(setup):
    ws, agent = setup
    out = ws.compare_kde_vs_mean_vs_single(agent, 2, 2, sampler_type="ddim",
                                           n_inference_steps=2, get_mean=4,
                                           log_metrics=False)
    assert out["labels"] == ["single", "mean", "kde"]
    assert len(out["results"]) == 3
