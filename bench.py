"""Headline benchmark: fused goal-conditioned kitchen rollout throughput.

Measures the BASELINE.json north-star quantity: parallel env-steps/sec of the
complete evaluation inner loop — per env step, a 3-NFE DDIM denoise of the
kitchen-sized DiffusionGPT (6L x 360D, ~9.5M params) fused with the batched
JAX kitchen physics step — across thousands of parallel goal-conditioned
environments, as ONE jit'd lax.scan.

vs_baseline: ratio to the reference's structural throughput bound of
~100 env-steps/s/process (sequential episodes x sequential MuJoCo steps x
batch-1 GPU NFE + PCIe round-trips; BASELINE.md bottom paragraph).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_ENV_STEPS_PER_SEC = 100.0  # upper bound of the torch reference
N_ENVS = 4096
N_STEPS = 280
NFE = 3


def main():
    from beso_tpu.agents.policy import PolicyConfig
    from beso_tpu.data.trajectories import synthetic_kitchen_data
    from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals
    from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_scaler
    from beso_tpu.rollout import rollout_kitchen

    platform = jax.devices()[0].platform
    n_envs = N_ENVS if platform != "cpu" else 64
    n_steps = N_STEPS if platform != "cpu" else 8

    model = DiffusionGPT(state_dim=30, action_dim=9, embed_dim=360,
                         n_layers=6, n_heads=6, goal_seq_len=2, obs_seq_len=4,
                         dtype=jnp.bfloat16)
    den = GCDenoiser(model, sigma_data=0.5)
    key = jax.random.PRNGKey(0)
    params = den.init(key, jnp.zeros((2, 4, 30)), jnp.zeros((2, 4, 9)),
                      jnp.zeros((2, 2, 30)), jnp.full((2,), 0.5))

    data = synthetic_kitchen_data(n_traj=32, t_max=60)
    scaler = fit_scaler(data.all_observations(), data.all_actions())
    goals, expected = multigoal_kitchen_goals(data, 2, n_envs, seed=42)
    goals, expected = jnp.asarray(goals), jnp.asarray(expected)
    cfg = PolicyConfig(window_size=4, obs_dim=30, action_dim=9,
                       num_sampling_steps=NFE, sigma_min=0.005,
                       sampler_type="ddim")

    def denoise(s, a, g, sig):
        return den.apply(params, s, a, g, sig)

    @jax.jit
    def run(k):
        return rollout_kitchen(denoise, scaler, cfg, goals, expected, k,
                               n_steps=n_steps)

    # warmup/compile
    m = run(jax.random.PRNGKey(1))
    m.rewards.block_until_ready()

    # optional jax.profiler trace (set BESO_PROFILE_DIR=/path to capture)
    import os
    profile_dir = os.environ.get("BESO_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            run(jax.random.PRNGKey(99)).rewards.block_until_ready()

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        m = run(jax.random.PRNGKey(2 + i))
        m.rewards.block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    env_steps_per_sec = n_envs * n_steps / best
    print(json.dumps({
        "metric": "kitchen_fused_rollout_env_steps_per_sec",
        "value": round(env_steps_per_sec, 1),
        "unit": f"env-steps/s ({n_envs} envs x {n_steps} steps x {NFE} NFE ddim, {platform})",
        "vs_baseline": round(env_steps_per_sec / REFERENCE_ENV_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
