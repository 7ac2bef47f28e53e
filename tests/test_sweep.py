"""Vmapped multi-seed sweep training tests."""

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.core.densities import make_sample_density
from beso_tpu.data import SlicedDataset, synthetic_push_data
from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_minmax_scaler
from beso_tpu.train.sweep import (init_sweep_state, make_sweep_train_steps,
                                  run_sweep, seed_state, sweep_eval_mse)
from beso_tpu.train.trainer import make_optimizer, make_train_step


def _setup():
    model = DiffusionGPT(state_dim=10, action_dim=2, embed_dim=24, n_layers=1,
                         n_heads=2, goal_seq_len=1, obs_seq_len=2)
    den = GCDenoiser(model, sigma_data=0.5)
    data = synthetic_push_data(n_traj=4, t_max=20)
    ds = SlicedDataset(data, window=2, future_conditional=True,
                       future_seq_len=1)
    scaler = fit_minmax_scaler(data.all_observations(), data.all_actions())
    density = make_sample_density("loglogistic", 0.5, 0.05, 1.0)
    opt = make_optimizer("adam", 1e-3)
    return den, opt, density, scaler, ds


def test_vmapped_matches_independent_runs():
    """Sweep losses per seed == the same seeds trained independently."""
    den, opt, density, scaler, ds = _setup()
    seeds = [3, 7]
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    ts = init_sweep_state(den, opt, batch, scaler, seeds)
    fused = make_sweep_train_steps(den, opt, density, scaler, ds,
                                   batch_size=8, n_steps=4)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    ts_out, losses = fused(ts, keys)
    assert losses.shape == (2, 4)

    # independent reference runs, one per seed, same keys
    step_fn = make_train_step(den, opt, density, scaler)
    for i, seed in enumerate(seeds):
        from beso_tpu.models.ema import ema_init
        from beso_tpu.train.trainer import TrainState

        state_t = scaler.scale_input(batch["observation"])
        goal_t = scaler.scale_input(batch["goal_observation"])
        action_t = scaler.scale_output(batch["action"])
        params = den.init(jax.random.PRNGKey(seed), state_t, action_t, goal_t,
                          jnp.ones((8,)) * 0.5)
        ts_i = TrainState(params, opt.init(params), ema_init(params),
                          jnp.zeros((), jnp.int32))
        ref_losses = []
        k = keys[i]
        for k_step in jax.random.split(k, 4):
            kb, ks = jax.random.split(k_step)
            b = ds.sample_batch(kb, 8)
            ts_i, loss = step_fn(ts_i, b, ks)
            ref_losses.append(float(loss))
        # losses are the meaningful signal: identical RNG streams give
        # agreement at float-assoc noise level
        np.testing.assert_allclose(np.asarray(losses[i]),
                                   np.asarray(ref_losses), rtol=1e-5,
                                   atol=1e-6)
        # params agree up to Adam-amplified scan-vs-loop float reassociation
        # (rsqrt of tiny second moments on trained-from-zero biases)
        p_sweep = jax.tree.leaves(seed_state(ts_out, i).params)
        p_ref = jax.tree.leaves(ts_i.params)
        for a, b_ in zip(p_sweep, p_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-3)


def test_seeds_differ():
    """Different seeds produce different params (independent inits/streams)."""
    den, opt, density, scaler, ds = _setup()
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    ts = init_sweep_state(den, opt, batch, scaler, [0, 1])
    leaves = jax.tree.leaves(ts.params)
    assert any(np.abs(np.asarray(x[0]) - np.asarray(x[1])).max() > 1e-4
               for x in leaves if x.ndim > 1)


def test_run_sweep_and_eval():
    den, opt, density, scaler, ds = _setup()
    test_batch = ds.sample_batch(jax.random.PRNGKey(9), 8)
    ts, history = run_sweep(den, opt, density, scaler, ds, test_batch,
                            seeds=[0, 1, 2], batch_size=8, max_train_steps=6,
                            eval_every_n_steps=3, fused_steps=2,
                            num_sampling_steps=2, sigma_min=0.05)
    assert len(history) == 2           # evals at steps 3 and 6
    step, loss, mse = history[-1]
    assert step == 6 and loss.shape == (3,) and mse.shape == (3,)
    assert np.isfinite(loss).all() and np.isfinite(mse).all()
    mse2 = sweep_eval_mse(den, ts, test_batch, scaler, jax.random.PRNGKey(2),
                          num_sampling_steps=2, sigma_min=0.05)
    assert np.isfinite(np.asarray(mse2)).all()


def test_sweep_cli_smoke(tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "sweep.py"),
         "--config", str(repo / "configs" / "block_push.yaml"),
         "--seeds", "1,2", "--grid", "lr=1e-3",
         "--run-dir", str(tmp_path / "sw"),
         "max_train_steps=4", "eval_every_n_steps=2",
         "test_batch_size=8", "train_batch_size=8"],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = tmp_path / "sw"
    assert (out / "summary.json").exists()
    assert (out / "lr-1e-3" / "seed_1" / "config.yaml").exists()
    assert (out / "lr-1e-3" / "seed_2" / "train_state").exists()


def test_sweep_sharded_over_mesh():
    """Seed axis sharded over the 8-device mesh: same losses as unsharded
    (per-seed programs are independent -> zero cross-device traffic)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    from beso_tpu.parallel import make_mesh
    from beso_tpu.train.sweep import shard_sweep_state

    den, opt, density, scaler, ds = _setup()
    seeds = list(range(8))
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    ts = init_sweep_state(den, opt, batch, scaler, seeds)
    fused = make_sweep_train_steps(den, opt, density, scaler, ds,
                                   batch_size=8, n_steps=3)
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    _, losses_ref = fused(ts, keys)

    mesh = make_mesh(8, tp=1)
    with mesh:
        ts_sh = shard_sweep_state(ts, mesh)
        keys_sh = jax.device_put(keys, NamedSharding(mesh, P("dp")))
        ts_out, losses_sh = fused(ts_sh, keys_sh)
    np.testing.assert_allclose(np.asarray(losses_sh), np.asarray(losses_ref),
                               rtol=1e-5, atol=1e-6)
    # seed shards live on distinct devices
    assert len(ts_out.params and
               jax.tree.leaves(ts_out.params)[0].sharding.device_set) == 8


def test_shard_rejects_indivisible():
    import pytest
    from beso_tpu.parallel import make_mesh
    from beso_tpu.train.sweep import shard_sweep_state

    den, opt, density, scaler, ds = _setup()
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    ts = init_sweep_state(den, opt, batch, scaler, [0, 1, 2])
    mesh = make_mesh(8, tp=1)
    with pytest.raises(ValueError, match="divisible"):
        shard_sweep_state(ts, mesh)
