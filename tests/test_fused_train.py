"""Fused multi-step training tests."""

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.core.densities import make_sample_density
from beso_tpu.data import SlicedDataset, synthetic_push_data
from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_minmax_scaler
from beso_tpu.models.ema import ema_init
from beso_tpu.train.trainer import (
    TrainState,
    make_fused_train_steps,
    make_optimizer,
    make_train_step,
    process_batch,
)


def test_fused_steps_advance_and_learn():
    data = synthetic_push_data(n_traj=10, t_max=50)
    ds = SlicedDataset(data, window=5, future_conditional=True, future_seq_len=1)
    scaler = fit_minmax_scaler(data.all_observations(), data.all_actions())
    model = DiffusionGPT(state_dim=16, action_dim=2, embed_dim=24, n_layers=1,
                         n_heads=2, goal_seq_len=1, obs_seq_len=5)
    den = GCDenoiser(model, 0.5)
    opt = make_optimizer("adam", 1e-3)
    density = make_sample_density("loglogistic", 0.5, 0.05, 1.0)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
    s, a, g = process_batch(batch, scaler)
    params = den.init(jax.random.PRNGKey(1), s, a, g, jnp.full((16,), 0.5))
    ts = TrainState(params, opt.init(params), ema_init(params),
                    jnp.zeros((), jnp.int32))

    fused = make_fused_train_steps(den, opt, density, scaler, ds,
                                   batch_size=32, n_steps=20)
    ts, losses = fused(ts, jax.random.PRNGKey(2))
    assert losses.shape == (20,)
    assert int(ts.step) == 20
    assert int(ts.ema.num_updates) == 20
    ts, losses2 = fused(ts, jax.random.PRNGKey(3))
    assert int(ts.step) == 40
    # learning signal: later losses below the first ones
    assert float(losses2.mean()) < float(losses[:3].mean())
