"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from beso_tpu.parallel import (
    make_mesh,
    partition_batch,
    partition_params,
    replicate,
    tp_param_spec,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestMesh:
    def test_make_mesh_shapes(self, eight_devices):
        mesh = make_mesh(8, tp=2)
        assert mesh.shape == {"dp": 4, "tp": 2}
        mesh = make_mesh(8, tp=1)
        assert mesh.shape == {"dp": 8, "tp": 1}

    def test_tp_spec_targets_attention_and_mlp(self):
        params = {
            "params": {
                "block_0": {
                    "attn": {"qkv": {"kernel": jnp.zeros((8, 24)),
                                     "bias": jnp.zeros((24,))},
                             "proj": {"kernel": jnp.zeros((8, 8)),
                                      "bias": jnp.zeros((8,))}},
                    "fc": {"kernel": jnp.zeros((8, 32)), "bias": jnp.zeros((32,))},
                    "fc_proj": {"kernel": jnp.zeros((32, 8)),
                                "bias": jnp.zeros((8,))},
                },
                "tok_emb": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros((8,))},
            }
        }
        specs = specs_dict = tp_param_spec(params)["params"]
        assert specs_dict["block_0"]["attn"]["qkv"]["kernel"] == P(None, "tp")
        assert specs_dict["block_0"]["attn"]["proj"]["kernel"] == P("tp", None)
        assert specs_dict["block_0"]["fc"]["kernel"] == P(None, "tp")
        assert specs_dict["block_0"]["fc_proj"]["kernel"] == P("tp", None)
        assert specs_dict["tok_emb"]["kernel"] == P()

    def test_dp_training_step_matches_single_device(self, eight_devices):
        """Sharded and unsharded training must produce the same loss."""
        from beso_tpu.core.densities import make_sample_density
        from beso_tpu.data import SlicedDataset, synthetic_push_data
        from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_minmax_scaler
        from beso_tpu.models.ema import ema_init
        from beso_tpu.train.trainer import (TrainState, make_optimizer,
                                            make_train_step, process_batch)

        data = synthetic_push_data(n_traj=8, t_max=40)
        ds = SlicedDataset(data, window=5, future_conditional=True,
                           future_seq_len=1)
        scaler = fit_minmax_scaler(data.all_observations(), data.all_actions())
        model = DiffusionGPT(state_dim=16, action_dim=2, embed_dim=16,
                             n_layers=1, n_heads=2, goal_seq_len=1,
                             obs_seq_len=5)
        den = GCDenoiser(model, 0.5)
        opt = make_optimizer("adam", 1e-3)
        density = make_sample_density("loglogistic", 0.5, 0.05, 1.0)
        batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
        s, a, g = process_batch(batch, scaler)
        params = den.init(jax.random.PRNGKey(1), s, a, g, jnp.full((16,), 0.5))
        ts0 = TrainState(params, opt.init(params), ema_init(params),
                         jnp.zeros((), jnp.int32))
        train_step = make_train_step(den, opt, density, scaler)

        _, loss_single = train_step(ts0, batch, jax.random.PRNGKey(2))

        mesh = make_mesh(8, tp=1)
        with mesh:
            ts_sh = TrainState(replicate(params, mesh),
                               replicate(opt.init(params), mesh),
                               ema_init(replicate(params, mesh)),
                               jnp.zeros((), jnp.int32))
            batch_sh = partition_batch(batch, mesh)
            ts_new, loss_sh = train_step(ts_sh, batch_sh, jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(loss_single), float(loss_sh),
                                   rtol=1e-5)

    def test_graft_dryrun(self, eight_devices):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestMultislice:
    def test_mesh_shape_and_data_axes(self, eight_devices):
        from beso_tpu.parallel import data_axes, make_multislice_mesh

        mesh = make_multislice_mesh(2, tp=2)
        assert mesh.shape == {"dcn": 2, "dp": 2, "tp": 2}
        assert data_axes(mesh) == ("dcn", "dp")
        assert data_axes(make_mesh(8)) == ("dp",)

    def test_multislice_training_matches_single_device(self, eight_devices):
        """2 slices x 4 devices: same loss as unsharded; batch sharded over
        ('dcn','dp') so the only cross-slice traffic is the grad reduce."""
        from beso_tpu.core.densities import make_sample_density
        from beso_tpu.data import SlicedDataset, synthetic_push_data
        from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_minmax_scaler
        from beso_tpu.models.ema import ema_init
        from beso_tpu.parallel import make_multislice_mesh
        from beso_tpu.train.trainer import (TrainState, make_optimizer,
                                            make_train_step, process_batch)

        data = synthetic_push_data(n_traj=8, t_max=40)
        ds = SlicedDataset(data, window=5, future_conditional=True,
                           future_seq_len=1)
        scaler = fit_minmax_scaler(data.all_observations(), data.all_actions())
        model = DiffusionGPT(state_dim=16, action_dim=2, embed_dim=16,
                             n_layers=1, n_heads=2, goal_seq_len=1,
                             obs_seq_len=5)
        den = GCDenoiser(model, 0.5)
        opt = make_optimizer("adam", 1e-3)
        density = make_sample_density("loglogistic", 0.5, 0.05, 1.0)
        batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
        s, a, g = process_batch(batch, scaler)
        params = den.init(jax.random.PRNGKey(1), s, a, g, jnp.full((16,), 0.5))
        ts0 = TrainState(params, opt.init(params), ema_init(params),
                         jnp.zeros((), jnp.int32))
        train_step = make_train_step(den, opt, density, scaler)
        _, loss_single = train_step(ts0, batch, jax.random.PRNGKey(2))

        mesh = make_multislice_mesh(2, tp=1)
        with mesh:
            ts_sh = TrainState(replicate(params, mesh),
                               replicate(opt.init(params), mesh),
                               ema_init(replicate(params, mesh)),
                               jnp.zeros((), jnp.int32))
            batch_sh = partition_batch(batch, mesh)
            x = batch_sh["observation"]
            spec = x.sharding.spec
            assert tuple(spec)[0] == ("dcn", "dp")
            _, loss_sh = train_step(ts_sh, batch_sh, jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(loss_single), float(loss_sh),
                                   rtol=1e-5)
