"""Encoder state-regression pretraining (models/pretrain.py).

The in-framework analogue of the reference's pretrained-embedding vision
pipeline (`beso/envs/franka_kitchen/dataloader.py:94-161` consumes
precomputed embeddings): pretrain ConvImageEncoder by regressing the
low-dim state from its own camera render, graft it into the vision
policy, optionally freeze it there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _toy_render(o):
    """Cheap deterministic 'camera': paint a blob whose position encodes
    the 2-dim state (fully invertible, so regression must succeed)."""
    h = w = 24
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    d2 = (xx - o[0]) ** 2 + (yy - o[1]) ** 2
    img = jnp.exp(-d2 / 0.05)
    return jnp.stack([img, img * 0.5, 1.0 - img], axis=-1)


class TestPretrainStateRegression:
    def test_loss_decreases_and_rmse_small(self):
        from beso_tpu.models.pretrain import pretrain_state_regression

        rng = np.random.default_rng(0)
        pool = rng.uniform(-0.8, 0.8, size=(512, 2)).astype(np.float32)
        enc, info = pretrain_state_regression(
            jax.random.PRNGKey(0), pool, _toy_render,
            embed_size=8, features=(8, 16), steps=200, batch_size=64,
            jitter_rel=0.0, steps_per_call=50)
        assert info["final_loss"] < info["first_loss"] * 0.5
        # blob position is fully decodable: RMSE well under the state range
        assert info["rmse_mean"] < 0.25
        assert info["rmse_per_dim"].shape == (2,)
        # the returned subtree is the encoder's (conv kernels present)
        flat = jax.tree_util.tree_leaves_with_path(enc)
        assert any("Conv" in str(p) for p, _ in flat)

    def test_target_and_weight_fns(self):
        """Symmetry-adapted targets + per-row masks: a blob whose position
        encodes dim 0 only; dim 1 is pure noise but its weight is 0, so
        the masked loss still converges and RMSE is reported per TARGET
        dim (here 3: x, cos-ish, masked-noise)."""
        from beso_tpu.models.pretrain import pretrain_state_regression

        def render(o):
            return _toy_render(jnp.stack([o[0], jnp.zeros(())]))

        def target_fn(b):
            return jnp.concatenate(
                [b[..., 0:1], jnp.cos(b[..., 0:1]), b[..., 1:2]], -1)

        def weight_fn(b):
            ones = jnp.ones_like(b[..., 0:1])
            return jnp.concatenate([ones, ones, 0.0 * ones], -1)

        rng = np.random.default_rng(3)
        pool = np.stack([rng.uniform(-0.8, 0.8, 256),
                         rng.normal(0, 10.0, 256)], 1).astype(np.float32)
        _, info = pretrain_state_regression(
            jax.random.PRNGKey(3), pool, render, embed_size=8,
            features=(8, 16), steps=200, batch_size=64, jitter_rel=0.0,
            steps_per_call=50, target_fn=target_fn, weight_fn=weight_fn)
        assert info["rmse_per_dim"].shape == (3,)
        assert info["final_loss"] < info["first_loss"] * 0.5
        # decodable dims converge; the masked dim contributes nothing
        assert info["rmse_per_dim"][0] < 0.25

    def test_graft_replaces_exactly_the_encoder(self):
        from beso_tpu.models.pretrain import graft_encoder_params

        params = {"params": {"encoder": {"w": jnp.zeros(3)},
                             "gpt": {"w": jnp.ones(2)}}}
        new_enc = {"w": jnp.full(3, 7.0)}
        out = graft_encoder_params(params, new_enc)
        assert float(out["params"]["encoder"]["w"][0]) == 7.0
        assert float(out["params"]["gpt"]["w"][0]) == 1.0
        # original untouched
        assert float(params["params"]["encoder"]["w"][0]) == 0.0

    def test_graft_requires_unique_encoder_key(self):
        from beso_tpu.models.pretrain import graft_encoder_params

        with pytest.raises(ValueError):
            graft_encoder_params({"params": {"gpt": {}}}, {})
        with pytest.raises(ValueError):
            graft_encoder_params(
                {"a": {"encoder": {}}, "b": {"encoder": {}}}, {})


class TestFrozenEncoderPolicy:
    """freeze_encoder=True stops gradients into the conv encoder while the
    GPT still trains (both vision policies)."""

    def test_block_push_frozen_encoder_gets_no_grads(self):
        from beso_tpu.models.denoiser import GCDenoiser
        from beso_tpu.models.vision_policy import VisionPolicyGPT

        model = VisionPolicyGPT(action_dim=2, embed_dim=24, n_layers=1,
                                n_heads=2, goal_seq_len=1, obs_seq_len=2,
                                embed_size=8, enc_features=(4, 8),
                                img_hw=(16, 16), freeze_encoder=True)
        den = GCDenoiser(model, sigma_data=0.5)
        key = jax.random.PRNGKey(0)
        B, T = 2, 2
        s = jax.random.uniform(key, (B, T, 16)) * 0.4
        a = jax.random.normal(key, (B, T, 2)) * 0.1
        g = jax.random.uniform(key, (B, 1, 16)) * 0.4
        sig = jnp.full((B,), 0.5)
        params = den.init(key, s, a, g, sig)
        noise = jax.random.normal(key, a.shape)

        grads = jax.grad(lambda p: den.loss(p, s, a, g, noise, sig))(params)
        leaves = jax.tree_util.tree_leaves_with_path(grads)
        enc_norm = sum(float(jnp.abs(gr).sum()) for p, gr in leaves
                       if "encoder" in str(p))
        gpt_norm = sum(float(jnp.abs(gr).sum()) for p, gr in leaves
                       if "VisionDiffusionGPT" in str(p))
        assert enc_norm == 0.0, "frozen encoder still receives gradients"
        assert gpt_norm > 0

    def test_pretrained_graft_into_policy_params(self):
        """Pretrained subtree structurally matches the policy's encoder
        subtree and grafts cleanly."""
        from beso_tpu.models.denoiser import GCDenoiser
        from beso_tpu.models.pretrain import (graft_encoder_params,
                                              pretrain_state_regression)
        from beso_tpu.models.vision_policy import VisionPolicyGPT

        from beso_tpu.envs.block_push.camera import render_obs_rgb

        def render(o):
            return render_obs_rgb(o, 16, 16) - jnp.asarray(
                [0.92, 0.92, 0.90])

        rng = np.random.default_rng(1)
        pool = rng.uniform(0.0, 0.5, size=(64, 16)).astype(np.float32)
        enc, _ = pretrain_state_regression(
            jax.random.PRNGKey(1), pool, render, embed_size=8,
            features=(4, 8), steps=2, batch_size=8, steps_per_call=2)

        model = VisionPolicyGPT(action_dim=2, embed_dim=24, n_layers=1,
                                n_heads=2, goal_seq_len=1, obs_seq_len=2,
                                embed_size=8, enc_features=(4, 8),
                                img_hw=(16, 16), freeze_encoder=True)
        den = GCDenoiser(model, sigma_data=0.5)
        key = jax.random.PRNGKey(0)
        s = jax.random.uniform(key, (2, 2, 16)) * 0.4
        a = jax.random.normal(key, (2, 2, 2)) * 0.1
        g = jax.random.uniform(key, (2, 1, 16)) * 0.4
        sig = jnp.full((2,), 0.5)
        params = den.init(key, s, a, g, sig)
        grafted = graft_encoder_params(params, enc)
        # structures identical, encoder values actually replaced
        assert (jax.tree_util.tree_structure(grafted)
                == jax.tree_util.tree_structure(params))
        out = den.apply(grafted, s, a, g, sig)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))

    def test_pretrained_graft_into_kitchen_policy(self):
        """Same graft path for KitchenVisionPolicyGPT (the 2.94/4
        from-pixels configuration, RESULTS.md)."""
        from beso_tpu.envs.kitchen.camera import render_kitchen_obs_rgb
        from beso_tpu.models.denoiser import GCDenoiser
        from beso_tpu.models.pretrain import (graft_encoder_params,
                                              pretrain_state_regression)
        from beso_tpu.models.vision_policy import KitchenVisionPolicyGPT

        def render(o):
            return render_kitchen_obs_rgb(o, 16, 16) - jnp.asarray(
                [0.93, 0.93, 0.91])

        rng = np.random.default_rng(2)
        pool = rng.uniform(-0.2, 0.2, size=(64, 30)).astype(np.float32)
        enc, _ = pretrain_state_regression(
            jax.random.PRNGKey(2), pool, render, embed_size=8,
            features=(4, 8), steps=2, batch_size=8, steps_per_call=2)

        model = KitchenVisionPolicyGPT(
            action_dim=9, embed_dim=24, n_layers=1, n_heads=2,
            goal_seq_len=1, obs_seq_len=2, embed_size=8,
            enc_features=(4, 8), img_hw=(16, 16), freeze_encoder=True)
        den = GCDenoiser(model, sigma_data=0.5)
        key = jax.random.PRNGKey(0)
        s = jax.random.uniform(key, (2, 2, 30)) * 0.2
        a = jax.random.normal(key, (2, 2, 9)) * 0.1
        g = jax.random.uniform(key, (2, 1, 30)) * 0.2
        sig = jnp.full((2,), 0.5)
        params = den.init(key, s, a, g, sig)
        grafted = graft_encoder_params(params, enc)
        assert (jax.tree_util.tree_structure(grafted)
                == jax.tree_util.tree_structure(params))
        # frozen: one grad step leaves the grafted encoder untouched
        grads = jax.grad(lambda p: den.loss(
            p, s, a, g, jax.random.normal(key, a.shape), sig))(grafted)
        enc_norm = sum(float(jnp.abs(gr).sum())
                       for p, gr in jax.tree_util.tree_leaves_with_path(grads)
                       if "encoder" in str(p))
        assert enc_norm == 0.0
