"""Camera-model rendering + image-policy plumbing tests (VERDICT r2 #6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCameraModel:
    def test_reference_intrinsics_and_pose(self):
        """Constants match block_pushing.py:103-117."""
        from beso_tpu.envs.block_push import camera as C

        np.testing.assert_allclose(C.CAMERA_POSE, [1.0, 0.0, 0.75])
        np.testing.assert_allclose(C.CAMERA_ORIENTATION,
                                   [np.pi / 4, np.pi, -np.pi / 2])
        assert C.FOCAL_SCALE == pytest.approx(0.803)

    def test_projection_roundtrip(self):
        """A pixel's table-grid point must project back to that pixel
        through the pinhole model (fx = fy = 0.803*W, principal point at
        the image center at zoom 1)."""
        from beso_tpu.envs.block_push import camera as C

        h, w = 48, 64
        grid = C.table_grid(h, w, 1.0)
        R = C._euler_xyz_to_matrix(C.CAMERA_ORIENTATION)
        fx = fy = C.FOCAL_SCALE * w
        for (v, u) in [(5, 7), (24, 32), (40, 60)]:
            p_world = np.asarray([grid[v, u, 0], grid[v, u, 1], 0.0])
            d = R.T @ (p_world - C.CAMERA_POSE)
            u_proj = w / 2.0 + fx * d[0] / d[2]
            v_proj = h / 2.0 + fy * d[1] / d[2]
            assert u_proj == pytest.approx(u + 0.5, abs=1e-3)
            assert v_proj == pytest.approx(v + 0.5, abs=1e-3)

    def test_perspective_foreshortening(self):
        """Rows nearer the camera (larger v) span LESS world distance —
        genuine projective geometry, not an orthographic schematic."""
        from beso_tpu.envs.block_push.camera import table_grid

        g = table_grid(64, 64, 1.0)
        span_far = abs(g[10, -1, 1] - g[10, 0, 1])
        span_near = abs(g[-10, -1, 1] - g[-10, 0, 1])
        assert span_near < span_far * 0.5

    def test_render_draws_scene(self):
        from beso_tpu.envs.block_push.camera import render_obs_rgb
        from beso_tpu.envs.block_push.env import (block_push_obs,
                                                  block_push_reset)

        s = block_push_reset(jax.random.PRNGKey(0))
        img = jax.jit(render_obs_rgb)(block_push_obs(s))
        assert img.shape == (64, 64, 3)
        arr = np.asarray(img)
        assert 0.0 <= arr.min() and arr.max() <= 1.0
        # blocks/targets/effector actually appear
        fg = (np.ptp(arr - np.asarray([0.92, 0.92, 0.90]), -1) > 0.05).mean()
        assert fg > 0.01

    def test_elevated_point_projection_parity(self):
        """VERDICT r3 #8: 3-D parity — the rasterizer's pixel ray through an
        ELEVATED point's reference-projected pixel must pass through that
        point (same camera math as block_pushing.py:604-679 for z > 0)."""
        from beso_tpu.envs.block_push import camera as C

        h, w = 240, 320
        rays = C.ray_grid(h, w, 1.0)
        R = C._euler_xyz_to_matrix(C.CAMERA_ORIENTATION)
        fx = fy = C.FOCAL_SCALE * w
        for p_world in [np.asarray([0.4, -0.1, 0.04]),
                        np.asarray([0.5, 0.2, 0.135]),
                        np.asarray([0.35, 0.0, 0.02])]:
            d = R.T @ (p_world - C.CAMERA_POSE)
            u = w / 2.0 + fx * d[0] / d[2]
            v = h / 2.0 + fy * d[1] / d[2]
            ray = np.asarray(rays[int(v), int(u)])
            # distance from the point to the pixel's ray
            rel = p_world - C.CAMERA_POSE
            t = np.dot(rel, ray) / np.dot(ray, ray)
            dist = np.linalg.norm(rel - t * ray)
            # within the footprint of one pixel at that depth
            pix = np.linalg.norm(rel) / fx
            assert dist < 1.5 * pix, (p_world, dist, pix)

    def test_block_parallax(self):
        """A block's rendered silhouette must be displaced toward the
        camera relative to its flat tabletop footprint (3-D parallax): the
        top face at z=0.04 projects closer to the camera side of the image
        than the base."""
        from beso_tpu.envs.block_push import camera as C

        h = w = 96
        obs = jnp.zeros((16,))
        obs = obs.at[0:2].set(jnp.asarray([0.4, -0.1]))   # block0
        obs = obs.at[3:5].set(jnp.asarray([10.0, 10.0]))  # block1 off-frame
        obs = obs.at[6:8].set(jnp.asarray([10.0, 10.0]))  # effector off-frame
        obs = obs.at[10:12].set(jnp.asarray([10.0, 10.0]))
        obs = obs.at[13:15].set(jnp.asarray([10.0, 10.0]))
        img = np.asarray(C.render_obs_rgb(obs, h, w, zoom=2.0))
        mask3d = np.ptp(img - np.asarray([0.92, 0.92, 0.90]), -1) > 0.05
        # flat footprint occupies pixels whose table_grid point is in the box
        grid = C.table_grid(h, w, 2.0)
        flat = (np.abs(grid[..., 0] - 0.4) < C.BLOCK_HALF) & (
            np.abs(grid[..., 1] + 0.1) < C.BLOCK_HALF)
        assert mask3d.sum() > flat.sum() * 1.3   # side faces + parallax
        # the 3-D silhouette extends beyond the flat footprint toward the
        # camera (camera at x=1.0 -> larger world x -> lower v rows... the
        # displacement is along the projection of +z, i.e. up-image)
        rows3d = np.where(mask3d.any(1))[0]
        rowsfl = np.where(flat.any(1))[0]
        assert rows3d.min() < rowsfl.min()       # extends up-image (height)

    def test_render_tracks_block_motion(self):
        """Moving a block changes exactly the pixels near its projection."""
        from beso_tpu.envs.block_push.camera import render_obs_rgb
        from beso_tpu.envs.block_push.env import (block_push_obs,
                                                  block_push_reset)

        s = block_push_reset(jax.random.PRNGKey(1))
        obs = block_push_obs(s)
        obs2 = obs.at[0].add(0.08)
        i1 = np.asarray(render_obs_rgb(obs))
        i2 = np.asarray(render_obs_rgb(obs2))
        assert (np.abs(i1 - i2).max(-1) > 0.1).sum() > 10


class TestVisionPolicy:
    def test_forward_shapes_and_uncond(self):
        from beso_tpu.models.denoiser import GCDenoiser
        from beso_tpu.models.vision_policy import VisionPolicyGPT

        model = VisionPolicyGPT(action_dim=2, embed_dim=48, n_layers=1,
                                n_heads=4, goal_seq_len=1, obs_seq_len=3,
                                embed_size=8, img_hw=(24, 24))
        den = GCDenoiser(model, sigma_data=0.5)
        key = jax.random.PRNGKey(0)
        B, T = 2, 3
        s = jax.random.uniform(key, (B, T, 16)) * 0.4
        a = jnp.zeros((B, T, 2))
        g = jax.random.uniform(key, (B, 1, 16)) * 0.4
        sig = jnp.full((B,), 0.5)
        params = den.init(key, s, a, g, sig)
        out = den.apply(params, s, a, g, sig)
        assert out.shape == (B, T, 2)
        # goal conditioning is live: uncond differs from cond
        out_u = den.apply(params, s, a, g, sig, uncond=True)
        assert not np.allclose(np.asarray(out), np.asarray(out_u))
        # and zero-goal == uncond (the CFG contract)
        out_z = den.apply(params, s, a, jnp.zeros_like(g) * 0.0, sig,
                          uncond=False)
        # NOTE: goals render as block pictures; a zero goal paints blocks
        # at the origin — uncond zeroes the EMBEDDING instead, so these
        # are legitimately different paths; just check both run
        assert out_z.shape == out_u.shape

    def test_loss_trains(self):
        """One gradient step reduces nothing catastrophic: loss is finite
        and grads flow into BOTH the encoder and the transformer."""
        from beso_tpu.models.denoiser import GCDenoiser
        from beso_tpu.models.vision_policy import VisionPolicyGPT

        model = VisionPolicyGPT(action_dim=2, embed_dim=48, n_layers=1,
                                n_heads=4, goal_seq_len=1, obs_seq_len=3,
                                embed_size=8, img_hw=(24, 24))
        den = GCDenoiser(model, sigma_data=0.5)
        key = jax.random.PRNGKey(0)
        B, T = 2, 3
        s = jax.random.uniform(key, (B, T, 16)) * 0.4
        a = jax.random.normal(key, (B, T, 2)) * 0.1
        g = jax.random.uniform(key, (B, 1, 16)) * 0.4
        sig = jnp.full((B,), 0.5)
        params = den.init(key, s, a, g, sig)
        noise = jax.random.normal(key, a.shape)

        def loss(p):
            return den.loss(p, s, a, g, noise, sig)

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        leaves = jax.tree_util.tree_leaves_with_path(grads)
        enc_norm = sum(float(jnp.abs(g).sum()) for p, g in leaves
                       if "encoder" in str(p))
        gpt_norm = sum(float(jnp.abs(g).sum()) for p, g in leaves
                       if "VisionDiffusionGPT" in str(p))
        assert enc_norm > 0, "no gradient reaches the image encoder"
        assert gpt_norm > 0


class TestKitchenVisionPolicy:
    """KitchenVisionPolicyGPT (VERDICT r3 #3): raw 30-dim kitchen obs in,
    ray-cast render + shared conv encoder inside the step, future-obs
    goals through the same camera, proprio (qpos[:9]) on each state
    token."""

    def _tiny(self):
        from beso_tpu.models.denoiser import GCDenoiser
        from beso_tpu.models.vision_policy import KitchenVisionPolicyGPT

        model = KitchenVisionPolicyGPT(
            action_dim=9, embed_dim=48, n_layers=1, n_heads=4,
            goal_seq_len=2, obs_seq_len=3, embed_size=8, img_hw=(24, 24))
        return GCDenoiser(model, sigma_data=0.5)

    def _batch(self, key, B=2, T=3, G=2):
        from beso_tpu.envs.kitchen.env import INIT_QPOS

        k1, k2, k3 = jax.random.split(key, 3)
        base = jnp.asarray(INIT_QPOS)[None, None, :30]
        s = base + 0.05 * jax.random.normal(k1, (B, T, 30))
        a = 0.1 * jax.random.normal(k2, (B, T, 9))
        g = base + 0.05 * jax.random.normal(k3, (B, G, 30))
        sig = jnp.full((B,), 0.5)
        return s, a, g, sig

    def test_forward_shapes_and_uncond(self):
        den = self._tiny()
        key = jax.random.PRNGKey(0)
        s, a, g, sig = self._batch(key)
        params = den.init(key, s, a, g, sig)
        out = den.apply(params, s, a, g, sig)
        assert out.shape == (2, 3, 9)
        assert np.isfinite(np.asarray(out)).all()
        out_u = den.apply(params, s, a, g, sig, uncond=True)
        assert not np.allclose(np.asarray(out), np.asarray(out_u))

    def test_goal_conditioning_is_live(self):
        """Different goal scenes (kettle moved, door open) must change the
        denoiser output — the goal image path is load-bearing."""
        from beso_tpu.envs.kitchen.env import OBS_ELEMENT_GOALS

        den = self._tiny()
        key = jax.random.PRNGKey(1)
        s, a, g, sig = self._batch(key)
        params = den.init(key, s, a, g, sig)
        out1 = den.apply(params, s, a, g, sig)
        g2 = g.at[:, :, 23:30].set(jnp.asarray(
            OBS_ELEMENT_GOALS["kettle"]))
        out2 = den.apply(params, s, a, g2, sig)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_loss_and_grads(self):
        den = self._tiny()
        key = jax.random.PRNGKey(2)
        s, a, g, sig = self._batch(key)
        params = den.init(key, s, a, g, sig)
        noise = jax.random.normal(key, a.shape)

        def loss(p):
            return den.loss(p, s, a, g, noise, sig)

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        leaves = jax.tree_util.tree_leaves_with_path(grads)
        enc_norm = sum(float(jnp.abs(gr).sum()) for p, gr in leaves
                       if "encoder" in str(p))
        gpt_norm = sum(float(jnp.abs(gr).sum()) for p, gr in leaves
                       if "VisionDiffusionGPT" in str(p))
        assert enc_norm > 0, "no gradient reaches the image encoder"
        assert gpt_norm > 0
